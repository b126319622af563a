"""Fail-fast guard for TPU device acquisition.

During an axon device-claim outage (a killed client's grant holds the
chip server-side; observed 2026-08-17 for 2.75 h+), JAX backend init
blocks inside a C++ retry loop that Python signals cannot interrupt:
`timeout`-less entry points (server startup, store builds, training,
benches) hang indefinitely with zero CPU and no log output — the exact
signature of a wedge, except nothing local can ever unwedge it.

`guard_device_acquisition` arms a daemon watchdog before the first
backend touch and disarms it once `jax.devices()` returns. On expiry it
prints a one-line JSON diagnostic to stderr and hard-exits (os._exit —
the blocked init thread cannot be joined), so a supervising script or
the operator sees "device unavailable, retry later" in seconds instead
of a silent multi-hour hang.

Failure-detection parity note: the reference treats startup failures as
degradable (main.py:53-89 continues with a broken Milvus/LLM), but a
TPU framework's device IS the system — there is nothing to degrade to,
so the honest behavior is a fast, diagnosable exit.
"""

from __future__ import annotations

import json
import os
import sys
import threading
from typing import Callable, Optional

DEFAULT_TIMEOUT_S = 600.0  # device claim after a healthy restart ≈ 40 s
_ENV = "DEVICE_ACQUIRE_TIMEOUT_S"


def guard_device_acquisition(
    timeout_s: Optional[float] = None,
    *,
    what: str = "jax backend init",
    on_timeout: Optional[Callable[[], None]] = None,
) -> Callable[[], None]:
    """Arm a watchdog around device acquisition; returns the disarm fn.

    Usage::

        disarm = guard_device_acquisition(what="serving startup")
        import jax
        jax.devices()   # force backend init under the watchdog
        disarm()

    ``timeout_s`` defaults to $DEVICE_ACQUIRE_TIMEOUT_S or 600 s; a value
    <= 0 disables the guard (returns a no-op disarm). ``on_timeout``
    replaces the default print+os._exit(2) — tests inject a recorder
    here, since os._exit cannot run under pytest.
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get(_ENV, DEFAULT_TIMEOUT_S))
    acquired = threading.Event()
    if timeout_s <= 0:
        return acquired.set

    def _default_timeout() -> None:
        print(
            json.dumps({
                "error": "device acquisition timed out",
                "what": what,
                "timeout_s": timeout_s,
                "hint": "axon tunnel outage — backend init never "
                "returned; retry when the device claim clears "
                f"(raise {_ENV} to wait longer)",
            }),
            file=sys.stderr,
            flush=True,
        )
        os._exit(2)

    handler = on_timeout or _default_timeout

    def _watch() -> None:
        if not acquired.wait(timeout_s):
            handler()

    threading.Thread(
        target=_watch, name=f"device-guard[{what}]", daemon=True
    ).start()
    return acquired.set
