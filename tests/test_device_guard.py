"""Device-acquisition guard tests (utils/device_guard.py).

The guard exists because an axon device-claim outage blocks backend
init in an uninterruptible C++ retry loop; every timeout-less entry
point (serving, builder, trainer, bench) arms it before first touching
jax and disarms after jax.devices() returns.
"""

import threading
import time

from rag_icd10_tpu.utils import guard_device_acquisition


class TestGuard:
    def test_disarm_prevents_timeout(self):
        fired = threading.Event()
        disarm = guard_device_acquisition(0.2, on_timeout=fired.set)
        disarm()
        assert not fired.wait(0.5)

    def test_fires_when_never_disarmed(self):
        fired = threading.Event()
        guard_device_acquisition(0.05, on_timeout=fired.set)
        assert fired.wait(2.0)

    def test_nonpositive_timeout_disables(self):
        fired = threading.Event()
        disarm = guard_device_acquisition(0, on_timeout=fired.set)
        assert not fired.wait(0.3)
        disarm()  # no-op, must not raise

    def test_env_default(self, monkeypatch):
        monkeypatch.setenv("DEVICE_ACQUIRE_TIMEOUT_S", "0.05")
        fired = threading.Event()
        guard_device_acquisition(on_timeout=fired.set)
        assert fired.wait(2.0)

    def test_late_disarm_after_fire_is_safe(self):
        fired = threading.Event()
        disarm = guard_device_acquisition(0.05, on_timeout=fired.set)
        assert fired.wait(2.0)
        disarm()  # must not raise even after the handler ran
