"""Two-process (DCN) dryrun: jax.distributed joins 2 processes x 4
virtual CPU devices into one 8-device fleet and runs the REAL
distributed code paths across the process boundary — (dp=2, tp=4)
sharded train step, corpus-sharded search, cross-host all-reduce — with
multihost-aware data feeding (parallel/multihost.py).

This is the multi-host half of the distributed story; the single-process
8-device mesh coverage lives in test_parallel.py and __graft_entry__.

Note on the one-JAX-process rule (CLAUDE.md): that rule exists to keep
TPU/tunnel work serialized. These subprocesses are CPU-only, tiny, and
bounded (280 s hard kill) — they contend briefly for the core but cannot
touch the TPU or wedge the tunnel.
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"
REPO = Path(__file__).parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_dryrun():
    import os

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # strip the axon sitecustomize (it would register the TPU plugin
    # before jax.distributed.initialize may run) and force CPU
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), f"127.0.0.1:{port}", "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=280)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"

    def checks(out):
        return [
            line for line in out.splitlines() if line.startswith("CHECK")
        ]

    c0, c1 = checks(outs[0]), checks(outs[1])
    assert len(c0) == 3, outs[0]
    # both processes computed identical global results
    assert c0 == c1, (c0, c1)
    assert c0[0] == "CHECK sum 2016.0", c0  # sum(arange(64))
    assert "CHECK search True" in c0[2], c0
