"""The multi-host launcher path, actually executed.

Spawns two REAL processes (the reference's ``torchrun --nproc_per_node=2``
shape, README.md:62), each bringing up ``parallel.mesh.init_distributed``
with 2 simulated CPU devices, forming one 4-device global mesh and running
a cross-process sharded reduction. This exercises the coordinator
handshake, global device enumeration, and cross-process collectives that
``tests/test_sharding.py`` (single-process, 8 virtual devices) cannot.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_mesh():
    port = _free_port()
    env = dict(os.environ)
    # PYTHONPATH=repo also displaces the axon site dir, so the workers can
    # never register (or contend for) the real TPU plugin
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    cmd = [sys.executable, WORKER, f"127.0.0.1:{port}", "2"]
    procs = [subprocess.Popen(cmd + [str(i)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    assert "OK pid=0 devices=4" in outs[0], outs[0][-2000:]
    assert "OK pid=1 devices=4" in outs[1], outs[1][-2000:]
    # the actual hierarchy decode ran across the 2 processes and matched
    # the single-device tokens (see _multihost_worker.py)
    assert "DECODE-OK pid=0 tp=2 sp=2" in outs[0], outs[0][-2000:]
    assert "DECODE-OK pid=1 tp=2 sp=2" in outs[1], outs[1][-2000:]
