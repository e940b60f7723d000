"""Multi-process ``jax.distributed`` smoke test (SURVEY §4: multi-process
CPU emulation of the multi-host path).

Spawns 2 worker processes, each a simulated host with 4 virtual CPU
devices; they rendezvous through ``parallel.mesh.distributed_init``, build
the 8-device global "worlds" mesh, and run a sharded training step on
host-local batch shards.  Passing requires both workers to exit cleanly
AND print bit-identical loss/return checksums — i.e. the cross-host
collectives actually ran and agreed.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_train_step():
    port = _free_port()
    env = os.environ.copy()
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(f"worker {i} timed out (distributed rendezvous hang?)")
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    checksums = []
    for i, out in enumerate(outs):
        lines = [ln for ln in out.splitlines() if "CHECKSUM" in ln]
        assert lines, f"worker {i} printed no checksum:\n{out}"
        checksums.append(lines[0].split("CHECKSUM", 1)[1])
    assert checksums[0] == checksums[1], (
        f"workers disagree — collectives inconsistent: {checksums}"
    )
