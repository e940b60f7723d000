"""Multi-process ``jax.distributed`` smoke tests (SURVEY §4: multi-process
CPU emulation of the multi-host path; BASELINE demands >= 4 hosts).

Spawns N worker processes, each a simulated host with M virtual CPU
devices; they rendezvous through ``parallel.mesh.distributed_init``, build
the N*M-device global "worlds" mesh, and run a sharded training step on
host-local batch shards.  Passing requires every worker to exit cleanly
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


def _run_workers(n_workers: int, devices_per_worker: int) -> None:
    port = _free_port()
    env = os.environ.copy()
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devices_per_worker}",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(n_workers), str(port)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n_workers)
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
    assert all(c == checksums[0] for c in checksums), (
        f"workers disagree — collectives inconsistent: {checksums}"
    )


def test_two_process_sharded_train_step():
    _run_workers(n_workers=2, devices_per_worker=4)


def test_four_process_sharded_train_step():
    """BASELINE's ">= 4 hosts" emulated: 4 processes x 2 devices = the same
    8-device worlds mesh split across four process boundaries, so every
    cross-host code path (rendezvous, global array assembly from 4 local
    shards, 4-way psum) runs at the target host count."""
    _run_workers(n_workers=4, devices_per_worker=2)
