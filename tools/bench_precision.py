"""Micro-bench: solver-kernel throughput vs one-hot matmul precision mode.

Times the standalone Pallas contact solver (fwd, with joints) on the
lander contact scenario at B=8192, chained dispatches + host-fetch sync
(CLAUDE.md timing gotcha).  Compares PARALLAX_MXU_PRECISION modes by
re-importing in THIS process is impossible (read at import), so the mode
is passed explicitly via solve mode monkeypatch — we instead parametrize
through the env var and subprocess per mode when run with --all-modes.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(mode):
    env = dict(os.environ, PARALLAX_MXU_PRECISION=mode)
    r = subprocess.run(
        [sys.executable, __file__, "--one"], env=env, capture_output=True,
        text=True, timeout=1800,
    )
    out = r.stdout.strip().splitlines()
    print(f"{mode:10s} {out[-1] if out else 'FAILED: ' + r.stderr[-300:]}",
          flush=True)


def one():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")
    from tools.tpu_smoke_bwd import build_contact_state
    from parallax_tpu.ops.pallas_solver import solve_contacts_pallas, MXU_PRECISION

    B = 8192
    world, s, con = build_contact_state(B)

    N = 200

    @jax.jit
    def f(s):
        def body(carry, _):
            out = solve_contacts_pallas(
                world, carry, con, 3, 2, 0.01, world.config.contact,
                with_joints=True,
            )
            return out, ()

        out, _ = jax.lax.scan(body, s, None, length=N)
        return out

    out = f(s)
    float(jax.device_get(out.vx.sum()))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(s)
        float(jax.device_get(o.vx.sum()))
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"mode={MXU_PRECISION} solver_fwd {best*1e6:.1f} us/solve "
          f"({B/best/1e6:.1f}M world-solves/s)")


if __name__ == "__main__":
    if "--one" in sys.argv:
        one()
    else:
        for m in sys.argv[1:] or ["default", "highest"]:
            run_mode(m)
