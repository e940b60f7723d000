"""Train-step latency sweep: wave chunk x remat segments (round 4).

The forward rollout's >8k one-program VMEM collapse (DESIGN 5b) has a
backward-pass analogue: the bwd of one env step carries ~2-3x the fwd's
live planes, so a B=8192 training program can sit in the superlinear
regime even though the B=8192 rollout does not.  Chunked waves bound the
fwd working set (bwd residuals still stack across waves -- the measured
16k OOM note in parallel/rollout.py), so chunk size trades fusion-size
pathology against wave overhead under grad.

Reuses bench.bench_train for the measurement (single timing methodology:
chained dispatch, host-fetch sync).

Usage:  timeout 2400 python tools/bench_train_sweep.py [batch]
Prints one line per (chunk, segments) combo.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")

from bench import bench_train
from parallax_tpu.envs.lunar_lander import LunarLander

HORIZON = 100


def main():
    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 8192
    env = LunarLander()
    for chunk, segments in (
        (None, 4),     # bench --train default: one program, 4 segments
        (None, 2),
        (None, 10),
        (4096, 4),
        (2048, 4),
        (1024, 4),
        (2048, 10),
    ):
        try:
            rec = bench_train(env, "lander", batch=batch, horizon=HORIZON,
                              chain=2, checkpoint_segments=segments,
                              max_chunk=chunk)
            v = rec["value"]
            print(f"chunk={chunk or 0:5d} segments={segments:2d}  "
                  f"{v / 1e6:7.2f}M train env-steps/s  "
                  f"({batch * HORIZON / v * 1e3:.1f} ms/step)", flush=True)
        except Exception as exc:
            print(f"chunk={chunk or 0:5d} segments={segments:2d}  FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:120]}", flush=True)


if __name__ == "__main__":
    main()
