"""Profiling helpers (SURVEY §5 tracing target)."""

import os

import jax
import jax.numpy as jnp

from parallax_tpu.utils.profiling import named, steps_per_second, trace


def test_named_scope_in_lowered_metadata():
    @jax.jit
    def f(x):
        with named("hot_section"):
            return jnp.sin(x) * 2.0

    txt = f.lower(jnp.ones((4,))).as_text(debug_info=True)
    assert "hot_section" in txt


def test_steps_per_second_positive():
    f = jax.jit(lambda x: x * 2.0)
    sps = steps_per_second(f, jnp.ones((128,)), steps_per_call=10, repeats=2)
    assert sps > 0


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones((8,))))
    # a profiler plugin directory with at least one trace artifact appears
    found = [
        os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs
    ]
    assert found, "profiler trace produced no files"
