"""Design-by-contract layer tests (reference test_design_by_contract.py
idioms: pre/post/invariant across {no-jit, jax.jit})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.utils import dbc


@pytest.fixture(autouse=True)
def enable_checks():
    dbc.set_debug_checks(True)
    yield
    dbc.set_debug_checks(False)


def test_pre_condition_pass_and_fail():
    @dbc.pre_condition(lambda x: jnp.all(x > 0), "x must be positive")
    def f(x):
        return jnp.sqrt(x)

    assert np.isclose(float(f(jnp.asarray(4.0))), 2.0)
    with pytest.raises(AssertionError):
        f(jnp.asarray(-1.0))


def test_post_condition_under_jit():
    @jax.jit
    @dbc.post_condition(lambda out: jnp.all(jnp.isfinite(out)), "finite output")
    def f(x):
        return 1.0 / x

    assert np.isfinite(float(f(jnp.asarray(2.0))))
    # inside jit the callback's AssertionError surfaces as a runtime error
    with pytest.raises(Exception, match="contract violated|finite output"):
        jax.block_until_ready(f(jnp.asarray(0.0)))


def test_class_invariant():
    @dbc.class_invariant
    class Counter:
        def __init__(self, v):
            self.v = v

        def __invariant__(self):
            return jnp.all(jnp.asarray(self.v) >= 0)

        def bump(self):
            self.v = self.v + 1
            return self.v

    c = Counter(1)
    assert c.bump() == 2
    c.v = -5
    with pytest.raises(AssertionError):
        c.bump()


def test_checks_disabled_are_free():
    dbc.set_debug_checks(False)

    @dbc.pre_condition(lambda x: jnp.all(x > 0))
    def f(x):
        return x

    # violation ignored when disabled
    assert float(f(jnp.asarray(-1.0))) == -1.0
