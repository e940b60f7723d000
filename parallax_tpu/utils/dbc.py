"""Design-by-contract runtime checks that work under ``jax.jit``.

TPU-native equivalent of the reference's contract layer
(/root/reference/cotix/_design_by_contract.py:13-107): pre/post-conditions
and value sanitizers on *traced* arrays.  Two differences from the
reference:

* Checks are gated by a global debug flag and compile to nothing when
  disabled — production step functions pay zero cost.
* When enabled, violations poison the offending lanes with NaN and
  (optionally) raise via ``jax.debug.callback`` on the host, instead of
  equinox's ``error_if``.  Poisoning keeps the program SPMD-safe: one bad
  world out of 8192 must not abort the whole mesh; the per-world NaN
  watchdog (see ``parallax_tpu.envs.base``) resets that world instead.
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp

_DEBUG = os.environ.get("PARALLAX_DEBUG_CHECKS", "0") == "1"


def checks_enabled() -> bool:
    return _DEBUG


def set_debug_checks(enabled: bool) -> None:
    global _DEBUG
    _DEBUG = enabled


def check(cond, message: str, *arrays):
    """If debug checks are on, report (host-side) when ``cond`` is False.

    ``cond`` may be an array of any shape; the check fires if any element is
    False.  Returns the first array (or None) unchanged so it can be used
    inline: ``x = check(jnp.isfinite(x).all(), "x finite", x)``.
    """
    out = arrays[0] if arrays else None
    if not _DEBUG:
        return out

    def _report(bad, *vals):
        if bad:
            raise AssertionError(f"parallax contract violated: {message}")

    bad = ~jnp.all(cond)
    jax.debug.callback(_report, bad, *arrays)
    return out


def pre_condition(predicate: Callable, message: str = ""):
    """Check a predicate over the function's inputs before the call."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            if _DEBUG:
                check(predicate(*args, **kwargs), message or f"pre_condition of {fn.__name__}")
            return fn(*args, **kwargs)

        return wrapped

    return deco


def post_condition(predicate: Callable, message: str = "", provide_input: bool = False):
    """Check a predicate over the function's output (optionally inputs too)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            out = fn(*args, **kwargs)
            if _DEBUG:
                ok = predicate(out, *args, **kwargs) if provide_input else predicate(out)
                check(ok, message or f"post_condition of {fn.__name__}")
            return out

        return wrapped

    return deco


def class_invariant(cls):
    """Class decorator: check ``__invariant__(self)`` before every public

    method call (reference class_invariant, _design_by_contract.py:61-107 —
    its "detect NaNs early" rationale).  No-op unless debug checks are on.
    """
    if not hasattr(cls, "__invariant__"):
        raise TypeError(f"{cls.__name__} needs an __invariant__ method")

    def wrap(fn):
        @functools.wraps(fn)
        def checked(self, *args, **kwargs):
            if _DEBUG:
                check(self.__invariant__(), f"invariant of {cls.__name__}")
            return fn(self, *args, **kwargs)

        return checked

    for name, attr in list(vars(cls).items()):
        if name.startswith("_") or not callable(attr):
            continue
        setattr(cls, name, wrap(attr))
    return cls
