"""Failing-seed reporter for the mass-randomized property suites.

TPU-shaped port of the reference's debug harness
(/root/reference/test/test_collisions.py:55-68): the reference re-runs
failing keys un-vmapped to drop into a breakpoint; here every randomized
assertion reports the exact failing sample indices and generator seeds, so
a soak failure (PARALLAX_TEST_N=200000+) reduces to a one-liner repro —
regenerate the inputs from the listed ``jax.random.PRNGKey`` seeds at the
same N and index the listed samples.
"""

from __future__ import annotations

import os

import numpy as np


def _report(ok: np.ndarray, threshold, name, seeds, indices, max_report) -> str:
    where = np.nonzero(~ok)[0]
    if indices is not None:
        where = np.asarray(indices)[where]
    shown = where[:max_report].tolist()
    more = f" (+{where.size - max_report} more)" if where.size > max_report else ""
    n_env = os.environ.get("PARALLAX_TEST_N", "unset (default 2000)")
    return (
        f"[{name}] pass rate {ok.mean():.6f} <= {threshold} over {ok.size} "
        f"checked samples (PARALLAX_TEST_N={n_env}). Failing sample indices: "
        f"{shown}{more}. Repro: rebuild the inputs with "
        f"jax.random.PRNGKey(s) for s in {list(seeds)} at the same N and "
        f"slice the listed indices (reference failing-seed rerun, "
        f"test_collisions.py:55-68)."
    )


def assert_rate(ok, threshold: float, name: str, seeds=(), indices=None, max_report=10):
    """Assert mean(ok) > threshold; on failure, name the failing samples.

    ``indices``: original sample indices of ``ok``'s positions, for
    asserts over masked subsets (pass ``np.nonzero(mask)[0]``)."""
    ok = np.asarray(ok).astype(bool).ravel()
    if ok.size == 0 or ok.mean() > threshold:
        return
    raise AssertionError(_report(ok, threshold, name, seeds, indices, max_report))


def assert_all(ok, name: str, seeds=(), indices=None, max_report=10):
    """Assert every sample passes; on failure, name the failing samples."""
    ok = np.asarray(ok).astype(bool).ravel()
    if ok.all():
        return
    raise AssertionError(_report(ok, "1.0 (all)", name, seeds, indices, max_report))
