"""The roofline tool's env-derived models (tools/roofline.py).

The trace capture needs real TPU hardware, but the two models it combines
— the analytic HBM-traffic lower bound and the per-phase cost_analysis
flop counts — are backend-independent and must keep working for every
shipping env (round-3 VERDICT #7: no per-env hand constants to rot).
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from roofline import PHASES, make_env, phase_costs, traffic_model  # noqa: E402

ENVS = ("lander", "robocup", "billiards", "bouncer")


@pytest.mark.parametrize("name", ENVS)
def test_traffic_model_derived_from_env_structures(name):
    env = make_env(name)
    B = 64
    model = traffic_model(env, B)
    assert set(model) == set(PHASES) | {"env/other"}
    world = getattr(env, "_bm_world", env.world)
    n = int(world.params.mass.shape[-1])
    C = int(world.table.n_contacts)
    f = 4 * B
    # structure-derived invariants: integrate is exactly a read+write of
    # the body planes; collide writes all 6 contact rows per lane
    assert model["integrate"] == 2 * 6 * n * f
    assert model["collide"] >= 6 * C * f
    # bytes scale linearly with B
    model2 = traffic_model(env, 2 * B)
    for ph in model:
        assert model2[ph] == 2 * model[ph]
    # joint-free worlds are not charged joints traffic
    if world.joints.n_joints == 0:
        assert model["joints"] == 0
    else:
        assert model["joints"] > 0


@pytest.mark.parametrize("name", ENVS)
def test_phase_flops_positive_and_scale(name):
    env = make_env(name)
    costs = phase_costs(env, 64)
    assert set(costs) == set(PHASES) | {"env/other"}
    # physics phases all do real arithmetic
    for ph in ("integrate", "collide", "solve_contacts", "env/other"):
        assert costs[ph] > 0, ph
    # collide and solve dominate integrate by orders of magnitude
    assert costs["collide"] > 50 * costs["integrate"]
    assert costs["solve_contacts"] > 50 * costs["integrate"]


def test_phase_costs_env_only_restores_physics_hook():
    """phase_costs monkeypatches env.plane_physics while tracing the
    env/other remainder; the hook must be restored afterwards."""
    env = make_env("bouncer")
    before = env.__dict__.get("plane_physics")
    phase_costs(env, 64)
    assert env.__dict__.get("plane_physics") is before
