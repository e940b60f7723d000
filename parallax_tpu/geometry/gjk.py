"""Batched, differentiable 2D GJK.

Behavioral port of the reference's boolean-collision GJK
(/root/reference/cotix/_collisions.py:20-112 and 277-310): same seeding,
same simplex-update rule, same termination conditions, same degeneracy
rejection — but restructured for TPU:

* The iteration is a fixed-length ``lax.scan`` (32 steps, like the
  reference's ``max_steps=32``) with a per-lane ``done`` mask instead of a
  while-loop.  Under ``vmap`` at batch 8192 x n_pairs some lane is almost
  always still active, so a while-loop would run all 32 steps anyway; the
  scan costs the same, is reverse-mode differentiable out of the box (the
  reference needed a checkpointed while-loop for that), and avoids
  host-side loop control.
* Support functions are passed as ``(fn, geom)`` pairs so heterogeneous
  shape parameters batch as pytrees while the code stays closure-free.

The returned simplex follows the reference contract: a [3, 2] triangle in
Minkowski-difference space containing the origin when colliding, NaNs
otherwise.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from parallax_tpu.geometry.math import fast_normal, is_point_in_triangle, random_direction

GJK_MAX_STEPS = 32

# random_direction(PRNGKey(1)) — the reference's default seeding constant
# (check_for_collision_convex, _collisions.py:287-298).  Kept as numpy so
# importing this module inside a trace never captures a traced constant.
import numpy as _np

DEFAULT_INITIAL_DIRECTION = _np.array([-0.87677443, 0.48090222], dtype=_np.float32)


class GJKResult(NamedTuple):
    colliding: jnp.ndarray  # [] bool
    simplex: jnp.ndarray  # [3, 2] (NaN when not colliding)


def _minkowski(sup_a: Callable, geom_a, sup_b: Callable, geom_b, direction):
    """support_A(d) - support_B(-d) (reference minkowski_diff,

    _geometry_utils.py:49-57)."""
    return sup_a(geom_a, direction) - sup_b(geom_b, -direction)


def gjk(
    sup_a: Callable,
    geom_a,
    sup_b: Callable,
    geom_b,
    initial_direction=None,
    max_steps: int = GJK_MAX_STEPS,
) -> GJKResult:
    """Single-pair GJK; vmap over leading axes of ``geom_a``/``geom_b``.

    ``sup_*`` take ``(geom, direction[2]) -> point[2]``.
    """
    if initial_direction is None:
        initial_direction = DEFAULT_INITIAL_DIRECTION

    def mink(d):
        return _minkowski(sup_a, geom_a, sup_b, geom_b, d)

    s0 = mink(initial_direction)
    s1 = mink(-s0)

    # Arrange clockwise; direction = normal toward the origin
    # (reference _collisions.py:44-57).
    direction = fast_normal(s1 - s0)
    flip = jnp.dot(direction, -s1) > 0
    s0f, s1f = jnp.where(flip, s1, s0), jnp.where(flip, s0, s1)
    direction = jnp.where(flip, direction, -direction)
    c = mink(direction)
    simplex = jnp.stack([s0f, s1f, c])

    def cond_fn(simplex, direction):
        # reference _collisions.py:85-97
        c1 = jnp.dot(simplex[2], direction) <= 0
        c2 = jnp.dot(fast_normal(simplex[2] - simplex[0]), -simplex[2]) < 0
        c3 = jnp.dot(fast_normal(simplex[1] - simplex[2]), -simplex[2]) < 0
        return ~(c1 | (c2 & c3))

    def body(carry, _):
        simplex, direction, running = carry
        a, b, c = simplex[0], simplex[1], simplex[2]
        ac_normal = fast_normal(c - a)
        cb_normal = fast_normal(b - c)
        keep_a = jnp.dot(ac_normal, -c) >= 0
        new_simplex = jnp.where(
            keep_a,
            simplex.at[1].set(c),
            simplex.at[0].set(c),
        )
        new_direction = jnp.where(keep_a, ac_normal, cb_normal)
        new_point = mink(new_direction)
        new_simplex = new_simplex.at[2].set(new_point)

        # masked update: lanes that already satisfied the exit condition
        # freeze (this reproduces the while-loop semantics exactly).
        upd_simplex = jnp.where(running, new_simplex, simplex)
        upd_direction = jnp.where(running, new_direction, direction)
        still_running = running & cond_fn(upd_simplex, upd_direction)
        return (upd_simplex, upd_direction, still_running), None

    running0 = cond_fn(simplex, direction)
    (simplex, direction, _), _ = jax.lax.scan(
        body, (simplex, direction, running0), None, length=max_steps
    )

    # validity: origin inside the triangle (reference _collisions.py:105-110)
    origin = jnp.zeros((2,), dtype=simplex.dtype)
    inside = is_point_in_triangle(origin, simplex[0], simplex[1], simplex[2])
    simplex = jnp.where(inside, simplex, jnp.zeros_like(simplex))

    # degeneracy rejection (reference check_for_collision_convex,
    # _collisions.py:300-310)
    area = jnp.cross(simplex[1] - simplex[0], simplex[2] - simplex[0])
    bad = (
        jnp.all(simplex == jnp.zeros_like(simplex))
        | jnp.any(jnp.isnan(simplex))
        | (area == 0)
    )
    colliding = ~bad
    simplex = jnp.where(colliding, simplex, jnp.full_like(simplex, jnp.nan))
    return GJKResult(colliding=colliding, simplex=simplex)


def check_for_collision_convex(
    sup_a,
    geom_a,
    sup_b,
    geom_b,
    initial_direction=None,
    key=None,
    max_steps: int = GJK_MAX_STEPS,
) -> GJKResult:
    """Reference-shaped entry point (_collisions.py:277-310): seeds the

    initial direction from a PRNG key (fixed PRNGKey(1) by default) or a
    0.9/0.1 blend with a caller-provided direction."""
    rnd = random_direction(key) if key is not None else DEFAULT_INITIAL_DIRECTION
    if initial_direction is None:
        d0 = rnd
    else:
        blend = rnd * 0.1 + initial_direction * 0.9
        d0 = jnp.where(jnp.any(jnp.isnan(initial_direction)), rnd, blend)
    return gjk(sup_a, geom_a, sup_b, geom_b, d0, max_steps=max_steps)
