"""Batched EPA (expanding polytope algorithm), 2D.

Behavioral port of the reference's edge-buffer EPA
(/root/reference/cotix/_collisions.py:115-273): fixed-size edge buffer of
``solver_iterations + 3`` entries seeded from the GJK simplex, per-iteration
closest-edge search + support expansion + edge split, and the same three
numerical-breakdown guards (tiny edge, winding-order violation,
no-progress).  Restructured for TPU as a fixed-length ``lax.scan`` whose
body is fully masked — identical math, reverse-mode differentiable.

Returns the reference's "penetration vector": the displacement from the
closest point on the Minkowski-difference boundary to the origin, i.e. the
vector that — added to shape A's position — separates the shapes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from parallax_tpu.geometry.math import cross2, fast_normal, safe_norm, safe_normalize

EPA_DEFAULT_ITERATIONS = 48


def _displacement_to_origin(a, b):
    """origin - closest point on segment ab; (inf, inf) for empty slots

    (both endpoints zero).  Reference _collisions.py:137-154."""
    length = jnp.sum((a - b) ** 2)
    t = jnp.dot(-b, a - b) / jnp.where(length == 0, 1.0, length)
    t = jnp.clip(t, 0.0, 1.0)
    projection = b + t * (a - b)
    disp = jnp.where(length == 0, -a, -projection)
    empty = jnp.all((a == 0.0) & (b == 0.0))
    return jnp.where(empty, jnp.full((2,), jnp.inf, a.dtype), disp)


def _closest_point_disp(a, b, point):
    """point - closest point on segment ab (reference _collisions.py:156-166)."""
    length = jnp.sum((a - b) ** 2)
    t = jnp.dot(point - b, a - b) / jnp.where(length == 0, 1.0, length)
    t = jnp.clip(t, 0.0, 1.0)
    projection = b + t * (a - b)
    return jnp.where(length == 0, point - a, point - projection)


def _closest_edge(edges):
    """(edge [2,2], index) minimizing squared distance to origin

    (reference _collisions.py:168-175)."""
    disps = jax.vmap(lambda e: _displacement_to_origin(e[0], e[1]))(edges)
    d2 = jnp.sum(disps**2, axis=-1)
    idx = jnp.argmin(d2)
    return edges[idx], idx


def epa(
    sup_a: Callable,
    geom_a,
    sup_b: Callable,
    geom_b,
    simplex: jnp.ndarray,
    solver_iterations: int = EPA_DEFAULT_ITERATIONS,
) -> jnp.ndarray:
    """Single-pair EPA; vmap over leading axes of geoms + simplex.

    ``simplex`` [3, 2] must contain the origin (GJK output).  Static
    ``solver_iterations`` >= 3 sets both the iteration count and the edge
    buffer size, exactly like the reference.
    """
    if solver_iterations < 3:
        raise ValueError("solver_iterations must be >= 3")

    def mink(d):
        return sup_a(geom_a, d) - sup_b(geom_b, -d)

    n_edges = solver_iterations + 3
    edges = jnp.zeros((n_edges, 2, 2), dtype=simplex.dtype)
    edges = edges.at[0].set(jnp.stack([simplex[0], simplex[1]]))
    edges = edges.at[1].set(jnp.stack([simplex[1], simplex[2]]))
    edges = edges.at[2].set(jnp.stack([simplex[2], simplex[0]]))

    best_edge, best_idx = _closest_edge(edges)

    def cond_fn(state):
        # reference guards (_collisions.py:177-212): continue only while
        #   c1: closest edge is not degenerate,
        #   c2: winding order intact (numerical-error detector),
        #   c4: latest support point made progress beyond the previous edge,
        #   and nothing went NaN.
        last_edge, new_point, _, edges_l, prev_edge = state
        c1 = jnp.sum((last_edge[0] - last_edge[1]) ** 2) > 1e-9
        c2 = cross2(last_edge[0], last_edge[1]) >= 0
        normal = safe_normalize(fast_normal(prev_edge[0] - prev_edge[1]))
        d = jnp.dot(new_point, normal)
        edist = safe_norm(
            _closest_point_disp(prev_edge[0], prev_edge[1], jnp.zeros((2,)))
        )
        c4 = (d - edist > 1e-6) | (d <= 0)
        return c4 & (~jnp.any(jnp.isnan(last_edge))) & c1 & c2

    def body(carry, i):
        state, running = carry
        best_edge, _, best_idx, edges_l, _ = state

        normal = safe_normalize(fast_normal(best_edge[0] - best_edge[1]))
        new_point = mink(normal)

        a = jnp.stack([best_edge[0], new_point])
        b = jnp.stack([new_point, best_edge[1]])
        new_edges = edges_l.at[best_idx].set(a)
        new_edges = new_edges.at[i + 3].set(b)

        nbe, nbi = _closest_edge(new_edges)
        new_state = (nbe, new_point, nbi, new_edges, best_edge)

        # freeze finished lanes (reproduces the cond-guarded scan at
        # _collisions.py:260-265)
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(running, n, o), new_state, state
        )
        running = running & cond_fn(state)
        return (state, running), None

    state0 = (best_edge, simplex[2], best_idx, edges, edges[0])
    running0 = cond_fn(state0)
    (state, _), _ = jax.lax.scan(
        body, (state0, running0), jnp.arange(solver_iterations)
    )
    _, _, _, edges, _ = state
    best_edge, _ = _closest_edge(edges)
    return _closest_point_disp(best_edge[0], best_edge[1], jnp.zeros((2,)))


def compute_penetration_vector_convex(
    sup_a, geom_a, sup_b, geom_b, simplex, solver_iterations: int = EPA_DEFAULT_ITERATIONS
):
    """Reference-named wrapper (_collisions.py:313-329)."""
    return epa(sup_a, geom_a, sup_b, geom_b, simplex, solver_iterations)
