"""Composite (multi-part) shape queries — the reference's ``UniversalShape``
API (/root/reference/cotix/_universal_shape.py) over part tables.

A "composite" here is just a slice of a :class:`Parts` table (possibly
concave union of convex parts).  Queries:

* ``support``            — argmax over per-part supports
  (reference get_global_support, _universal_shape.py:46-59)
* ``collides_with``      — GJK over all part pairs
  (_universal_shape.py:87-107)
* ``penetrates_with``    — deepest EPA penetration over colliding part pairs
  (_universal_shape.py:112-126)
* ``possibly_collides``  — AABB broad phase (_universal_shape.py:109-110)

Unlike the reference — whose composite support forgot to rotate the query
direction into the local frame (_universal_shape.py:39, SURVEY §2.4 bug 2) —
these operate on world-frame part tables produced by ``Parts.to_world``, so
rotation is always correct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.geometry.epa import epa
from parallax_tpu.geometry.gjk import GJKResult, gjk
from parallax_tpu.geometry.shapes import (
    BOX,
    CIRCLE,
    POLYGON,
    Parts,
    support_any,
)


def _part_geom(parts: Parts, i: int):
    return parts.kind[i], (parts.verts[..., i, :, :], parts.radius[..., i])


def _sup(kind):
    def f(geom, d):
        verts, radius = geom
        return support_any(kind, verts, radius, d)

    return f


def support(parts: Parts, direction, part_indices=None):
    """Farthest point of the composite along ``direction``."""
    idx = range(parts.n_parts) if part_indices is None else part_indices
    best_p = None
    best_d = None
    for i in idx:
        kind, geom = _part_geom(parts, i)
        p = _sup(kind)(geom, direction)
        d = jnp.sum(p * direction, axis=-1)
        if best_p is None:
            best_p, best_d = p, d
        else:
            better = d > best_d
            best_p = jnp.where(better[..., None], p, best_p)
            best_d = jnp.maximum(d, best_d)
    return best_p


def collides_with(parts_a: Parts, parts_b: Parts, key=None, details: bool = False):
    """True if any part of A overlaps any part of B (GJK per pair).

    With ``details=True`` returns ``(hit, (simplex, part_a, part_b))`` — the
    GJK simplex and part indices of the first colliding pair, reusable to
    seed EPA (the reference's rich return,
    /root/reference/cotix/_universal_shape.py:87-107).  When nothing
    collides the simplex is the last pair's (garbage, as in the reference)
    and the indices are -1.
    """
    hit = jnp.zeros((), bool)
    simplex = None
    pa = jnp.asarray(-1, jnp.int32)
    pb = jnp.asarray(-1, jnp.int32)
    for i in range(parts_a.n_parts):
        ka, ga = _part_geom(parts_a, i)
        for j in range(parts_b.n_parts):
            kb, gb = _part_geom(parts_b, j)
            res = gjk(_sup(ka), ga, _sup(kb), gb)
            take = res.colliding & ~hit  # first colliding pair wins
            if simplex is None:
                simplex = res.simplex
            else:
                simplex = jnp.where(take, res.simplex, simplex)
            pa = jnp.where(take, i, pa)
            pb = jnp.where(take, j, pb)
            hit = hit | res.colliding
    if details:
        return hit, (simplex, pa, pb)
    return hit


def penetrates_with(
    parts_a: Parts, parts_b: Parts, solver_iterations: int = 48
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(colliding, penetration_vector): the deepest part-pair EPA result.

    ``penetration_vector`` moves A so the composites separate (reference
    penetration_depth/penetrates_with, _universal_shape.py:112-132).
    """
    best_pen = jnp.zeros((2,), jnp.float32)
    best_d = jnp.asarray(-jnp.inf)
    any_hit = jnp.zeros((), bool)
    for i in range(parts_a.n_parts):
        ka, ga = _part_geom(parts_a, i)
        for j in range(parts_b.n_parts):
            kb, gb = _part_geom(parts_b, j)
            res = gjk(_sup(ka), ga, _sup(kb), gb)
            pen = epa(_sup(ka), ga, _sup(kb), gb, res.simplex, solver_iterations)
            pen = jnp.where(res.colliding, pen, jnp.zeros_like(pen))
            d = jnp.sum(pen**2, axis=-1)
            take = res.colliding & (d > best_d)
            best_pen = jnp.where(take, pen, best_pen)
            best_d = jnp.where(take, d, best_d)
            any_hit = any_hit | res.colliding
    return any_hit, best_pen


def possibly_collides_with(parts_a: Parts, parts_b: Parts, margin=0.0) -> jnp.ndarray:
    """AABB broad phase over composite extents."""
    lo_a, hi_a = parts_a.extents()
    lo_b, hi_b = parts_b.extents()
    lo_a = jnp.min(lo_a, axis=-2)
    hi_a = jnp.max(hi_a, axis=-2)
    lo_b = jnp.min(lo_b, axis=-2)
    hi_b = jnp.max(hi_b, axis=-2)
    return jnp.all((hi_a + margin >= lo_b) & (hi_b + margin >= lo_a), axis=-1)
