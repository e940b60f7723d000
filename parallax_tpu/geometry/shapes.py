"""Uniform convex-part tables: the TPU-native shape representation.

The reference models shapes as a Python class hierarchy (Circle / AABB /
Polygon3..6 / UniversalShape, cf. /root/reference/cotix/_convex_shapes.py and
_universal_shape.py) and dispatches collision kernels on Python types at
trace time.  That design cannot batch heterogeneous worlds and explodes
compile time quadratically (reference _colliders.py:86-131).

Here every convex part is one row of a fixed-shape table:

* ``kind``    — CIRCLE / BOX / POLYGON (static Python tuple)
* ``verts``   — [P, MAX_VERTS, 2] local-frame vertex storage
                 - polygon: clockwise-ordered vertices, padded by repeating
                   the last valid vertex (so un-masked argmax supports are
                   exact)
                 - box:     verts[0] = lower, verts[1] = upper corner
                 - circle:  verts[0] = center offset in body frame
* ``radius``  — [P] circle radius (0 otherwise)
* ``nverts``, ``body`` — static topology (owning body index)

``verts`` and ``radius`` are pytree leaves — shape geometry is
differentiable and can itself be batched or learned.

Supports / containment / edges are branchless and batched; collision
kernels are selected *statically* per pair group (see
``parallax_tpu.engine.collider``), never via traced switches.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from parallax_tpu.geometry.math import order_clockwise, rotate, safe_normalize

CIRCLE = 0
BOX = 1  # axis-aligned box (the reference's AABB shape)
POLYGON = 2

KIND_NAMES = {CIRCLE: "circle", BOX: "box", POLYGON: "polygon"}

MAX_VERTS = 8


@dataclasses.dataclass(frozen=True)
class ShapeSpec:
    """Host-side description of one convex part (pre-table construction)."""

    kind: int
    verts: np.ndarray  # [nverts, 2]
    radius: float = 0.0

    @property
    def nverts(self) -> int:
        return int(self.verts.shape[0])


def circle(radius, position=(0.0, 0.0)) -> ShapeSpec:
    """Circle of ``radius`` centered at ``position`` in the body frame.

    Reference: Circle (_convex_shapes.py:10-47).
    """
    return ShapeSpec(
        kind=CIRCLE,
        verts=np.asarray([position], dtype=np.float32),
        radius=float(radius),
    )


def box(lower, upper) -> ShapeSpec:
    """Axis-aligned box with min/max corners (reference AABB,

    _convex_shapes.py:50-133)."""
    lower = np.asarray(lower, dtype=np.float32)
    upper = np.asarray(upper, dtype=np.float32)
    if not np.all(upper > lower):
        raise ValueError(f"box is invalid: lower={lower} upper={upper}")
    return ShapeSpec(kind=BOX, verts=np.stack([lower, upper]), radius=0.0)


# Reference-compatible alias.
aabb = box


def polygon(vertices) -> ShapeSpec:
    """Convex polygon; vertices are ordered with the reference's

    atan2-argsort convention (_convex_shapes.py:136-155)."""
    v = np.asarray(vertices, dtype=np.float32)
    if v.ndim != 2 or v.shape[-1] != 2 or v.shape[0] < 3:
        raise ValueError(f"polygon needs [n>=3, 2] vertices, got {v.shape}")
    if v.shape[0] > MAX_VERTS:
        raise ValueError(f"polygon exceeds MAX_VERTS={MAX_VERTS}")
    v = np.asarray(order_clockwise(jnp.asarray(v)))
    return ShapeSpec(kind=POLYGON, verts=v, radius=0.0)


def regular_polygon(n: int, radius: float, position=(0.0, 0.0)) -> ShapeSpec:
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    v = np.stack([np.cos(ang), np.sin(ang)], axis=-1) * radius + np.asarray(position)
    return polygon(v)


class Parts(struct.PyTreeNode):
    """SoA table of convex parts (local frame).

    Dynamic leaves: ``verts`` [P, V, 2] and ``radius`` [P] (differentiable).
    Static fields: kind / nverts / owning body index, as hashable tuples.
    """

    verts: jnp.ndarray
    radius: jnp.ndarray
    kind: tuple = struct.field(pytree_node=False)
    nverts: tuple = struct.field(pytree_node=False)
    body: tuple = struct.field(pytree_node=False)

    @property
    def n_parts(self) -> int:
        return len(self.kind)

    @property
    def max_verts(self) -> int:
        return self.verts.shape[-2]

    @staticmethod
    def from_specs(
        specs: Sequence[ShapeSpec],
        body_index: Sequence[int],
        max_verts: int = MAX_VERTS,
    ) -> "Parts":
        assert len(specs) == len(body_index)
        P = len(specs)
        verts = np.zeros((P, max_verts, 2), dtype=np.float32)
        radius = np.zeros((P,), dtype=np.float32)
        for i, s in enumerate(specs):
            n = s.nverts
            verts[i, :n] = s.verts
            # pad by repeating the last valid vertex: supports & extents stay
            # exact with no masking.
            verts[i, n:] = s.verts[n - 1]
            radius[i] = s.radius
        return Parts(
            verts=jnp.asarray(verts),
            radius=jnp.asarray(radius),
            kind=tuple(int(s.kind) for s in specs),
            nverts=tuple(int(s.nverts) for s in specs),
            body=tuple(int(b) for b in body_index),
        )

    def to_world(self, pos, cos, sin, rotate_circles: bool = True) -> "Parts":
        """Transform all parts into the world frame given per-body poses.

        ``pos`` [n_bodies, 2], ``cos``/``sin`` [n_bodies] (leading batch axes
        allowed).  Per kind:

        * polygon — full rigid transform (reference
          AbstractPolygon.transform, _convex_shapes.py:181-187)
        * box     — translation only.  The reference never rotates AABBs
          (AABB.transform, _convex_shapes.py:113-117); parallax keeps that
          contract and asserts at build time that boxes live on non-rotating
          bodies (see engine.world).
        * circle  — center offset is rotated then translated.  NOTE: the
          reference translates only (Circle.transform,
          _convex_shapes.py:37-41), which is wrong for circles mounted
          off-center on a rotating body; set ``rotate_circles=False`` for
          bug-compatible behavior.  All reference envs use centered circles,
          where the two agree exactly.
        """
        pb = pos[..., list(self.body), :]  # [..., P, 2]
        cb = cos[..., list(self.body)]  # [..., P]
        sb = sin[..., list(self.body)]

        is_poly = np.asarray([k == POLYGON for k in self.kind])
        is_circle = np.asarray([k == CIRCLE for k in self.kind])

        v = self.verts  # [P, V, 2] (or broadcast batch)
        c = cb[..., None]
        s = sb[..., None]
        rx = c * v[..., 0] - s * v[..., 1]
        ry = s * v[..., 0] + c * v[..., 1]
        rotated = jnp.stack([rx, ry], axis=-1)

        rot_mask = is_poly | (is_circle if rotate_circles else np.zeros_like(is_poly))
        sel = jnp.asarray(rot_mask)[..., :, None, None]
        out = jnp.where(sel, rotated, v) + pb[..., None, :]
        return self.replace(verts=out)

    # ---- per-part geometric queries (batched over leading axes) ----

    def extents(self):
        """Conservative AABB per part: (lower [.., P, 2], upper [.., P, 2]).

        Used by the broad phase.  Equivalent role to the reference's
        ``AABB.of`` (_convex_shapes.py:68-77), computed in closed form.
        """
        v = self.verts
        is_circle = jnp.asarray([k == CIRCLE for k in self.kind])[..., :]
        is_box = jnp.asarray([k == BOX for k in self.kind])[..., :]

        poly_lo = jnp.min(v, axis=-2)
        poly_hi = jnp.max(v, axis=-2)
        circ_lo = v[..., 0, :] - self.radius[..., None]
        circ_hi = v[..., 0, :] + self.radius[..., None]
        box_lo = v[..., 0, :]
        box_hi = v[..., 1, :]

        lo = jnp.where(
            is_circle[..., None], circ_lo, jnp.where(is_box[..., None], box_lo, poly_lo)
        )
        hi = jnp.where(
            is_circle[..., None], circ_hi, jnp.where(is_box[..., None], box_hi, poly_hi)
        )
        return lo, hi

    def centers(self):
        """AABB-midpoint per part [.., P, 2] — the reference's center
        approximation (``AbstractShape.get_center``, _abstract_shapes.py:43:
        midpoint of the support-derived bounding box)."""
        lo, hi = self.extents()
        return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# Support functions over raw per-part geometry.
#
# These operate on the *gathered* geometry of a single part — ``verts``
# [.., V, 2] plus ``radius`` [..] — with the kind chosen statically by the
# caller (pair groups are static).  They are the innermost primitive of
# GJK/EPA, exactly as in the reference (_abstract_shapes.py:18-57).
# ---------------------------------------------------------------------------


def support_polygon(verts, direction):
    """Farthest vertex along ``direction``.  verts [.., V, 2], dir [.., 2].

    Padding repeats a valid vertex, so an unmasked argmax is exact
    (reference: AbstractPolygon.get_support, _convex_shapes.py:149-155).
    """
    dots = jnp.einsum("...vd,...d->...v", verts, direction)
    idx = jnp.argmax(dots, axis=-1)
    return jnp.take_along_axis(verts, idx[..., None, None], axis=-2)[..., 0, :]


def support_circle(center, radius, direction):
    """center + r * dir/|dir| (reference Circle.get_support,

    _convex_shapes.py:23-26)."""
    n = safe_normalize(direction)
    return center + radius[..., None] * n


def support_box(lower, upper, direction):
    """Elementwise corner select (reference AABB.get_support,

    _convex_shapes.py:63-66)."""
    return jnp.where(direction >= 0, upper, lower)


def support_any(kind: int, verts, radius, direction):
    """Static-kind dispatch used by pair-group kernels."""
    if kind == CIRCLE:
        return support_circle(verts[..., 0, :], radius, direction)
    if kind == BOX:
        return support_box(verts[..., 0, :], verts[..., 1, :], direction)
    return support_polygon(verts, direction)


# ---- containment tests -----------------------------------------------------


def contains_circle(center, radius, point, eps=1e-6):
    """Reference Circle.contains (_convex_shapes.py:28-29)."""
    return jnp.sum((point - center) ** 2, axis=-1) <= (radius + eps) ** 2


def contains_box(lower, upper, point, eps=1e-6):
    """Reference AABB.contains (_convex_shapes.py:105-106)."""
    return jnp.all((point >= lower - eps) & (point <= upper + eps), axis=-1)


def contains_polygon(verts, edge_mask, point):
    """All-edge same-sign test (reference AbstractPolygon.contains,

    _convex_shapes.py:168-175), masked for padded (zero-length) edges.
    ``edge_mask`` [.., V] marks real edges; padded edges contribute sign 0
    and are excluded.
    """
    nxt = jnp.roll(verts, shift=-1, axis=-2)
    e = verts - nxt  # edge vector (v_k - v_{k+1}) as in the reference
    n = jnp.stack([-e[..., 1], e[..., 0]], axis=-1)  # fast_normal
    rel = point[..., None, :] - verts  # [.., V, 2]
    d = jnp.sum(n * rel, axis=-1)  # [.., V]
    sgn = jnp.sign(d)
    # all real-edge signs equal (0 signs count as matching either side)
    pos_ok = jnp.all(jnp.where(edge_mask, sgn >= 0, True), axis=-1)
    neg_ok = jnp.all(jnp.where(edge_mask, sgn <= 0, True), axis=-1)
    return pos_ok | neg_ok


def polygon_edges(verts):
    """Edges as ([.., V, 2] start, [.., V, 2] end) including padded ones."""
    return verts, jnp.roll(verts, shift=-1, axis=-2)


def box_corners(lower, upper):
    """4 corners in the reference's ordering (AABB.get_vertices,

    _convex_shapes.py:95-103): upper, (ux, ly), lower, (lx, uy)."""
    ux, uy = upper[..., 0], upper[..., 1]
    lx, ly = lower[..., 0], lower[..., 1]
    return jnp.stack(
        [
            jnp.stack([ux, uy], axis=-1),
            jnp.stack([ux, ly], axis=-1),
            jnp.stack([lx, ly], axis=-1),
            jnp.stack([lx, uy], axis=-1),
        ],
        axis=-2,
    )


def edge_mask_for(nverts: int, max_verts: int) -> np.ndarray:
    """Static mask of real edges for an ``nverts``-gon padded to max_verts.

    With repeat-padding, vertices [0..nverts-1] are distinct and vertex
    nverts-1 repeats to the end; real edges are (0..nverts-2 -> +1) plus the
    closing edge (max_verts-1 -> 0), i.e. the padded run collapses onto the
    closing edge.
    """
    m = np.zeros((max_verts,), dtype=bool)
    m[: nverts - 1] = True
    m[max_verts - 1] = True
    return m
