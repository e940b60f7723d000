"""Contact generation kernels.

Single-pair functions over raw world-frame geometry, designed to be
``vmap``-ped over (worlds x pairs) by the collider.  Each returns a
:class:`Contact`.

Conventions (identical to the reference, /root/reference/cotix/_contacts.py):

* ``penetration`` points **from body B toward body A** with magnitude equal
  to the penetration depth — translating body A by ``penetration``
  separates the shapes (the reference's EPA-displacement convention,
  _collisions.py:271-273).
* ``point`` is a single representative contact point.
* Inactive contacts are explicit (``active=False``) rather than the
  reference's NaN sentinel (ContactInfo.nan(), _contacts.py:19-21); NaN-free
  fast paths keep XLA free to vectorize without NaN-propagation hazards.
  ``Contact.isnan()`` is provided for API parity.

The analytic circle/box kernels replicate the reference formulas exactly.
Polygon kernels use SAT + reference/incident edge clipping — the
TPU-idiomatic fixed-shape narrow phase — instead of the reference's
GJK+EPA iteration (which is also available: `parallax_tpu.geometry.gjk/epa`)
The MTV produced by SAT is the exact minimal translation vector that EPA
approximates, so the two agree up to EPA's iteration error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from parallax_tpu.geometry.math import cross2, safe_norm, safe_normalize
from parallax_tpu.geometry.shapes import (
    box_corners,
    contains_circle,
    contains_polygon,
    polygon_edges,
)


class Contact(struct.PyTreeNode):
    penetration: jnp.ndarray  # [.., 2] — B -> A, |pen| = depth
    point: jnp.ndarray  # [.., 2]
    active: jnp.ndarray  # [..] bool
    weight: jnp.ndarray  # [..] impulse scale (manifold points share a pair's budget)

    def isnan(self):
        return ~self.active

    def invert(self):
        """Contact seen from the other body (reference ContactInfo.invert,

        _contacts.py:26-27): flips the penetration, keeps the point."""
        return self.replace(penetration=-self.penetration)

    @staticmethod
    def none(dtype=jnp.float32):
        return Contact(
            penetration=jnp.zeros((2,), dtype),
            point=jnp.zeros((2,), dtype),
            active=jnp.zeros((), bool),
            weight=jnp.ones((), dtype),
        )

    @staticmethod
    def single(penetration, point, active):
        """One full-weight contact."""
        return Contact(
            penetration=penetration,
            point=point,
            active=active,
            weight=jnp.ones(jnp.shape(active), penetration.dtype),
        )


def _safe_unit(v, fallback=None, eps=0.0):
    if fallback is None:
        fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
    return safe_normalize(v, fallback=fallback)


# ---------------------------------------------------------------------------
# Analytic kernels — exact ports of the reference formulas
# ---------------------------------------------------------------------------


def contact_circle_circle(ca, ra, cb, rb) -> Contact:
    """Reference circle_vs_circle (_contacts.py:30-58), including the

    same-side-center fallback."""
    delta = ca - cb
    dist = safe_norm(delta)
    direction = jnp.where(dist == 0.0, jnp.array([1.0, 0.0], delta.dtype), delta / jnp.where(dist == 0.0, 1.0, dist))
    pen_raw = direction * jnp.minimum(dist - (ra + rb), 0.0)
    point = (cb + direction * (rb - ra) + ca) / 2.0
    # centers must lie on opposite sides of the contact point; otherwise use
    # the contained center.
    same_side = jnp.sum((ca - point) * (cb - point)) > 0
    fallback = jnp.where(contains_circle(ca, ra, cb), cb, ca)
    point = jnp.where(same_side, fallback, point)
    active = dist <= ra + rb
    return Contact.single(-pen_raw, point, active)


def contact_box_box(la, ua, lb, ub, eps=1e-8) -> Contact:
    """Reference aabb_vs_aabb (_contacts.py:61-96): min-of-4-axis-depths."""
    separated = (
        (ua[1] <= lb[1]) | (la[1] >= ub[1]) | (ua[0] <= lb[0]) | (la[0] >= ub[0])
    )
    depths = jnp.stack(
        [
            jnp.maximum(ua[1] - lb[1], -eps),
            jnp.maximum(ub[1] - la[1], -eps),
            jnp.maximum(ua[0] - lb[0], -eps),
            jnp.maximum(ub[0] - la[0], -eps),
        ]
    )
    dirs = jnp.array([[0.0, -1.0], [0.0, 1.0], [-1.0, 0.0], [1.0, 0.0]], depths.dtype)
    idx = jnp.argmin(depths)
    min_depth = jnp.clip(depths[idx], min=0.0)
    pen = min_depth * dirs[idx]
    point = (jnp.minimum(ua, ub) + jnp.maximum(la, lb)) / 2.0
    return Contact.single(pen, point, ~separated)


def contact_circle_box(c, r, lb, ub, eps=1e-6) -> Contact:
    """Reference circle_vs_aabb (_contacts.py:99-154): clamp-to-box closest

    point; vertex case moves diagonally, face case along the best axis."""
    ccp = jnp.clip(c, lb, ub)  # closest point of the box to the circle center
    corners = box_corners(lb, ub)  # [4, 2]
    perfect_vertex = jnp.any(jnp.linalg.norm(corners - ccp, axis=-1) < eps)

    # vertex case: push along (ccp - center)
    dirv = ccp - c
    dirv_n = _safe_unit(dirv)
    pen_vertex = -(c + r * dirv_n - ccp)

    # face case: smallest single-axis shift that frees the circle
    shifts = jnp.stack(
        [
            c[1] + r - lb[1],
            ub[1] - (c[1] - r),
            c[0] + r - lb[0],
            ub[0] - (c[0] - r),
        ]
    )
    dirs = jnp.array([[0.0, 1.0], [0.0, -1.0], [1.0, 0.0], [-1.0, 0.0]], shifts.dtype)
    best = jnp.argmin(shifts)
    pen_face = -shifts[best] * dirs[best]

    pen = jnp.where(perfect_vertex, pen_vertex, pen_face)
    active = contains_circle(c, r, ccp, eps=eps)
    return Contact.single(pen, ccp, active)


# ---------------------------------------------------------------------------
# Circle vs polygon — closed form (the reference runs GJK + 128-iteration
# EPA here, _contacts.py:157-202; the closed form computes the same MTV)
# ---------------------------------------------------------------------------


def contact_circle_polygon(c, r, verts, edge_mask) -> Contact:
    """``verts`` [V, 2] world-frame clockwise-ordered, ``edge_mask`` [V]

    static mask of real edges (edge k = verts[k] -> verts[k+1 mod V])."""
    nxt = jnp.roll(verts, shift=-1, axis=-2)
    e = nxt - verts  # [V, 2]
    elen2 = jnp.sum(e**2, axis=-1)
    t = jnp.sum((c - verts) * e, axis=-1) / jnp.where(elen2 == 0, 1.0, elen2)
    t = jnp.clip(t, 0.0, 1.0)
    proj = verts + t[..., None] * e  # [V, 2] closest point per edge
    d2 = jnp.sum((c - proj) ** 2, axis=-1)
    d2 = jnp.where(edge_mask, d2, jnp.inf)
    j = jnp.argmin(d2)
    proj_j = proj[j]
    d2j = d2[j]
    dist = jnp.where(d2j == 0, 0.0, jnp.sqrt(jnp.where(d2j == 0, 1.0, d2j)))

    inside = contains_polygon(verts, edge_mask, c)

    # shallow case: center outside, boundary within r
    dir_out = _safe_unit(c - proj_j)  # polygon -> circle == B -> A
    pen_out = dir_out * (r - dist)

    # deep case: center inside; push along the nearest edge's outward normal
    # (for a clockwise-ordered polygon with the reference's atan2 ordering,
    # vertices advance CCW geometrically, so outward = (e.y, -e.x)).
    n_out = jnp.stack([e[..., 1], -e[..., 0]], axis=-1)
    n_out = n_out / jnp.sqrt(jnp.where(elen2 == 0, 1.0, elen2))[..., None]
    # distance from center to each edge line, measured inward
    signed = jnp.sum((c - verts) * n_out, axis=-1)  # negative inside
    signed = jnp.where(edge_mask, signed, -jnp.inf)
    k = jnp.argmax(signed)
    pen_in = n_out[k] * (r - signed[k])  # depth = r + |signed|

    pen = jnp.where(inside, pen_in, pen_out)
    point = jnp.where(inside, c, proj_j)
    active = inside | (dist <= r)
    pen = jnp.where(active, pen, jnp.zeros_like(pen))
    return Contact.single(pen, point, active)


# ---------------------------------------------------------------------------
# Polygon vs polygon — SAT + clipping (TPU-native narrow phase)
# ---------------------------------------------------------------------------


def _sat_axes(verts, edge_mask):
    """Unit outward normals of real edges; padded axes masked out."""
    nxt = jnp.roll(verts, shift=-1, axis=-2)
    e = nxt - verts
    n = jnp.stack([e[..., 1], -e[..., 0]], axis=-1)  # outward for CCW ordering
    ln = safe_norm(n, axis=-1)
    n = n / jnp.where(ln == 0, 1.0, ln)[..., None]
    valid = edge_mask & (ln > 0)
    return n, valid


def contact_polygon_polygon(va, ema, vb, emb) -> Contact:
    """Single-point polygon contact: the manifold's weighted mean point.

    Reference-compatible single ``ContactInfo``-style result
    (_contacts.py:294-315).  Solvers should prefer
    :func:`contact_polygon_polygon_manifold` (stable stacking needs the
    2-point manifold).
    """
    m = contact_polygon_polygon_manifold(va, ema, vb, emb)
    w = m.weight * m.active.astype(m.weight.dtype)
    wsum = jnp.sum(w, axis=-1)
    point = jnp.sum(m.point * w[..., None], axis=-2) / jnp.where(
        wsum == 0, 1.0, wsum
    )[..., None]
    point = jnp.where(
        (wsum == 0)[..., None], (m.point[..., 0, :] + m.point[..., 1, :]) / 2, point
    )
    # deepest lane carries the pair's MTV
    deepest = jnp.argmax(jnp.sum(m.penetration**2, axis=-1), axis=-1)
    pen = jnp.take_along_axis(
        m.penetration, deepest[..., None, None], axis=-2
    )[..., 0, :]
    return Contact.single(pen, point, jnp.any(m.active, axis=-1))


def contact_polygon_polygon_manifold(va, ema, vb, emb) -> Contact:
    """SAT minimal-translation vector + 2-point clipped contact manifold.

    ``va`` [Va, 2] / ``vb`` [Vb, 2] world-frame vertices (repeat-padded),
    ``ema``/``emb`` static real-edge masks.  Replaces the reference's
    GJK(32) + EPA(<=48) polygon path (_contacts.py:294-315) with the exact
    MTV in one fixed-shape pass.  Returns a Contact whose fields carry a
    trailing manifold axis of size 2 (two clipped points, weights summing
    to 1 for face contacts) — single-point contacts stack on a corner
    without it, so this is what the collider consumes for polygon pairs.
    """
    na, va_ok = _sat_axes(va, ema)
    nb, vb_ok = _sat_axes(vb, emb)
    axes = jnp.concatenate([na, nb], axis=0)  # [Va+Vb, 2]
    ok = jnp.concatenate([va_ok, vb_ok], axis=0)

    pa = va @ axes.T  # [Va, A] projections
    pb = vb @ axes.T
    min_a, max_a = jnp.min(pa, axis=0), jnp.max(pa, axis=0)
    min_b, max_b = jnp.min(pb, axis=0), jnp.max(pb, axis=0)
    # Directional push-out distances: translating A by +axis*o_pos (or
    # -axis*o_neg) separates the projections.  (The naive interval
    # *intersection length* understates the depth when one interval
    # contains the other.)
    o_pos = max_b - min_a
    o_neg = max_a - min_b
    overlap = jnp.minimum(o_pos, o_neg)
    overlap_m = jnp.where(ok, overlap, jnp.inf)

    active = jnp.min(overlap_m) >= 0
    idx = jnp.argmin(overlap_m)
    axis = axes[idx]
    depth = jnp.clip(overlap_m[idx], min=0.0)
    sign = jnp.where(o_pos[idx] <= o_neg[idx], 1.0, -1.0)
    pen = axis * depth * sign

    n_ba = axis * sign
    points, lane_depth = _clip_contact_points(va, ema, vb, emb, n_ba)
    # keep clip points within a depth tolerance of the face so a
    # microscopically tilted face contact still carries both points (a
    # strict cut degenerates to one corner and the pair rocks itself apart)
    keep_tol = jnp.maximum(depth, 1e-4)
    kept = lane_depth >= -keep_tol
    wsum = jnp.sum(kept.astype(points.dtype))
    # face contact: each point at its own depth, sharing the pair's impulse
    # budget; vertex contact: single full-weight point.
    wnorm = kept.astype(points.dtype) / jnp.where(wsum == 0, 1.0, wsum)
    wnorm = jnp.where(wsum == 0, jnp.array([1.0, 0.0], points.dtype), wnorm)
    lane_active = active & jnp.where(wsum == 0, jnp.array([True, False]), kept)
    # per-lane penetration: same MTV direction, the lane's own clipped depth
    # (deeper side pushes harder -> restoring torque on tilted faces)
    lane_pen = n_ba[None, :] * jnp.clip(lane_depth, 1e-6, None)[:, None]
    lane_pen = jnp.where(wsum == 0, jnp.broadcast_to(pen, (2, 2)), lane_pen)
    lane_pen = jnp.where(lane_active[:, None], lane_pen, 0.0)
    return Contact(
        penetration=lane_pen,
        point=points,
        active=lane_active,
        weight=wnorm,
    )


def _incident_edge(verts, edge_mask, ref_normal):
    """Edge of ``verts`` whose outward normal is most anti-parallel to

    ``ref_normal``; returns its endpoints."""
    nxt = jnp.roll(verts, shift=-1, axis=-2)
    e = nxt - verts
    n = jnp.stack([e[..., 1], -e[..., 0]], axis=-1)
    n = n / jnp.maximum(safe_norm(n, axis=-1, keepdims=True), 1e-12)
    d = jnp.einsum("vd,d->v", n, ref_normal)
    d = jnp.where(edge_mask, d, jnp.inf)
    k = jnp.argmin(d)
    return verts[k], nxt[k]


def _clip_contact_points(va, ema, vb, emb, n_ba):
    """Box2D-style reference-face clipping -> 2 points + per-point depths.

    The *reference face* is the edge (from either polygon) whose outward
    normal best aligns with the push-out direction of its owner — NOT the
    edge that happened to win the SAT argmin: the +/-axis pairs of both
    polygons are generically tied there, and picking e.g. A's far face
    corrupts the clip.  The other polygon's most anti-parallel edge is the
    *incident face*; its segment is clipped against the reference face's
    side planes, and each surviving endpoint carries its own depth past the
    reference face.  Fixed-cost replacement for the reference's
    mean-of-{contained vertices + edge intersections} (_contacts.py:205-267)
    with the same face-face / vertex-face behavior.
    """
    # candidate reference edges: best-aligned outward normal per polygon
    na, va_ok = _sat_axes(va, ema)
    nb, vb_ok = _sat_axes(vb, emb)
    align_a = jnp.where(va_ok, na @ (-n_ba), -jnp.inf)
    align_b = jnp.where(vb_ok, nb @ n_ba, -jnp.inf)
    ka = jnp.argmax(align_a)
    kb = jnp.argmax(align_b)
    ref_is_a = align_a[ka] >= align_b[kb]

    def pick(cond, x, y):
        return jnp.where(cond, x, y)

    ra = jnp.roll(va, shift=-1, axis=-2)
    rb = jnp.roll(vb, shift=-1, axis=-2)
    r0 = pick(ref_is_a, va[ka], vb[kb])
    r1 = pick(ref_is_a, ra[ka], rb[kb])
    # reference outward normal: out of A = -n_ba when A owns; +n_ba for B
    n_ref = pick(ref_is_a, -n_ba, n_ba)

    # incident edge on the other polygon (most anti-parallel to n_ref)
    ia, ib_ = _incident_edge(va, ema, n_ba)  # if B owns the reference
    ja, jb_ = _incident_edge(vb, emb, -n_ba)  # if A owns the reference
    i0 = pick(ref_is_a, ja, ia)
    i1 = pick(ref_is_a, jb_, ib_)

    # clip the incident segment against the reference face's side planes
    t = r1 - r0
    t = t / jnp.maximum(safe_norm(t), 1e-12)

    def clip(p0, p1, anchor, direction):
        """Keep the part of segment [p0, p1] with dot(p - anchor, dir) >= 0."""
        d0 = jnp.dot(p0 - anchor, direction)
        d1 = jnp.dot(p1 - anchor, direction)
        frac = d0 / jnp.where(d0 - d1 == 0, 1.0, d0 - d1)
        inter = p0 + frac * (p1 - p0)
        q0 = jnp.where(d0 < 0, jnp.where(d1 >= 0, inter, p0), p0)
        q1 = jnp.where(d1 < 0, jnp.where(d0 >= 0, inter, p1), p1)
        return q0, q1

    c0, c1 = clip(i0, i1, r0, t)
    c0, c1 = clip(c0, c1, r1, -t)

    # per-point penetration depth past the reference face (positive=inside)
    d0 = -jnp.dot(c0 - r0, n_ref)
    d1 = -jnp.dot(c1 - r0, n_ref)
    points = jnp.stack([c0, c1])  # [2, 2]
    depths = jnp.stack([d0, d1])  # [2]
    return points, depths


def contact_box_polygon(lb_box, ub_box, vp, emp) -> Contact:
    """Box treated as its 4-corner polygon, then SAT (reference routes this

    through GJK/EPA, _contacts.py:270-291; same MTV)."""
    vb4, em4 = _box_as_polygon(lb_box, ub_box)
    return contact_polygon_polygon(vb4, em4, vp, emp)


def contact_box_polygon_manifold(lb_box, ub_box, vp, emp) -> Contact:
    vb4, em4 = _box_as_polygon(lb_box, ub_box)
    return contact_polygon_polygon_manifold(vb4, em4, vp, emp)


def _box_as_polygon(lb_box, ub_box):
    vb4 = box_corners(lb_box, ub_box)
    # corners are (upper),(ux,ly),(lower),(lx,uy): clockwise in screen terms;
    # reorder to match the CCW edge-normal convention used by _sat_axes.
    vb4 = vb4[::-1]
    return vb4, jnp.ones((4,), bool)


# ---------------------------------------------------------------------------
# Containment ("area") contacts — keep a body inside an area body.
# The reference marks field/play-area bodies with is_area
# (_robocup.py:88-109) but never implemented their semantics; parallax
# implements the documented intent: a contact is generated when the body
# leaves the area, pushing it back inside.
# ---------------------------------------------------------------------------


def contact_circle_in_box(c, r, lb, ub) -> Contact:
    """Circle (body A) escaping an axis-aligned box area (body B).

    Penetration pushes the circle back inside (B -> A convention holds:
    the vector points from the wall toward the interior)."""
    over_hi = (c + r) - ub  # positive where escaping through upper walls
    over_lo = lb - (c - r)  # positive where escaping through lower walls
    esc_hi = jnp.maximum(over_hi, 0.0)
    esc_lo = jnp.maximum(over_lo, 0.0)
    pen = -esc_hi + esc_lo  # push down from upper walls, up from lower
    depth = jnp.maximum(jnp.max(esc_hi), jnp.max(esc_lo))
    active = depth > 0
    # representative point: circle surface point at the deepest wall
    dirs = jnp.stack(
        [
            jnp.array([1.0, 0.0]),
            jnp.array([0.0, 1.0]),
            jnp.array([-1.0, 0.0]),
            jnp.array([0.0, -1.0]),
        ]
    )
    depths4 = jnp.concatenate([over_hi, over_lo])  # [hi_x, hi_y, lo_x, lo_y]
    k = jnp.argmax(depths4)
    point = c + dirs[k] * r
    pen = jnp.where(active, pen, jnp.zeros_like(pen))
    return Contact.single(pen, point, active)


def contact_verts_in_box(verts, lb, ub) -> Contact:
    """Vertex-represented body (polygon, or box via its corners) escaping an
    axis-aligned box area.

    ``verts`` [V, 2] world-frame; repeat-padded rows are extreme-safe
    (duplicates never change a min/max/argmax).  Same wall-sum convention
    as :func:`contact_circle_in_box`; the contact point is the extreme
    vertex on the deepest wall, so the restoring impulse also torques the
    body back inside."""
    hi = verts.max(axis=-2)
    lo = verts.min(axis=-2)
    over_hi = hi - ub  # positive where escaping through upper walls
    over_lo = lb - lo  # positive where escaping through lower walls
    esc_hi = jnp.maximum(over_hi, 0.0)
    esc_lo = jnp.maximum(over_lo, 0.0)
    pen = -esc_hi + esc_lo
    depth = jnp.maximum(jnp.max(esc_hi), jnp.max(esc_lo))
    active = depth > 0
    # extreme vertex per wall: [max-x, max-y, min-x, min-y] vertex indices
    idx4 = jnp.stack(
        [
            jnp.argmax(verts[..., 0]),
            jnp.argmax(verts[..., 1]),
            jnp.argmin(verts[..., 0]),
            jnp.argmin(verts[..., 1]),
        ]
    )
    depths4 = jnp.concatenate([over_hi, over_lo])  # [hi_x, hi_y, lo_x, lo_y]
    point = verts[idx4[jnp.argmax(depths4)]]
    pen = jnp.where(active, pen, jnp.zeros_like(pen))
    return Contact.single(pen, point, active)


def _poly_inward_normals(verts, edge_mask):
    """Unit inward edge normals of a convex area polygon ([V, 2], mask [V]).

    Polygons follow the ordering of :func:`_sat_axes` (outward =
    ``(e.y, -e.x)``), so inward is the negation."""
    nxt = jnp.roll(verts, shift=-1, axis=-2)
    e = nxt - verts
    elen2 = jnp.sum(e**2, axis=-1)
    n_in = jnp.stack([-e[..., 1], e[..., 0]], axis=-1)
    n_in = n_in / jnp.sqrt(jnp.where(elen2 == 0, 1.0, elen2))[..., None]
    return n_in, edge_mask & (elen2 > 0)


def contact_circle_in_polygon(c, r, verts, edge_mask) -> Contact:
    """Circle escaping a convex polygon area: the center must keep inward
    distance >= r from every edge line.  Corner escapes are measured per
    edge (conservative, same per-wall logic as the box variant)."""
    n_in, valid = _poly_inward_normals(verts, edge_mask)
    d_in = jnp.sum((c - verts) * n_in, axis=-1)  # [V] positive inside
    viol = jnp.where(valid, r - d_in, -jnp.inf)  # positive where escaping
    k = jnp.argmax(viol)
    depth = viol[k]
    active = depth > 0
    pen = n_in[k] * jnp.maximum(depth, 0.0)  # push back inside
    point = c - n_in[k] * r  # circle surface point on the escaping side
    return Contact.single(pen, point, active)


def contact_verts_in_polygon(verts_a, area_verts, area_edge_mask) -> Contact:
    """Vertex-represented body escaping a convex polygon area.

    A vertex is outside when its inward distance to some area edge goes
    negative; the deepest such vertex anchors the contact and the most
    violated edge's inward normal gives the push-back direction."""
    n_in, valid = _poly_inward_normals(area_verts, area_edge_mask)
    # d[v, e] = inward distance of vertex v from area edge e
    d_in = jnp.einsum("ved,ed->ve", verts_a[:, None, :] - area_verts[None], n_in)
    viol = jnp.where(valid[None], -d_in, -jnp.inf)  # [Va, Ve] >0 outside edge
    per_vertex = viol.max(axis=-1)  # escape depth per vertex
    v = jnp.argmax(per_vertex)
    k = jnp.argmax(viol[v])
    depth = per_vertex[v]
    active = depth > 0
    pen = n_in[k] * jnp.maximum(depth, 0.0)
    point = verts_a[v]
    return Contact.single(pen, point, active)


# ---------------------------------------------------------------------------
# Reference-mode kernels: GJK + EPA narrow phase, edge-mean contact points —
# the algorithms the reference actually runs for polygon pairs
# (_contacts.py:157-316).  Slower than SAT but bit-faithful to the reference
# pipeline; selected with WorldConfig(narrowphase="gjk_epa").
# ---------------------------------------------------------------------------


def _sup_poly(geom, d):
    from parallax_tpu.geometry.shapes import support_polygon

    return support_polygon(geom, d)


def _sup_circle(geom, d):
    from parallax_tpu.geometry.shapes import support_circle

    c, r = geom
    return support_circle(c, r, d)


def _sup_box(geom, d):
    from parallax_tpu.geometry.shapes import support_box

    lo, hi = geom
    return support_box(lo, hi, d)


# imported here (not at module top) to keep geometry.contacts importable
# before gjk/epa during partial builds; safe because these modules hold no
# traced module-level state.
from parallax_tpu.geometry.epa import epa as _epa  # noqa: E402
from parallax_tpu.geometry.gjk import gjk as _gjk  # noqa: E402


def _segment_intersections(va, vb):
    """All edge-edge intersection points between two padded polygons.

    Returns ([Va*Vb, 2] points, [Va*Vb] valid).  Reference edge_vs_edge
    (_contacts.py:206-225)."""
    pa, ra = polygon_edges(va)
    pb, rb = polygon_edges(vb)
    p = pa  # [Va, 2] edge starts
    r = ra - pa  # [Va, 2] edge vectors
    q = pb
    s = rb - pb

    c = r[:, None, 0] * s[None, :, 1] - r[:, None, 1] * s[None, :, 0]  # [Va, Vb]
    qp = q[None, :, :] - p[:, None, :]
    crs_qp_s = qp[..., 0] * s[None, :, 1] - qp[..., 1] * s[None, :, 0]
    crs_qp_r = qp[..., 0] * r[:, None, 1] - qp[..., 1] * r[:, None, 0]
    safe_c = jnp.where(c == 0, 1.0, c)
    t = crs_qp_s / safe_c
    u = crs_qp_r / safe_c
    valid = (c != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p[:, None, :] + t[..., None] * r[:, None, :]
    return pts.reshape(-1, 2), valid.reshape(-1)


def contact_point_edges_mean(va, ema, vb, emb):
    """Reference _contact_from_edges (_contacts.py:205-267): mean of
    {edge-edge intersections} ∪ {vertices of A inside B} ∪ {vertices of B
    inside A}; (nan-free: returns (point, any_found))."""
    pts, valid = _segment_intersections(va, vb)
    # padded (zero-length) edges can't produce c != 0 intersections with
    # distinct real edges unless collinear degenerate; mask via edge masks
    em = (ema[:, None] & emb[None, :]).reshape(-1)
    valid = valid & em

    in_b = jax.vmap(lambda p: contains_polygon(vb, emb, p))(va)
    in_a = jax.vmap(lambda p: contains_polygon(va, ema, p))(vb)
    cand = jnp.concatenate([pts, va, vb], axis=0)
    w = jnp.concatenate([valid, in_b, in_a]).astype(va.dtype)
    wsum = jnp.sum(w)
    mean = jnp.sum(cand * w[:, None], axis=0) / jnp.where(wsum == 0, 1.0, wsum)
    return mean, wsum > 0


def contact_polygon_polygon_gjk_epa(va, ema, vb, emb, solver_iterations=48) -> Contact:
    """Reference polygon_vs_polygon (_contacts.py:294-315): GJK boolean +
    EPA penetration + edges-mean contact point."""
    res = _gjk(_sup_poly, va, _sup_poly, vb)
    pen = _epa(_sup_poly, va, _sup_poly, vb, res.simplex, solver_iterations)
    point, found = contact_point_edges_mean(va, ema, vb, emb)
    active = res.colliding & found
    pen = jnp.where(active, pen, jnp.zeros_like(pen))
    pen = jnp.where(jnp.isnan(pen), 0.0, pen)
    return Contact.single(pen, jnp.where(found, point, (va[0] + vb[0]) / 2), active)


def contact_box_polygon_gjk_epa(lb_box, ub_box, vp, emp, solver_iterations=48) -> Contact:
    """Reference aabb_vs_polygon (_contacts.py:270-291)."""
    res = _gjk(_sup_box, (lb_box, ub_box), _sup_poly, vp)
    pen = _epa(_sup_box, (lb_box, ub_box), _sup_poly, vp, res.simplex, solver_iterations)
    vb4, em4 = _box_as_polygon(lb_box, ub_box)
    point, found = contact_point_edges_mean(vb4, em4, vp, emp)
    active = res.colliding & found
    pen = jnp.where(active, pen, jnp.zeros_like(pen))
    pen = jnp.where(jnp.isnan(pen), 0.0, pen)
    return Contact.single(pen, jnp.where(found, point, (vb4[0] + vp[0]) / 2), active)


def contact_circle_polygon_gjk_epa(c, r, verts, edge_mask, solver_iterations=128) -> Contact:
    """Reference circle_vs_polygon (_contacts.py:157-202): GJK + 128-iter
    EPA; contact point via the reference's closest-edge formula (including
    its literal mirror-point arithmetic, `circle.position + (c - proj)`,
    _contacts.py:190-197 — kept for trajectory parity)."""
    res = _gjk(_sup_circle, (c, r), _sup_poly, verts)
    pen = _epa(_sup_circle, (c, r), _sup_poly, verts, res.simplex, solver_iterations)

    nxt = jnp.roll(verts, shift=-1, axis=-2)
    e = nxt - verts
    elen2 = jnp.sum(e**2, axis=-1)
    t = jnp.sum((c - verts) * e, axis=-1) / jnp.where(elen2 == 0, 1.0, elen2)
    t = jnp.clip(t, 0.0, 1.0)
    proj = verts + t[..., None] * e
    disp = c - proj
    d2 = jnp.sum(disp**2, axis=-1)
    d2 = jnp.where(edge_mask, d2, jnp.inf)
    j = jnp.argmin(d2)
    point = jnp.where(d2[j] > r**2, c, c + disp[j])

    pen = jnp.where(res.colliding, pen, jnp.zeros_like(pen))
    pen = jnp.where(jnp.isnan(pen), 0.0, pen)
    return Contact.single(pen, point, res.colliding)
