"""Static pair tables + the batched collide pipeline.

The reference's ``RandomizedCollider`` rebuilds its pair structure at trace
time from Python type inspection for every call
(/root/reference/cotix/_colliders.py:86-131) — O(bodies^2 * parts^2) graph
construction that cannot batch worlds.  parallax builds the pair table
**once**, on the host, when the world is defined:

* every candidate part pair (excluding static-static and filtered pairs) is
  classified by its contact-kernel type;
* pairs are grouped per kernel into contiguous static index vectors;
* at step time each group runs one vmapped analytic kernel over its gathered
  world-frame geometry, and the groups concatenate into a single flat
  ``[C]`` contact buffer with static body-index vectors.

Kernel selection is therefore entirely static — no traced switches — and
the whole collide + resolve step is one fused XLA program.

Kernel canonical ordering follows the reference's type-pair dict
(_colliders.py:21-35): circle < box < polygon; when a pair is swapped to
canonical order the produced contact simply belongs to (a, b) in canonical
order (the solver is symmetric).  Unlike the reference — which swaps the
shapes but forgets to reorient the stored contact (_colliders.py:149-164) —
orientation here is always consistent.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.geometry.contacts import (
    Contact,
    contact_box_box,
    contact_box_polygon_gjk_epa,
    contact_box_polygon_manifold,
    contact_circle_box,
    contact_circle_circle,
    contact_circle_in_box,
    contact_circle_in_polygon,
    contact_circle_polygon,
    contact_circle_polygon_gjk_epa,
    contact_polygon_polygon_gjk_epa,
    contact_polygon_polygon_manifold,
    contact_verts_in_box,
    contact_verts_in_polygon,
)
from parallax_tpu.geometry.shapes import (
    BOX,
    CIRCLE,
    POLYGON,
    Parts,
    box_corners,
    edge_mask_for,
)


@dataclasses.dataclass(frozen=True)
class PairGroup:
    """One kernel's worth of part pairs (static)."""

    kernel: str  # cc | cb | bb | cp | bp | pp | area_cb
    part_a: tuple  # canonical A-side part indices
    part_b: tuple
    body_a: tuple  # owning bodies (canonical order)
    body_b: tuple

    @property
    def size(self) -> int:
        return len(self.part_a)


# singleton-lane kernels first, manifold (2-lane) kernels last: the solver
# exploits the contiguous interleaved manifold suffix for static partner
# swaps (see engine.batched.solve_contacts_bm)
KERNEL_ORDER = (
    "cc",
    "cb",
    "bb",
    "cp",
    "area_cb",
    "area_pb",
    "area_bb",
    "area_cp",
    "area_pp",
    "area_bp",
    "bp",
    "pp",
)

# kernels that emit a 2-point manifold (two contact lanes per pair)
MANIFOLD_KERNELS = ("bp", "pp")

_KIND_PAIR_TO_KERNEL = {
    (CIRCLE, CIRCLE): "cc",
    (CIRCLE, BOX): "cb",
    (BOX, BOX): "bb",
    (CIRCLE, POLYGON): "cp",
    (BOX, POLYGON): "bp",
    (POLYGON, POLYGON): "pp",
}


@dataclasses.dataclass(frozen=True)
class PairTable:
    """All static pair groups plus flat body-index vectors."""

    groups: tuple  # tuple[PairGroup]
    body_a: tuple  # concatenated over groups, length C
    body_b: tuple
    partner: tuple  # partner lane of a 2-point manifold, or -1

    @property
    def n_contacts(self) -> int:
        return len(self.body_a)


def build_pair_table(
    parts: Parts,
    static_bodies: Sequence[bool],
    area_bodies: Sequence[bool],
    collision_filter: Sequence[tuple] = (),
    narrowphase: str = "sat",
    part_collision_filter: Sequence[tuple] = (),
) -> PairTable:
    """Host-side pair enumeration.

    * static-static pairs are dropped (nothing to resolve);
    * pairs in ``collision_filter`` (unordered body-index tuples) dropped;
    * pairs in ``part_collision_filter`` (unordered PART-index tuples)
      dropped — for callers that statically know two specific parts can
      never touch (e.g. per-body terrain-candidate windows);
    * pairs involving an area body produce containment kernels: the
      non-area body must stay inside the area shape
      (reference intent, _robocup.py:88-109);
    * everything else is classified by (kind_a, kind_b) canonical order.
    """
    filt = {tuple(sorted(p)) for p in collision_filter}
    pfilt = {tuple(sorted(p)) for p in part_collision_filter}
    P = parts.n_parts
    buckets: dict = {k: [] for k in KERNEL_ORDER}

    for p in range(P):
        for q in range(p + 1, P):
            bi, bj = parts.body[p], parts.body[q]
            if bi == bj:
                continue
            if tuple(sorted((bi, bj))) in filt:
                continue
            if pfilt and (p, q) in pfilt:
                continue
            if static_bodies[bi] and static_bodies[bj]:
                continue
            ai, aj = area_bodies[bi], area_bodies[bj]
            if ai and aj:
                continue
            ki, kj = parts.kind[p], parts.kind[q]
            if ai or aj:
                # containment: A = contained body, B = area part
                (cp, cb_, cbody, abody) = (q, p, bj, bi) if ai else (p, q, bi, bj)
                ck = parts.kind[cp]
                ak = parts.kind[cb_]
                if ak == BOX:
                    kernel = {CIRCLE: "area_cb", POLYGON: "area_pb", BOX: "area_bb"}[ck]
                elif ak == POLYGON:
                    kernel = {CIRCLE: "area_cp", POLYGON: "area_pp", BOX: "area_bp"}[ck]
                else:
                    raise NotImplementedError(
                        "circle-shaped area parts are not supported; use a "
                        "box or convex-polygon area"
                    )
                buckets[kernel].append((cp, cb_, cbody, abody))
                continue
            if (ki, kj) in _KIND_PAIR_TO_KERNEL:
                kernel = _KIND_PAIR_TO_KERNEL[(ki, kj)]
                buckets[kernel].append((p, q, bi, bj))
            else:
                kernel = _KIND_PAIR_TO_KERNEL[(kj, ki)]
                buckets[kernel].append((q, p, bj, bi))

    groups = []
    body_a_all, body_b_all, partner_all = [], [], []
    manifold_kernels = MANIFOLD_KERNELS if narrowphase == "sat" else ()
    for kernel in KERNEL_ORDER:
        rows = buckets[kernel]
        if not rows:
            continue
        pa, pb, ba, bb_ = zip(*rows)
        groups.append(
            PairGroup(
                kernel=kernel,
                part_a=tuple(pa),
                part_b=tuple(pb),
                body_a=tuple(ba),
                body_b=tuple(bb_),
            )
        )
        if kernel in manifold_kernels:
            # two contact lanes per pair, interleaved to match
            # _flatten_manifold's (pair, point) ordering
            for x, y in zip(ba, bb_):
                base = len(body_a_all)
                body_a_all.extend((x, x))
                body_b_all.extend((y, y))
                partner_all.extend((base + 1, base))
        else:
            body_a_all.extend(ba)
            body_b_all.extend(bb_)
            partner_all.extend([-1] * len(ba))
    return PairTable(
        groups=tuple(groups),
        body_a=tuple(body_a_all),
        body_b=tuple(body_b_all),
        partner=tuple(partner_all),
    )


def _flatten_manifold(out: Contact) -> Contact:
    """[G, 2(lanes), ...] manifold contacts -> flat [2G, ...] lanes
    (lane order: pair0-pt0, pair0-pt1, pair1-pt0, ...)."""
    return Contact(
        penetration=out.penetration.reshape((-1, 2)),
        point=out.point.reshape((-1, 2)),
        active=out.active.reshape((-1,)),
        weight=out.weight.reshape((-1,)),
    )


def _edge_masks(parts: Parts, idx) -> jnp.ndarray:
    V = parts.max_verts
    return jnp.asarray(
        np.stack([edge_mask_for(parts.nverts[i], V) for i in idx])
    )


# AABB broad-phase slack: a true contact always has overlapping AABBs, so a
# small positive margin makes the cull conservative under f32 noise.
BROADPHASE_MARGIN = 1e-6


def _poly_aabb(v):
    """[.., G, V, 2] world vertices -> (lo, hi) [.., G, 2].

    Repeat-padded vertex tables are min/max-safe (pad rows duplicate real
    vertices)."""
    return v.min(axis=-2), v.max(axis=-2)


def _circle_aabb(c, r):
    """[.., G, 2] centers + [.., G] radii -> (lo, hi)."""
    return c - r[..., None], c + r[..., None]


def _aabb_overlap(a, b):
    """(lo, hi) pairs -> [.., G] bool overlap mask (the reference's
    possibly_collides_with, /root/reference/cotix/_universal_shape.py:109-110)."""
    (alo, ahi), (blo, bhi) = a, b
    m = BROADPHASE_MARGIN
    return jnp.all((alo <= bhi + m) & (blo <= ahi + m), axis=-1)


def _apply_broadphase(out: Contact, ov, manifold: bool) -> Contact:
    """AND an AABB pre-mask into a group's contact lanes (zeroing culled
    penetrations so downstream invariants hold)."""
    if manifold:
        ov = jnp.repeat(ov, 2, axis=-1)
    return Contact(
        penetration=out.penetration * ov[..., None],
        point=out.point,
        active=out.active & ov,
        weight=out.weight,
    )


def collide(
    world_parts: Parts,
    table: PairTable,
    narrowphase: str = "sat",
    broadphase: bool = False,
) -> Contact:
    """Run every pair group's kernel; returns a flat [.., C] contact buffer.

    ``world_parts`` must already be in the world frame
    (``Parts.to_world``).  Batch axes lead; pair-group gathers index the
    part axis (-3 for verts, -1 for radius).

    ``broadphase`` ANDs a cheap AABB-overlap pre-mask into the cp/bp/pp
    groups' activity (circle/box kernels are self-masking: their own
    activity test is at most the AABB test).  Conservative: never culls a
    truly penetrating pair.
    """
    v = world_parts.verts  # [.., P, V, 2]
    r = world_parts.radius  # [P] (unbatched leaf) or [.., P]
    pieces = []

    for g in table.groups:
        ia = list(g.part_a)
        ib = list(g.part_b)
        va = v[..., ia, :, :]
        vb = v[..., ib, :, :]
        ra = r[..., ia]
        rb = r[..., ib]

        if g.kernel == "cc":
            out = jax.vmap(contact_circle_circle)(
                va[..., 0, :], ra, vb[..., 0, :], rb
            )
        elif g.kernel == "cb":
            out = jax.vmap(contact_circle_box)(
                va[..., 0, :], ra, vb[..., 0, :], vb[..., 1, :]
            )
        elif g.kernel == "bb":
            out = jax.vmap(contact_box_box)(
                va[..., 0, :], va[..., 1, :], vb[..., 0, :], vb[..., 1, :]
            )
        elif g.kernel == "cp":
            emb = _edge_masks(world_parts, ib)
            if narrowphase == "gjk_epa":
                out = jax.vmap(
                    lambda c, r_, v_, e_: contact_circle_polygon_gjk_epa(
                        c, r_, v_, e_, 128
                    )
                )(va[..., 0, :], ra, vb, emb)
            else:
                out = jax.vmap(contact_circle_polygon)(va[..., 0, :], ra, vb, emb)
            if broadphase:
                ov = _aabb_overlap(_circle_aabb(va[..., 0, :], ra), _poly_aabb(vb))
                out = _apply_broadphase(out, ov, manifold=False)
        elif g.kernel == "bp":
            emb = _edge_masks(world_parts, ib)
            if narrowphase == "gjk_epa":
                iters = min(48, 4 + max(world_parts.nverts[i] for i in ib) + 1)
                out = jax.vmap(
                    lambda lo, hi, v_, e_: contact_box_polygon_gjk_epa(
                        lo, hi, v_, e_, iters
                    )
                )(va[..., 0, :], va[..., 1, :], vb, emb)
            else:
                out = jax.vmap(contact_box_polygon_manifold)(
                    va[..., 0, :], va[..., 1, :], vb, emb
                )
                out = _flatten_manifold(out)
            if broadphase:
                ov = _aabb_overlap(
                    (va[..., 0, :], va[..., 1, :]), _poly_aabb(vb)
                )
                out = _apply_broadphase(out, ov, manifold=narrowphase != "gjk_epa")
        elif g.kernel == "pp":
            ema = _edge_masks(world_parts, ia)
            emb = _edge_masks(world_parts, ib)
            if narrowphase == "gjk_epa":
                iters = min(
                    48,
                    max(world_parts.nverts[i] for i in ia)
                    + max(world_parts.nverts[i] for i in ib)
                    + 1,
                )
                out = jax.vmap(
                    lambda a_, ea_, b_, eb_: contact_polygon_polygon_gjk_epa(
                        a_, ea_, b_, eb_, iters
                    )
                )(va, ema, vb, emb)
            else:
                out = jax.vmap(contact_polygon_polygon_manifold)(va, ema, vb, emb)
                out = _flatten_manifold(out)
            if broadphase:
                ov = _aabb_overlap(_poly_aabb(va), _poly_aabb(vb))
                out = _apply_broadphase(out, ov, manifold=narrowphase != "gjk_epa")
        elif g.kernel == "area_cb":
            out = jax.vmap(contact_circle_in_box)(
                va[..., 0, :], ra, vb[..., 0, :], vb[..., 1, :]
            )
        elif g.kernel == "area_pb":
            out = jax.vmap(contact_verts_in_box)(va, vb[..., 0, :], vb[..., 1, :])
        elif g.kernel == "area_bb":
            out = jax.vmap(
                lambda lo, hi, lb, ub: contact_verts_in_box(
                    box_corners(lo, hi), lb, ub
                )
            )(va[..., 0, :], va[..., 1, :], vb[..., 0, :], vb[..., 1, :])
        elif g.kernel == "area_cp":
            emb = _edge_masks(world_parts, ib)
            out = jax.vmap(contact_circle_in_polygon)(va[..., 0, :], ra, vb, emb)
        elif g.kernel == "area_pp":
            emb = _edge_masks(world_parts, ib)
            out = jax.vmap(contact_verts_in_polygon)(va, vb, emb)
        elif g.kernel == "area_bp":
            emb = _edge_masks(world_parts, ib)
            out = jax.vmap(
                lambda lo, hi, vb_, em: contact_verts_in_polygon(
                    box_corners(lo, hi), vb_, em
                )
            )(va[..., 0, :], va[..., 1, :], vb, emb)
        else:  # pragma: no cover
            raise ValueError(g.kernel)
        pieces.append(out)

    if not pieces:
        z = jnp.zeros(v.shape[:-3] + (0, 2), v.dtype)
        return Contact(
            penetration=z,
            point=z,
            active=jnp.zeros(z.shape[:-1], bool),
            weight=jnp.ones(z.shape[:-1], v.dtype),
        )

    return Contact(
        penetration=jnp.concatenate([p.penetration for p in pieces], axis=-2),
        point=jnp.concatenate([p.point for p in pieces], axis=-2),
        active=jnp.concatenate([p.active for p in pieces], axis=-1),
        weight=jnp.concatenate([p.weight for p in pieces], axis=-1),
    )
