"""Key-for-key replay of the reference's RandomizedCollider.

The reference's collider (/root/reference/cotix/_colliders.py:76-351)
consumes PRNG keys along a tree whose *shape* is fixed at trace time by its
Python-level bucketing of part pairs (`:86-131`).  That bucketing is a
deterministic, host-computable function of the static body/part list, so
the whole key tree can be reconstructed exactly:

    skey = split(rkey)[0]                                  (:142)
    per type-pair bucket, in dict insertion order (:143):
        skey = split(skey)[0]                              (:175)
        scatter keys = split(skey, N2)                     (:264)
          per ind2: split(key, N1)                         (:254)
            per ind1: key1, key2 = split(key)              (:222)
                      bernoulli(key1, 0.5)                 (:223)
                      bernoulli(key2, 0.5)   # discarded   (:224)
    choice keys = split(skey_final, n_bodies)              (:295)
      per body i: jr.choice(key_i, arange(n), p=row_probs) (:284)

``solver_mode="random_one_per_body_keyed"`` replays this consumption order
bit-for-bit, including the reference's structural quirks:

* each bucket's sides are deduplicated **independently**, breaking the
  original pairing, and the scatter walks the full N1 x N2 cross product
  (ind2-major) — including self-cells (i == i) and re-derived pairs;
* cells with i < j are masked to ContactInfo.nan() (:163) — their
  Bernoulli keys are still consumed positionally;
* per-cell contact functions are dispatched on the cell's *actual* part
  types with the reference's swap rule (:154-157), and a swapped call's
  result is stored **without reorientation** (the reference forgets to
  invert it);
* the scatter writes all_contacts[i, j] with probability 0.5 when the
  contact is non-NaN; later writes overwrite earlier ones (:235-239);
* per body i, one uniformly-random non-NaN entry of row i is chosen
  (:274-295) and the chosen contacts are resolved sequentially in body
  order, skipping i == j (:310-336).

Two divergences from a literal reference run, both documented in
PARITY.md:

* the reference deduplicates with ``list(set(...))`` (:115-120) whose
  iteration order is a CPython-hash artifact; the replay pins the only
  deterministic reading — first-occurrence order, with (body, part)
  identity;
* a chosen contact between two infinite-mass bodies divides by an
  effective mass of zero in the reference (NaN velocities); the replay's
  impulse math skips k == 0 contacts (the key stream is unaffected).

Geometry is parallax's rotation-correct kernels (the reference's
translation-only Circle/AABB transform bug, _universal_shape.py:39, is
not replicated; see PARITY divergence list).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from parallax_tpu.dynamics.bodies import BodyParams, BodyState
from parallax_tpu.dynamics.impulses import (
    ContactSolverConfig,
    DEFAULT_SOLVER,
    resolve_contact_deltas,
)
from parallax_tpu.geometry.contacts import (
    contact_box_box,
    contact_box_polygon_gjk_epa,
    contact_circle_box,
    contact_circle_circle,
    contact_circle_polygon_gjk_epa,
    contact_polygon_polygon_gjk_epa,
)
from parallax_tpu.geometry.shapes import BOX, CIRCLE, Parts, edge_mask_for

# the reference's _contact_funcs dict keys, in definition order
# (_colliders.py:21-35); membership drives the bucket-key swap rule.
REF_CONTACT_KEYS = (
    ("AABB", "AABB"),
    ("Circle", "Circle"),
    ("Circle", "AABB"),
    ("Polygon", "Polygon"),
    ("AABB", "Polygon"),
    ("Circle", "Polygon"),
    ("Circle", "Polygon4"),
    ("Circle", "Polygon6"),
    ("AABB", "Polygon4"),
    ("AABB", "Polygon6"),
    ("Polygon4", "Polygon4"),
    ("Polygon4", "Polygon6"),
    ("Polygon6", "Polygon6"),
)


def _ref_type(kind: int, nverts: int) -> str:
    """Reference shape class for a part (_convex_shapes.py:197-229
    fixed-arity polygon classes; 4/6 are the arities the reference's
    envs instantiate and the only ones in _contact_funcs)."""
    if kind == CIRCLE:
        return "Circle"
    if kind == BOX:
        return "AABB"
    return {4: "Polygon4", 6: "Polygon6"}.get(nverts, "Polygon")


@dataclasses.dataclass(frozen=True)
class ReplayBucket:
    """One (type1, type2) bucket: independently-deduped sides
    (_colliders.py:109-120)."""

    key_types: tuple  # the _contact_funcs dict key (canonical order)
    side0: tuple  # ((body, part), ...) first-occurrence order
    side1: tuple


@dataclasses.dataclass(frozen=True)
class ReplayPlan:
    n_bodies: int
    buckets: tuple  # tuple[ReplayBucket], dict insertion order


@functools.lru_cache(maxsize=None)
def build_replay_plan(kind: tuple, nverts: tuple, body: tuple, n_bodies: int) -> ReplayPlan:
    """Host-side reconstruction of the reference's trace-time bucketing
    (_colliders.py:86-131): pairs (i, j) with i > j in loop order
    (1,0),(2,0),(2,1),(3,0)...; per pair, parts crossed in body part
    order; bucket key per the swap rule; sides deduped independently."""
    parts_of = [[] for _ in range(n_bodies)]
    for p, b in enumerate(body):
        parts_of[b].append(p)
    sides: dict = {}
    order = []
    for i in range(n_bodies):
        for j in range(n_bodies):
            if i <= j:
                continue
            for pa in parts_of[i]:
                for pb in parts_of[j]:
                    t1 = _ref_type(kind[pa], nverts[pa])
                    t2 = _ref_type(kind[pb], nverts[pb])
                    if (t1, t2) in REF_CONTACT_KEYS:
                        k = (t1, t2)
                    elif (t2, t1) in REF_CONTACT_KEYS:
                        k = (t2, t1)
                    else:
                        # reference RuntimeError (_colliders.py:103-107)
                        raise ValueError(
                            f"illegal shape pair for reference replay: "
                            f"{(t1, t2)} (parts {pa}, {pb})"
                        )
                    if k not in sides:
                        sides[k] = ([], [])
                        order.append(k)
                    sides[k][0].append((i, pa))
                    sides[k][1].append((j, pb))
    buckets = tuple(
        ReplayBucket(
            key_types=k,
            side0=tuple(dict.fromkeys(sides[k][0])),
            side1=tuple(dict.fromkeys(sides[k][1])),
        )
        for k in order
    )
    return ReplayPlan(n_bodies=n_bodies, buckets=buckets)


def replay_key_schedule(rkey, plan: ReplayPlan):
    """The full key tree (docstring diagram), exactly as the reference
    consumes it.  Returns (bernoulli_keys, choice_keys) where
    ``bernoulli_keys[b]`` is a [N2, N1, *key] array of the ``key1`` used
    for each cell's accepted-write Bernoulli draw, and ``choice_keys`` is
    [n_bodies, *key].  Factored out so tests can pin the schedule
    independently of the solve."""
    skey = jax.random.split(rkey)[0]  # _colliders.py:142
    bern = []
    for bucket in plan.buckets:
        skey = jax.random.split(skey)[0]  # :175
        n1, n2 = len(bucket.side0), len(bucket.side1)
        keys2 = jax.random.split(skey, n2)  # :264
        rows = []
        for ind2 in range(n2):
            keys1 = jax.random.split(keys2[ind2], n1)  # :254
            # :222 — key1 of (key1, key2); key2's draw is discarded (:224)
            rows.append(
                jnp.stack([jax.random.split(keys1[ind1])[0] for ind1 in range(n1)])
            )
        bern.append(jnp.stack(rows))
    choice_keys = jax.random.split(skey, plan.n_bodies)  # :295
    return bern, choice_keys


def _cell_contact(wp: Parts, kind: tuple, nverts: tuple, pa: int, pb: int):
    """Reference per-cell contact (_colliders.py:149-164): dispatch on the
    cell's actual types with the membership swap; swapped results are NOT
    reoriented (reference behavior).  Returns (pen, point, valid)."""
    ta = _ref_type(kind[pa], nverts[pa])
    tb = _ref_type(kind[pb], nverts[pb])
    if (ta, tb) not in REF_CONTACT_KEYS:  # :155-157
        pa, pb = pb, pa
        ta, tb = tb, ta

    def circ(p):
        return wp.verts[p, 0], wp.radius[p]

    def box(p):
        return wp.verts[p, 0], wp.verts[p, 1]

    def poly(p):
        return wp.verts[p], jnp.asarray(edge_mask_for(nverts[p], wp.verts.shape[-2]))

    fa = "c" if ta == "Circle" else ("b" if ta == "AABB" else "p")
    fb = "c" if tb == "Circle" else ("b" if tb == "AABB" else "p")
    if (fa, fb) == ("c", "c"):
        out = contact_circle_circle(*circ(pa), *circ(pb))
    elif (fa, fb) == ("b", "b"):
        out = contact_box_box(*box(pa), *box(pb))
    elif (fa, fb) == ("c", "b"):
        out = contact_circle_box(*circ(pa), *box(pb))
    elif (fa, fb) == ("c", "p"):
        out = contact_circle_polygon_gjk_epa(*circ(pa), *poly(pb), 128)  # _contacts.py:163
    elif (fa, fb) == ("b", "p"):
        iters = min(48, 4 + nverts[pb] + 1)  # _contacts.py:271
        out = contact_box_polygon_gjk_epa(*box(pa), *poly(pb), iters)
    else:
        iters = min(48, nverts[pa] + nverts[pb] + 1)  # _contacts.py:295
        out = contact_polygon_polygon_gjk_epa(*poly(pa), *poly(pb), iters)
    return out.penetration, out.point, out.active


def resolve_reference_keyed(
    world_parts: Parts,
    state: BodyState,
    params: BodyParams,
    plan: ReplayPlan,
    key,
    config: ContactSolverConfig = DEFAULT_SOLVER,
) -> BodyState:
    """One keyed-replay contact resolve for a single (unbatched) world.

    Scatter (_colliders.py:208-268) -> per-row choice (:274-295) ->
    sequential resolution (:310-336), consuming keys exactly per
    ``replay_key_schedule``."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = plan.n_bodies
    kind, nverts = world_parts.kind, world_parts.nverts
    dtype = state.pos.dtype
    # all_contacts init (_colliders.py:137-140): pen zeros, point NaN
    pen_t = jnp.zeros((n, n, 2), dtype)
    pt_t = jnp.full((n, n, 2), jnp.nan, dtype)

    bern_keys, choice_keys = replay_key_schedule(key, plan)
    for bucket, keys in zip(plan.buckets, bern_keys):
        n1, n2 = len(bucket.side0), len(bucket.side1)
        for ind2 in range(n2):  # outer scan (:259-267)
            for ind1 in range(n1):  # inner scan (:249-256)
                i, pa = bucket.side0[ind1]
                j, pb = bucket.side1[ind2]
                if i < j:
                    # cond(i < j -> ContactInfo.nan()) (:163): the cell's
                    # keys are consumed positionally but nothing is written
                    continue
                cond1 = jax.random.bernoulli(keys[ind2, ind1], jnp.float32(0.5))
                pen, pt, valid = _cell_contact(world_parts, kind, nverts, pa, pb)
                write = cond1 & valid  # cond1 & g_upd_cond (:235)
                pen_t = pen_t.at[i, j].set(jnp.where(write, pen, pen_t[i, j]))
                pt_t = pt_t.at[i, j].set(jnp.where(write, pt, pt_t[i, j]))

    # per-body uniform choice over non-NaN row entries (:274-295)
    is_bad = jnp.any(jnp.isnan(pt_t), axis=-1)  # [n, n]
    nn_count = jnp.sum(~is_bad, axis=-1)  # [n]
    probs = (~is_bad).astype(jnp.float32) / nn_count[:, None].astype(jnp.float32)

    def choose(k, i, p, cnt):
        return jax.lax.cond(
            cnt == 0,
            lambda: i,
            lambda: jax.random.choice(k, jnp.arange(n), p=p),
        )

    chosen = jax.vmap(choose)(choice_keys, jnp.arange(n), probs, nn_count)

    # sequential resolution in body order (:310-336); velocities only
    ptup = (params.inv_mass, params.inv_inertia, params.elasticity, params.friction)
    vel, omega = state.vel, state.omega
    for i in range(n):
        j = chosen[i]
        pen = pen_t[i, j]
        pt = pt_t[i, j]
        valid = ~jnp.any(jnp.isnan(pt)) & (j != i)  # isnan guard + cond(i == j)
        (dva, dwa), (dvb, dwb), applied = resolve_contact_deltas(
            pen,
            pt,
            valid,
            state.pos[i],
            vel[i],
            omega[i],
            state.pos[j],
            vel[j],
            omega[j],
            tuple(x[i] for x in ptup),
            tuple(x[j] for x in ptup),
            config,
        )
        onej = jax.nn.one_hot(j, n, dtype=dtype)
        new_vel = vel.at[i].add(dva) + onej[:, None] * dvb
        new_omega = omega.at[i].add(dwa) + onej * dwb
        vel = jnp.where(applied, new_vel, vel)
        omega = jnp.where(applied, new_omega, omega)
    return state.replace(vel=vel, omega=omega)
