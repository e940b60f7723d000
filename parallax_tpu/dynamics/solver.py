"""Contact solvers over fixed-shape contact buffers.

The reference's ``RandomizedCollider`` resolves one randomly-chosen contact
per body per step with a sequential scan
(/root/reference/cotix/_colliders.py:274-336) — a policy chosen to bound
cost and avoid livelock.  On TPU the cost argument inverts: all contacts
are already materialized in a fixed [C]-shaped buffer, so parallax defaults
to deterministic iterative solving and keeps the randomized policy as a
compatibility mode:

* ``jacobi``       — K sweeps; every contact computes its impulse against
                     the current velocities, deltas are scatter-added per
                     body (fully parallel over worlds AND contacts).
* ``gauss_seidel`` — K sequential sweeps over the contact buffer (order =
                     buffer order); better convergence, serial in C.
* ``random_one_per_body`` — reference semantics: each body picks one random
                     active contact involving it, then bodies are resolved
                     sequentially in index order (_colliders.py:274-336).

All modes use the reference impulse math from ``dynamics.impulses``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.dynamics.bodies import BodyParams, BodyState
from parallax_tpu.dynamics.impulses import (
    ContactSolverConfig,
    DEFAULT_SOLVER,
    resolve_contact_deltas,
)
from parallax_tpu.geometry.contacts import Contact


def _gather_params(params: BodyParams, idx):
    return (
        params.inv_mass[..., idx],
        params.inv_inertia[..., idx],
        params.elasticity[..., idx],
        params.friction[..., idx],
    )


def resolve_contacts(
    state: BodyState,
    params: BodyParams,
    contacts: Contact,
    body_a: np.ndarray,
    body_b: np.ndarray,
    mode: str = "jacobi",
    iterations: int = 4,
    relaxation: float = 1.0,
    key=None,
    config: ContactSolverConfig = DEFAULT_SOLVER,
) -> BodyState:
    """Apply contact impulses; returns state with updated vel/omega.

    ``contacts`` holds [.., C] contact lanes; ``body_a``/``body_b`` are
    static int vectors of length C mapping lanes to bodies.
    """
    if len(body_a) == 0:
        return state
    ia = jnp.asarray(body_a)
    ib = jnp.asarray(body_b)

    if mode == "jacobi":
        n = state.pos.shape[-2]
        for _ in range(iterations):
            (dva, dwa), (dvb, dwb), _ = resolve_contact_deltas(
                contacts.penetration,
                contacts.point,
                contacts.active,
                state.pos[..., ia, :],
                state.vel[..., ia, :],
                state.omega[..., ia],
                state.pos[..., ib, :],
                state.vel[..., ib, :],
                state.omega[..., ib],
                _gather_params(params, ia),
                _gather_params(params, ib),
                config,
            )
            r = relaxation * contacts.weight
            dva = dva * r[..., None]
            dvb = dvb * r[..., None]
            dwa = dwa * r
            dwb = dwb * r
            dvel = jax.ops.segment_sum(
                jnp.moveaxis(dva, -2, 0), ia, num_segments=n
            ) + jax.ops.segment_sum(jnp.moveaxis(dvb, -2, 0), ib, num_segments=n)
            domega = jax.ops.segment_sum(
                jnp.moveaxis(dwa, -1, 0), ia, num_segments=n
            ) + jax.ops.segment_sum(jnp.moveaxis(dwb, -1, 0), ib, num_segments=n)
            state = state.replace(
                vel=state.vel + jnp.moveaxis(dvel, 0, -2),
                omega=state.omega + jnp.moveaxis(domega, 0, -1),
            )
        return state

    if mode == "gauss_seidel":
        def body_fn(carry, c):
            vel, omega = carry
            pen, point, active, w, a, b = c
            (dva, dwa), (dvb, dwb), _ = resolve_contact_deltas(
                pen,
                point,
                active,
                jnp.take(state.pos, a, axis=-2),
                jnp.take(vel, a, axis=-2),
                jnp.take(omega, a, axis=-1),
                jnp.take(state.pos, b, axis=-2),
                jnp.take(vel, b, axis=-2),
                jnp.take(omega, b, axis=-1),
                _gather_params(params, a),
                _gather_params(params, b),
                config,
            )
            vel = vel.at[..., a, :].add(dva * w).at[..., b, :].add(dvb * w)
            omega = omega.at[..., a].add(dwa * w).at[..., b].add(dwb * w)
            return (vel, omega), None

        # move the contact axis to the front for scanning
        pen = jnp.moveaxis(contacts.penetration, -2, 0)
        point = jnp.moveaxis(contacts.point, -2, 0)
        active = jnp.moveaxis(contacts.active, -1, 0)
        weight = jnp.moveaxis(contacts.weight, -1, 0)
        vel, omega = state.vel, state.omega
        for _ in range(iterations):
            (vel, omega), _ = jax.lax.scan(
                body_fn, (vel, omega), (pen, point, active, weight, ia, ib)
            )
        return state.replace(vel=vel, omega=omega)

    if mode == "random_one_per_body":
        return _resolve_random_one_per_body(
            state, params, contacts, body_a, body_b, key, config
        )

    raise ValueError(f"unknown solver mode {mode!r}")


def _resolve_random_one_per_body(
    state: BodyState,
    params: BodyParams,
    contacts: Contact,
    body_a: np.ndarray,
    body_b: np.ndarray,
    key,
    config: ContactSolverConfig,
) -> BodyState:
    """Reference RandomizedCollider policy (_colliders.py:274-336).

    For each body i: uniformly choose one active contact involving i (if
    any), then resolve the chosen contacts sequentially in body order,
    orienting each contact so that body i is "body1".
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = state.pos.shape[-2]
    C = len(body_a)
    # static membership: does lane c involve body i (and which side)?
    mem_a = np.zeros((n, C), dtype=bool)
    mem_b = np.zeros((n, C), dtype=bool)
    for c in range(C):
        mem_a[body_a[c], c] = True
        mem_b[body_b[c], c] = True
    mem = jnp.asarray(mem_a | mem_b)  # [n, C]
    mem_a = jnp.asarray(mem_a)

    active = contacts.active  # [.., C]
    cand = mem & active[..., None, :]  # [.., n, C]
    logits = jnp.where(cand, 0.0, -jnp.inf)
    keys = jax.random.split(key, n)
    # per-body categorical choice (uniform over active candidates)
    choice = jax.vmap(lambda k, lg: jax.random.categorical(k, lg), in_axes=(0, -2), out_axes=-1)(
        keys, logits
    )  # [.., n]
    has_any = jnp.any(cand, axis=-1)  # [.., n]

    def body_fn(carry, i):
        vel, omega = carry
        c = jnp.take(choice, i, axis=-1)  # chosen lane for body i
        pen = jnp.take_along_axis(
            contacts.penetration, c[..., None, None], axis=-2
        )[..., 0, :]
        point = jnp.take_along_axis(contacts.point, c[..., None, None], axis=-2)[
            ..., 0, :
        ]
        act = jnp.take_along_axis(contacts.active, c[..., None], axis=-1)[..., 0]
        act = act & jnp.take(has_any, i, axis=-1)
        i_is_a = mem_a[i, c]
        a_idx = jnp.asarray(body_a)[c]
        b_idx = jnp.asarray(body_b)[c]
        # orient so body1 == i
        j_idx = jnp.where(i_is_a, b_idx, a_idx)
        pen = jnp.where(i_is_a[..., None], pen, -pen)

        (dva, dwa), (dvb, dwb), _ = resolve_contact_deltas(
            pen,
            point,
            act,
            jnp.take(state.pos, i, axis=-2),
            jnp.take(vel, i, axis=-2),
            jnp.take(omega, i, axis=-1),
            _take2(state.pos, j_idx),
            _take2(vel, j_idx),
            _take1(omega, j_idx),
            tuple(x[..., i] for x in _params_tuple(params)),
            tuple(_take1(x, j_idx) for x in _params_tuple(params)),
            config,
        )
        vel = vel.at[..., i, :].add(dva)
        omega = omega.at[..., i].add(dwa)
        vel = _add_at2(vel, j_idx, dvb)
        omega = _add_at1(omega, j_idx, dwb)
        return (vel, omega), None

    (vel, omega), _ = jax.lax.scan(
        body_fn, (state.vel, state.omega), jnp.arange(n)
    )
    return state.replace(vel=vel, omega=omega)


def _params_tuple(params: BodyParams):
    return (params.inv_mass, params.inv_inertia, params.elasticity, params.friction)


def _take2(x, idx):
    """x [.., n, 2] gathered at per-batch idx [..] -> [.., 2]."""
    return jnp.take_along_axis(x, idx[..., None, None], axis=-2)[..., 0, :]


def _take1(x, idx):
    return jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0]


def _add_at2(x, idx, v):
    """x[.., idx, :] += v for a per-batch dynamic index (one-hot scatter-add)."""
    n = x.shape[-2]
    onehot = jax.nn.one_hot(idx, n, dtype=x.dtype)  # [.., n]
    return x + onehot[..., None] * v[..., None, :]


def _add_at1(x, idx, v):
    n = x.shape[-1]
    onehot = jax.nn.one_hot(idx, n, dtype=x.dtype)
    return x + onehot * v[..., None]
