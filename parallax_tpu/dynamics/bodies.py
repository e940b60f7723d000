"""Struct-of-arrays rigid-body state.

The TPU-native replacement for the reference's ``list[AnyBody]``
(/root/reference/cotix/_bodies.py:135-186): all dynamic state lives in flat
``[n_bodies, ...]`` arrays (leading batch axes compose via vmap/sharding),
and per-body inertial/material parameters are arrays too — so whole fleets
of worlds step as one fused XLA program.  The reference's own
``DynamicBody``/``lob_to_soa`` (_bodies.py:189-273, _utils.py:10-25) are the
embryonic form of this layout.

Infinite masses are allowed (static bodies); ``inv_mass``/``inv_inertia``
are the preferred quantities in solver code (1/inf == 0 exactly in f32/f64,
so static bodies need no branches).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from parallax_tpu.geometry.math import perpendicular_vector


class BodyState(struct.PyTreeNode):
    """Dynamic per-body state, shape [.., n_bodies, ...]."""

    pos: jnp.ndarray  # [.., n, 2]
    vel: jnp.ndarray  # [.., n, 2]
    angle: jnp.ndarray  # [.., n]
    omega: jnp.ndarray  # [.., n]

    @property
    def n_bodies(self) -> int:
        return self.pos.shape[-2]

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "BodyState":
        return BodyState(
            pos=jnp.zeros((n, 2), dtype),
            vel=jnp.zeros((n, 2), dtype),
            angle=jnp.zeros((n,), dtype),
            omega=jnp.zeros((n,), dtype),
        )

    def velocity_at(self, point, index=None):
        """Rigid-body velocity of a world-frame ``point`` attached to body

        ``index`` (or all bodies when None).  Reference
        AbstractBody.velocity_at (_bodies.py:50-55)."""
        if index is None:
            pos, vel, omega = self.pos, self.vel, self.omega
        else:
            pos, vel, omega = (
                self.pos[..., index, :],
                self.vel[..., index, :],
                self.omega[..., index],
            )
        return vel + perpendicular_vector(point - pos) * omega[..., None]


class BodyParams(struct.PyTreeNode):
    """Inertial & material parameters, shape [.., n_bodies].

    ``mass``/``inertia`` may be ``inf`` (static bodies) exactly like the
    reference's ground/goal bodies (_lunar_lander.py:134-141,
    _robocup.py:52-60)."""

    mass: jnp.ndarray
    inertia: jnp.ndarray
    elasticity: jnp.ndarray
    friction: jnp.ndarray

    @property
    def inv_mass(self):
        return 1.0 / self.mass

    @property
    def inv_inertia(self):
        return 1.0 / self.inertia

    @staticmethod
    def make(mass, inertia, elasticity=None, friction=None) -> "BodyParams":
        mass = jnp.asarray(mass, jnp.float32)
        n = mass.shape[-1]
        if elasticity is None:
            elasticity = jnp.ones((n,), jnp.float32)  # reference AnyBody default
        if friction is None:
            friction = jnp.ones((n,), jnp.float32)
        return BodyParams(
            mass=mass,
            inertia=jnp.asarray(inertia, jnp.float32),
            elasticity=jnp.asarray(elasticity, jnp.float32),
            friction=jnp.asarray(friction, jnp.float32),
        )
