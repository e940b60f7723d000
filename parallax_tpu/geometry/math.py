"""Core 2D geometry kernels.

Behavioral counterparts of /root/reference/cotix/_geometry_utils.py, written
batched-first: every function accepts arbitrary leading batch axes and is
branchless so it vectorizes on the TPU VPU.

Design divergence from the reference (deliberate, TPU-first): rigid
transforms are carried as ``(position, cos, sin)`` instead of 3x3
homogeneous matrices + ``jnp.linalg.inv``
(cf. _geometry_utils.py:91-142).  The inverse is then free (transpose of a
rotation) and the representation packs into flat f32 lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "fast_normal",
    "perpendicular_vector",
    "cross2",
    "rotate",
    "random_direction",
    "order_clockwise",
    "is_point_in_triangle",
    "angle_between",
    "safe_norm",
    "safe_normalize",
    "Transform2",
]


def safe_norm(v: jnp.ndarray, axis: int = -1, keepdims: bool = False) -> jnp.ndarray:
    """L2 norm with a finite gradient at ``v = 0`` (where it returns 0).

    ``jnp.linalg.norm`` has a NaN reverse-mode gradient at the origin, and
    zero vectors are *routine* here (inactive contact lanes, repeat-padded
    polygon edges, resting joints), so every hot-path norm must use this.
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    zero = sq == 0
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))


def safe_normalize(v: jnp.ndarray, axis: int = -1, fallback=None) -> jnp.ndarray:
    """``v / |v|`` with finite gradients at 0; returns ``fallback`` (or the

    zero vector) where ``|v| = 0``."""
    n = safe_norm(v, axis=axis, keepdims=True)
    zero = n == 0
    out = v / jnp.where(zero, 1.0, n)
    if fallback is not None:
        out = jnp.where(zero, fallback, out)
    return out


def fast_normal(a: jnp.ndarray) -> jnp.ndarray:
    """90° CCW rotation: (x, y) -> (-y, x).

    Matches reference ``fast_normal`` (_geometry_utils.py:30-34); works on
    [..., 2] arrays.
    """
    return jnp.stack([-a[..., 1], a[..., 0]], axis=-1)


# The reference defines an identical second helper (_geometry_utils.py:70-72).
perpendicular_vector = fast_normal


def cross2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Scalar z-component of the 2D cross product, batched over [..., 2]."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def rotate(v: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate [..., 2] vectors by [...] angles (radians), CCW.

    Matches reference ``rotate`` (_geometry_utils.py:81-88).
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def random_direction(key) -> jnp.ndarray:
    """Uniform random unit vector (Gaussian-normalize, like the reference

    _geometry_utils.py:37-46 so seeded draws agree bit-for-bit)."""
    if key is None:
        return jnp.array([1.0, 0.0], dtype=jnp.float32)
    x = jax.random.normal(key, (2,))
    return x / jnp.linalg.norm(x)


def order_clockwise(vertices: jnp.ndarray) -> jnp.ndarray:
    """Order [..., n, 2] vertices by atan2 angle around their centroid.

    Exactly the reference's convention (_geometry_utils.py:60-67):
    ascending ``arctan2`` argsort — so identical vertex layouts are produced
    for identical inputs.
    """
    rel = vertices - jnp.mean(vertices, axis=-2, keepdims=True)
    angles = jnp.arctan2(rel[..., 1], rel[..., 0])
    idx = jnp.argsort(angles, axis=-1)
    return jnp.take_along_axis(vertices, idx[..., None], axis=-2)


def is_point_in_triangle(pt, v1, v2, v3):
    """Sign-of-area containment test; matches _geometry_utils.py:12-27."""

    def sign(p1, p2, p3):
        return (p1[..., 0] - p3[..., 0]) * (p2[..., 1] - p3[..., 1]) - (
            p2[..., 0] - p3[..., 0]
        ) * (p1[..., 1] - p3[..., 1])

    d1 = sign(pt, v1, v2)
    d2 = sign(pt, v2, v3)
    d3 = sign(pt, v3, v1)
    has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
    has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
    return ~(has_neg & has_pos)


def angle_between(v1, v2):
    """Unsigned angle between two vectors (_geometry_utils.py:75-78)."""
    v1u = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v2u = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
    d = jnp.sum(v1u * v2u, axis=-1)
    return jnp.arccos(jnp.clip(d, -1.0, 1.0))


class Transform2(struct.PyTreeNode):
    """Rigid 2D transform stored as (position, cos, sin).

    TPU-native replacement for the reference's ``HomogenuousTransformer``
    (3x3 matrix + linalg.inv, _geometry_utils.py:91-142): same API surface,
    O(1) inverse, flat f32 storage, arbitrary leading batch axes.
    """

    position: jnp.ndarray  # [..., 2]
    cos: jnp.ndarray  # [...]
    sin: jnp.ndarray  # [...]

    @classmethod
    def make(cls, position=None, angle=None) -> "Transform2":
        if position is None:
            position = jnp.zeros(2, dtype=jnp.float32)
        if angle is None:
            angle = jnp.zeros(position.shape[:-1], dtype=position.dtype)
        return cls(position=position, cos=jnp.cos(angle), sin=jnp.sin(angle))

    @classmethod
    def identity(cls, batch_shape=()) -> "Transform2":
        return cls(
            position=jnp.zeros(batch_shape + (2,), dtype=jnp.float32),
            cos=jnp.ones(batch_shape, dtype=jnp.float32),
            sin=jnp.zeros(batch_shape, dtype=jnp.float32),
        )

    def _rot(self, v, inverse=False):
        c, s = self.cos, (-self.sin if inverse else self.sin)
        x, y = v[..., 0], v[..., 1]
        return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)

    def forward_direction(self, d):
        """Direction local -> global (rotation only)."""
        return self._rot(d)

    def inverse_direction(self, d):
        """Direction global -> local."""
        return self._rot(d, inverse=True)

    def forward_vector(self, p):
        """Point local -> global."""
        return self._rot(p) + self.position

    def inverse_vector(self, p):
        """Point global -> local."""
        return self._rot(p - self.position, inverse=True)

    def shift(self):
        return self.position

    @property
    def angle(self):
        return jnp.arctan2(self.sin, self.cos)
