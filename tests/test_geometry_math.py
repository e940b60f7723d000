"""Foundation geometry tests.

Mirrors the semantics of the reference's test_geometry_utils.py (permutation
invariance of order_clockwise) and adds transform round-trip and batched
checks the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.geometry import (
    Transform2,
    cross2,
    fast_normal,
    is_point_in_triangle,
    order_clockwise,
    rotate,
)


def test_fast_normal_perpendicular():
    v = jnp.array([[1.0, 2.0], [-3.0, 0.5], [0.0, 1.0]])
    n = fast_normal(v)
    assert np.allclose(jnp.sum(v * n, axis=-1), 0.0)
    # CCW convention: cross(v, n) > 0
    assert np.all(np.asarray(cross2(v, n)) > 0)


def test_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (16, 2))
    ang = jax.random.uniform(jax.random.PRNGKey(1), (16,), minval=-6, maxval=6)
    got = rotate(v, ang)
    c, s = np.cos(ang), np.sin(ang)
    want = np.stack([c * v[:, 0] - s * v[:, 1], s * v[:, 0] + c * v[:, 1]], axis=-1)
    assert np.allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_order_clockwise_permutation_invariant(seed):
    # Reference semantics: output independent of input vertex order
    # (test_geometry_utils.py:7-21 in the reference test tree).
    key = jax.random.PRNGKey(seed)
    verts = jax.random.normal(key, (6, 2))
    base = order_clockwise(verts)
    for i in range(10):
        perm = jax.random.permutation(jax.random.PRNGKey(100 + i), 6)
        shuffled = verts[perm]
        assert np.allclose(order_clockwise(shuffled), base, atol=1e-6)


def test_order_clockwise_batched():
    key = jax.random.PRNGKey(2)
    verts = jax.random.normal(key, (8, 5, 2))
    batched = order_clockwise(verts)
    for i in range(8):
        assert np.allclose(batched[i], order_clockwise(verts[i]))


def test_point_in_triangle():
    v1, v2, v3 = jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0])
    assert bool(is_point_in_triangle(jnp.array([0.2, 0.2]), v1, v2, v3))
    assert not bool(is_point_in_triangle(jnp.array([0.8, 0.8]), v1, v2, v3))
    # boundary counts as inside (matches reference's sign convention)
    assert bool(is_point_in_triangle(jnp.array([0.5, 0.0]), v1, v2, v3))


def test_transform2_round_trip():
    t = Transform2.make(position=jnp.array([1.5, -2.0]), angle=jnp.array(0.7))
    p = jnp.array([[0.3, 0.4], [-1.0, 2.0]])
    assert np.allclose(t.inverse_vector(t.forward_vector(p)), p, atol=1e-5)
    d = jnp.array([[1.0, 0.0], [0.0, -1.0]])
    assert np.allclose(t.inverse_direction(t.forward_direction(d)), d, atol=1e-6)
    # directions ignore translation
    assert np.allclose(
        t.forward_direction(d),
        rotate(d, jnp.array(0.7)),
        atol=1e-6,
    )


def test_transform2_batched():
    pos = jnp.arange(8.0).reshape(4, 2)
    ang = jnp.linspace(0, 3, 4)
    t = Transform2.make(position=pos, angle=ang)
    p = jnp.ones((4, 2))
    out = t.forward_vector(p)
    for i in range(4):
        ti = Transform2.make(position=pos[i], angle=ang[i])
        assert np.allclose(out[i], ti.forward_vector(p[i]), atol=1e-6)


def test_transform2_jit_grad():
    def loss(angle):
        t = Transform2.make(position=jnp.zeros(2), angle=angle)
        return jnp.sum(t.forward_vector(jnp.array([1.0, 0.0])) ** 2)

    g = jax.jit(jax.grad(loss))(jnp.array(0.3))
    assert np.isfinite(np.asarray(g))


def test_parts_extents_and_centers():
    from parallax_tpu.geometry.shapes import Parts, box, circle, polygon

    p = Parts.from_specs(
        [circle(0.5, (1.0, 2.0)), box((-1.0, -2.0), (3.0, 4.0)),
         polygon([(0.0, 0.0), (2.0, 0.0), (1.0, 3.0)])],
        [0, 1, 2],
    )
    lo, hi = p.extents()
    np.testing.assert_allclose(np.asarray(lo),
                               [[0.5, 1.5], [-1.0, -2.0], [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(hi),
                               [[1.5, 2.5], [3.0, 4.0], [2.0, 3.0]])
    # get_center = AABB midpoint (reference _abstract_shapes.py:43)
    np.testing.assert_allclose(np.asarray(p.centers()),
                               [[1.0, 2.0], [1.0, 1.0], [1.0, 1.5]])
