"""Composite (UniversalShape) queries — mirrors the reference's
test_shapes.py idiom (support ≡ raw support over random directions, exact
multi-part supports) plus collision/penetration round-trips and the
rotation-correctness divergence (SURVEY §2.4 bug 2 NOT reproduced)."""

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.geometry.composite import (
    collides_with,
    penetrates_with,
    possibly_collides_with,
    support,
)
from parallax_tpu.geometry.shapes import (
    Parts,
    box,
    circle,
    polygon,
    support_circle,
    support_polygon,
)


def _dirs(n=100, seed=0):
    th = jax.random.uniform(jax.random.PRNGKey(seed), (n,)) * 2 * np.pi
    return jnp.stack([jnp.cos(th), jnp.sin(th)], -1)


def test_single_part_support_equals_raw():
    """Composite support of a 1-part shape ≡ the raw part support
    (reference test_shapes.py:8-16, 100 random directions)."""
    p = Parts.from_specs([circle(0.7, (0.3, -0.2))], [0])
    for d in np.asarray(_dirs()):
        d = jnp.asarray(d)
        got = support(p, d)
        want = support_circle(p.verts[0, 0], p.radius[0], d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_multi_part_support_exact():
    """Two separated circles: the support must come from the part farther
    along the query direction (reference test_shapes.py:19-35)."""
    p = Parts.from_specs([circle(0.5, (-2.0, 0.0)), circle(0.5, (2.0, 0.0))], [0, 0])
    s_right = np.asarray(support(p, jnp.asarray([1.0, 0.0])))
    s_left = np.asarray(support(p, jnp.asarray([-1.0, 0.0])))
    np.testing.assert_allclose(s_right, [2.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(s_left, [-2.5, 0.0], atol=1e-6)


def test_support_is_maximal_over_parts():
    """dot(support, d) >= dot(any part vertex, d) for a mixed composite."""
    p = Parts.from_specs(
        [polygon([(0.0, 0.0), (1.0, 0.0), (0.5, 1.0)]), box((-2.0, -1.0), (-1.0, 1.0)),
         circle(0.3, (0.0, 2.0))],
        [0, 0, 0],
    )
    for d in np.asarray(_dirs(50, seed=3)):
        d = jnp.asarray(d)
        s = float(jnp.sum(support(p, d) * d))
        for i in range(p.n_parts):
            for v in np.asarray(p.verts[i]):
                assert s >= float(np.dot(v, d)) - 1e-5


def test_collides_and_penetrates_roundtrip():
    """Two-circle composites: collision detected iff overlapping, and
    translating A by the penetration vector separates them
    (the reference's own resolution invariant, test_collisions.py:95-101)."""
    a = Parts.from_specs([circle(0.5, (0.0, 0.0)), circle(0.5, (1.5, 0.0))], [0, 0])
    b_hit = Parts.from_specs([circle(0.5, (2.2, 0.0))], [0])
    b_miss = Parts.from_specs([circle(0.5, (4.0, 0.0))], [0])

    assert bool(collides_with(a, b_hit))
    assert not bool(collides_with(a, b_miss))

    hit, pen = penetrates_with(a, b_hit)
    assert bool(hit)
    depth = float(np.linalg.norm(np.asarray(pen)))
    assert abs(depth - 0.3) < 0.02  # circles at distance 0.7, radii sum 1.0
    # resolution: move A by pen -> gap (within EPA tolerance)
    moved = a.replace(verts=a.verts + jnp.asarray(pen))
    still, pen2 = penetrates_with(moved, b_hit)
    assert float(np.linalg.norm(np.asarray(pen2))) < 0.03


def test_collides_with_rich_return():
    """details=True names the colliding part pair and hands back a GJK
    simplex EPA can consume (reference _universal_shape.py:87-107)."""
    from parallax_tpu.geometry.epa import epa
    from parallax_tpu.geometry.gjk import gjk  # noqa: F401 (simplex shape doc)

    a = Parts.from_specs([circle(0.5, (0.0, 0.0)), circle(0.5, (1.5, 0.0))], [0, 0])
    b = Parts.from_specs([circle(0.5, (2.2, 0.0))], [0])

    hit, (simplex, pa, pb) = collides_with(a, b, details=True)
    assert bool(hit)
    assert int(pa) == 1 and int(pb) == 0  # only A's second circle touches B
    # the returned simplex seeds EPA for the named pair
    from parallax_tpu.geometry.composite import _part_geom, _sup

    ka, ga = _part_geom(a, 1)
    kb, gb = _part_geom(b, 0)
    pen = epa(_sup(ka), ga, _sup(kb), gb, simplex, 48)
    assert abs(float(np.linalg.norm(np.asarray(pen))) - 0.3) < 0.02

    miss, (_, pa2, pb2) = collides_with(
        a, Parts.from_specs([circle(0.5, (4.0, 0.0))], [0]), details=True
    )
    assert not bool(miss) and int(pa2) == -1 and int(pb2) == -1


def test_possibly_collides_broad_phase():
    a = Parts.from_specs([box((-1.0, -1.0), (1.0, 1.0))], [0])
    near = Parts.from_specs([circle(0.5, (1.4, 0.0))], [0])
    far = Parts.from_specs([circle(0.5, (9.0, 0.0))], [0])
    assert bool(possibly_collides_with(a, near))
    assert not bool(possibly_collides_with(a, far))
    assert bool(possibly_collides_with(a, far, margin=10.0))


def test_rotated_composite_support_correct():
    """The divergence from reference bug _universal_shape.py:39: after a
    90° world transform the support must track the rotated geometry."""
    p = Parts.from_specs([polygon([(1.0, -0.1), (1.2, -0.1), (1.2, 0.1), (1.0, 0.1)])], [0])
    w = p.to_world(jnp.asarray([[0.0, 0.0]]), jnp.asarray([0.0]), jnp.asarray([1.0]))
    s = np.asarray(support(w, jnp.asarray([0.0, 1.0])))
    # the slab at x∈[1,1.2] rotates onto y∈[1,1.2]
    assert abs(s[1] - 1.2) < 1e-5
    assert bool(collides_with(w, Parts.from_specs([circle(0.2, (0.0, 1.2))], [0])))
    assert not bool(collides_with(w, Parts.from_specs([circle(0.15, (1.1, 0.0))], [0])))
