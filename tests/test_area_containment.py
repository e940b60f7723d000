"""General area-body containment: polygon/box contained bodies, box and
convex-polygon areas (reference is_area intent, _robocup.py:88-109 — the
reference marks areas but never implemented their semantics; parallax
generates a push-back-inside contact when a body leaves its area)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.engine.batched import collide_batched, step_batched, _to_soa
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.geometry.shapes import box, circle, polygon

HEX = polygon(
    [(2.0, 0.0), (1.0, 1.7), (-1.0, 1.7), (-2.0, 0.0), (-1.0, -1.7), (1.0, -1.7)]
)
TRI = polygon([(-0.2, -0.2), (0.2, -0.2), (0.0, 0.3)])


def _area_world(contained: BodyDef, area_shape):
    area = BodyDef(
        shapes=[area_shape], mass=np.inf, inertia=np.inf, is_area=True
    )
    return World.build(
        [contained, area], WorldConfig(dt=0.01, gravity=(0.0, 0.0))
    )


def _settles_inside(world, state, inside_fn, n=400):
    @jax.jit
    def run(s):
        def f(s, _):
            s, _c = world.step(s)
            return s, None

        return jax.lax.scan(f, s, None, length=n)[0]

    out = run(state)
    assert np.isfinite(np.asarray(out.pos)).all()
    assert inside_fn(np.asarray(out.pos[0]))
    return out


@pytest.mark.parametrize(
    "shape,kernel",
    [
        ([TRI], "area_pb"),
        ([box((-0.2, -0.2), (0.2, 0.2))], "area_bb"),
        ([circle(0.2)], "area_cb"),
    ],
)
def test_contained_in_box_area(shape, kernel):
    body = BodyDef(
        shapes=shape, mass=1.0, inertia=0.1, position=(0.0, 0.0),
        velocity=(3.0, 0.7), elasticity=0.2, friction=0.1,
    )
    world, state = _area_world(body, box((-1.5, -1.0), (1.5, 1.0)))
    assert [g.kernel for g in world.table.groups] == [kernel]
    _settles_inside(
        world, state, lambda p: -1.8 < p[0] < 1.8 and -1.3 < p[1] < 1.3
    )


@pytest.mark.parametrize(
    "shape,kernel",
    [
        ([circle(0.2)], "area_cp"),
        ([TRI], "area_pp"),
        ([box((-0.2, -0.2), (0.2, 0.2))], "area_bp"),
    ],
)
def test_contained_in_polygon_area(shape, kernel):
    body = BodyDef(
        shapes=shape, mass=1.0, inertia=0.1, position=(0.0, 0.0),
        velocity=(2.5, 1.0), elasticity=0.2, friction=0.1,
    )
    world, state = _area_world(body, HEX)
    assert [g.kernel for g in world.table.groups] == [kernel]
    # stays within the hexagon's circumradius (plus slack for one dt)
    _settles_inside(
        world, state, lambda p: np.linalg.norm(p) < 2.3
    )


def test_escaped_polygon_contact_pushes_back_in():
    """A polygon teleported outside its box area produces a contact whose
    penetration points back toward the interior, anchored at the extreme
    vertex (so the impulse also torques it back)."""
    body = BodyDef(shapes=[TRI], mass=1.0, inertia=0.1, position=(2.0, 0.0))
    world, state = _area_world(body, box((-1.5, -1.0), (1.5, 1.0)))
    c = world.detect_contacts(state)
    act = np.asarray(c.active)
    assert act.sum() == 1
    pen = np.asarray(c.penetration)[act][0]
    assert pen[0] < 0  # push in -x, back toward the box
    # escaped by (2.0 + 0.2) - 1.5 = 0.7 through the +x wall
    assert abs(pen[0] + 0.7) < 1e-5 and abs(pen[1]) < 1e-6
    pt = np.asarray(c.point)[act][0]
    assert abs(pt[0] - 2.2) < 1e-5  # the max-x vertex anchors the contact


def test_area_batched_matches_vmapped():
    """Batch-minor twins of the box-area kernels stay in lockstep with the
    vmapped path (the project's batched==vmapped invariant)."""
    bodies = [
        BodyDef(shapes=[TRI], mass=1.0, inertia=0.1, position=(0.3, 0.1),
                velocity=(2.0, 0.5)),
        BodyDef(shapes=[box((-0.2, -0.15), (0.2, 0.15))], mass=0.8,
                inertia=0.08, position=(-0.4, 0.2), velocity=(-1.5, 1.0)),
        BodyDef(shapes=[circle(0.15)], mass=0.5, inertia=0.04,
                position=(0.0, -0.3), velocity=(1.0, -2.0)),
        BodyDef(shapes=[box((-1.5, -1.0), (1.5, 1.0))], mass=np.inf,
                inertia=np.inf, is_area=True),
    ]
    world, st0 = World.build(bodies, WorldConfig(dt=0.01, gravity=(0.0, 0.0)))
    B = 16
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), st0
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    mv = jnp.isfinite(world.params.mass)
    batched = batched.replace(
        pos=batched.pos + jax.random.normal(k1, (B, world.n_bodies, 2)) * 0.8 * mv[:, None],
        vel=batched.vel + jax.random.normal(k2, (B, world.n_bodies, 2)) * 2.0 * mv[:, None],
    )
    cv = jax.jit(jax.vmap(world.detect_contacts))(batched)
    cb = jax.jit(lambda st: collide_batched(world, _to_soa(st)))(batched)
    act_v = np.asarray(cv.active)
    act_b = np.asarray(cb.active).T
    assert act_v.any()  # the jittered fleet actually exercises the kernels
    assert (act_v == act_b).all()
    both = act_v & act_b
    pen_b = np.stack([np.asarray(cb.pen_x).T, np.asarray(cb.pen_y).T], -1)
    pt_b = np.stack([np.asarray(cb.pt_x).T, np.asarray(cb.pt_y).T], -1)
    assert np.abs(np.asarray(cv.penetration) - pen_b)[both].max() < 1e-5
    assert np.abs(np.asarray(cv.point) - pt_b)[both].max() < 1e-5

    a = jax.jit(jax.vmap(lambda s: world.step(s)[0]))(batched)
    b = jax.jit(lambda st: step_batched(world, st)[0])(batched)
    assert np.abs(np.asarray(a.pos) - np.asarray(b.pos)).max() < 1e-5
    assert np.abs(np.asarray(a.vel) - np.asarray(b.vel)).max() < 1e-4


def test_polygon_area_batched_matches_vmapped():
    """Batch-minor twins of the polygon-area kernels (area_cp/area_pp/
    area_bp) stay in lockstep with the vmapped path."""
    bodies = [
        BodyDef(shapes=[TRI], mass=1.0, inertia=0.1, position=(0.3, 0.1),
                velocity=(2.0, 0.5)),
        BodyDef(shapes=[box((-0.2, -0.15), (0.2, 0.15))], mass=0.8,
                inertia=0.08, position=(-0.4, 0.2), velocity=(-1.5, 1.0)),
        BodyDef(shapes=[circle(0.15)], mass=0.5, inertia=0.04,
                position=(0.0, -0.3), velocity=(1.0, -2.0)),
        BodyDef(shapes=[HEX], mass=np.inf, inertia=np.inf, is_area=True),
    ]
    world, st0 = World.build(bodies, WorldConfig(dt=0.01, gravity=(0.0, 0.0)))
    assert {"area_cp", "area_pp", "area_bp"} <= {
        g.kernel for g in world.table.groups
    }
    B = 16
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), st0
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    mv = jnp.isfinite(world.params.mass)
    batched = batched.replace(
        pos=batched.pos + jax.random.normal(k1, (B, world.n_bodies, 2)) * 1.3 * mv[:, None],
        vel=batched.vel + jax.random.normal(k2, (B, world.n_bodies, 2)) * 2.0 * mv[:, None],
    )
    cv = jax.jit(jax.vmap(world.detect_contacts))(batched)
    cb = jax.jit(lambda st: collide_batched(world, _to_soa(st)))(batched)
    act_v = np.asarray(cv.active)
    act_b = np.asarray(cb.active).T
    assert act_v.any()  # the jittered fleet actually escapes the hexagon
    assert (act_v == act_b).all()
    both = act_v & act_b
    pen_b = np.stack([np.asarray(cb.pen_x).T, np.asarray(cb.pen_y).T], -1)
    pt_b = np.stack([np.asarray(cb.pt_x).T, np.asarray(cb.pt_y).T], -1)
    assert np.abs(np.asarray(cv.penetration) - pen_b)[both].max() < 1e-5
    assert np.abs(np.asarray(cv.point) - pt_b)[both].max() < 1e-5

    a = jax.jit(jax.vmap(lambda s: world.step(s)[0]))(batched)
    b = jax.jit(lambda st: step_batched(world, st)[0])(batched)
    assert np.abs(np.asarray(a.pos) - np.asarray(b.pos)).max() < 1e-5
    assert np.abs(np.asarray(a.vel) - np.asarray(b.vel)).max() < 1e-4
