"""Geometry/intersection tests — directed cases mirroring the reference's
triangle/sphere tests (hitable/triangle_test.go) plus SoA-specific checks."""

import numpy as np
import jax.numpy as jnp

from izpi_tpu.geometry import primitives as prim
from izpi_tpu.scene import types as st
from izpi_tpu.scene.compiler import compile_scene


def _single_tri_scene(mat=None):
    mat = mat or st.Lambertian(albedo=st.ConstantTexture((0.5, 0.5, 0.5)))
    return st.Scene(
        world=[st.Triangle((0, 0, 0), (1, 0, 0), (0, 1, 0), mat)],
        camera=st.Camera(look_from=(0, 0, -1), look_at=(0, 0, 0), aspect=1.0),
    )


def test_triangle_hit_and_miss():
    cs, _ = compile_scene(_single_tri_scene())
    o = jnp.asarray([[0.2, 0.2, -1.0], [0.9, 0.9, -1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    t = jnp.zeros(2, jnp.float32)
    h = prim.intersect_brute(cs.prims, o, d, t, 1e-3, prim.T_MAX)
    hit = np.asarray(h.hit)
    assert hit[0] and not hit[1]
    assert abs(float(h.t[0]) - 1.0) < 1e-5
    # geometric normal (0,0,1) for CCW (e1=+x, e2=+y)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)


def test_sphere_hit_normal_flip_quirk():
    mat = st.Lambertian(albedo=st.ConstantTexture((1, 1, 1)))
    sc = st.Scene(
        world=[st.Sphere((0, 0, 0), (0, 0, 0), 0, 1, 1.0, mat)],
        camera=st.Camera(look_from=(0, 0, -3), look_at=(0, 0, 0)),
    )
    cs, _ = compile_scene(sc)
    # Ray from outside: near root at t=2, outward normal faces the ray.
    o = jnp.asarray([[0.0, 0.0, -3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h = prim.intersect_brute(cs.prims, o, d, jnp.zeros(1), 1e-3, prim.T_MAX)
    assert bool(h.hit[0])
    assert abs(float(h.t[0]) - 2.0) < 1e-5
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-5)
    # Ray from inside: far root; reference leaves the record normal
    # unflipped (outward) on the far root (sphere.go:88-99).
    o2 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    h2 = prim.intersect_brute(cs.prims, o2, d, jnp.zeros(1), 1e-3, prim.T_MAX)
    assert bool(h2.hit[0]) and abs(float(h2.t[0]) - 1.0) < 1e-5
    np.testing.assert_allclose(np.asarray(h2.normal[0]), [0, 0, 1], atol=1e-5)


def test_rect_hit_uv_and_flip():
    mat = st.Lambertian(albedo=st.ConstantTexture((1, 1, 1)))
    sc = st.Scene(
        world=[st.FlipNormals(st.XZRect(0, 2, 0, 4, 1.0, mat))],
        camera=st.Camera(look_from=(0, 3, 0), look_at=(0, 0, 0)),
    )
    cs, _ = compile_scene(sc)
    o = jnp.asarray([[0.5, 2.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    h = prim.intersect_brute(cs.prims, o, d, jnp.zeros(1), 1e-3, prim.T_MAX)
    assert bool(h.hit[0])
    assert abs(float(h.t[0]) - 1.0) < 1e-5
    assert abs(float(h.u[0]) - 0.25) < 1e-5  # (x-x0)/(x1-x0) = 0.5/2
    assert abs(float(h.v[0]) - 0.25) < 1e-5  # (z-z0)/(z1-z0) = 1/4
    # FlipNormals: XZRect normal (0,1,0) flipped to (0,-1,0).
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, -1, 0], atol=1e-6)


def test_closest_hit_insertion_order_ties():
    mat = st.Lambertian(albedo=st.ConstantTexture((1, 1, 1)))
    # Two identical rects; HitableSlice keeps the first on a tie
    # (strict < scan, hitable_slice.go:30-45).
    sc = st.Scene(
        world=[st.XZRect(0, 1, 0, 1, 1.0, mat), st.XZRect(0, 1, 0, 1, 1.0, mat)],
        camera=st.Camera(look_from=(0, 2, 0), look_at=(0, 0, 0)),
    )
    cs, _ = compile_scene(sc)
    o = jnp.asarray([[0.5, 2.0, 0.5]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    h = prim.intersect_brute(cs.prims, o, d, jnp.zeros(1), 1e-3, prim.T_MAX)
    assert int(h.prim_idx[0]) == 0


def test_translate_rotate_bake_matches_reference_transform():
    # A unit box rotated 90° about Y then translated: its +X face should end
    # up where the reference's ray-space transform would put it.
    mat = st.Lambertian(albedo=st.ConstantTexture((1, 1, 1)))
    sc = st.Scene(
        world=[st.Translate(st.RotateY(st.Box((0, 0, 0), (1, 1, 1), mat), 90.0), (5, 0, 0))],
        camera=st.Camera(look_from=(0, 0, -3), look_at=(0, 0, 0)),
    )
    cs, _ = compile_scene(sc)
    # rotate_y object→world: x' = c·x + s·z = z ; z' = -s·x + c·z = -x.
    # Box [0,1]³ → x'∈[0,1], z'∈[-1,0]; translated → x∈[5,6], z∈[-1,0].
    o = jnp.asarray([[5.5, 0.5, -3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h = prim.intersect_brute(cs.prims, o, d, jnp.zeros(1), 1e-3, prim.T_MAX)
    assert bool(h.hit[0])
    assert abs(float(h.t[0]) - 2.0) < 1e-4  # front face at z=-1


def test_moving_sphere_center_lerp():
    mat = st.Lambertian(albedo=st.ConstantTexture((1, 1, 1)))
    sc = st.Scene(
        world=[st.Sphere((0, 0, 0), (2, 0, 0), 0, 1, 0.5, mat)],
        camera=st.Camera(look_from=(0, 0, -3), look_at=(0, 0, 0)),
    )
    cs, _ = compile_scene(sc)
    o = jnp.asarray([[2.0, 0.0, -3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h0 = prim.intersect_brute(cs.prims, o, d, jnp.zeros(1), 1e-3, prim.T_MAX)
    h1 = prim.intersect_brute(cs.prims, o, d, jnp.ones(1), 1e-3, prim.T_MAX)
    assert not bool(h0.hit[0])  # at t=0 sphere is at origin
    assert bool(h1.hit[0])      # at t=1 sphere is at (2,0,0)


def test_unrolled_intersector_matches_brute():
    """make_unrolled_intersector (gather-free small-scene path) must agree
    with intersect_brute + finalize_hit on a mixed-kind scene including a
    moving sphere, a flipped rect, and a vn-interpolated triangle."""
    rs = np.random.RandomState(5)
    world = [
        st.Sphere((0, 0, -3), (0, 1, -3), 0.0, 1.0, 1.0,
                  st.Lambertian(st.ConstantTexture((0.5, 0.5, 0.5)))),
        st.Sphere((2, 0, -4), (2, 0, -4), 0, 1, 1.2,
                  st.Metal((0.9, 0.9, 0.9), fuzz=0.1)),
        st.FlipNormals(st.XZRect(-5, 5, -8, 2, -1.5,
                       st.Lambertian(st.ConstantTexture((0.2, 0.7, 0.2))))),
        st.Triangle((-2, -1, -2), (-1, 1.5, -3), (-3, 0.2, -4),
                    st.Lambertian(st.ConstantTexture((0.8, 0.2, 0.2))),
                    uv0=(0, 0), uv1=(1, 0), uv2=(0, 1),
                    vn0=(0, 0, 1), vn1=(0.5, 0.5, 0.707), vn2=(1, 0, 0)),
    ]
    scene = st.Scene(world=world,
                     camera=st.Camera(look_from=(0, 0, 5), look_at=(0, 0, -3)))
    cs, meta = compile_scene(scene)

    n = 512
    o = jnp.asarray(rs.randn(n, 3) * 2 + np.array([0, 0, 3]), jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    tm = jnp.asarray(rs.rand(n), jnp.float32)

    ref = prim.intersect_brute(cs.prims, o, d, tm, 1e-3, prim.T_MAX)
    fast = prim.make_unrolled_intersector(cs.prims)(o, d, tm, 1e-3,
                                                    prim.T_MAX)

    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(fast.hit))
    np.testing.assert_array_equal(np.asarray(ref.prim_idx),
                                  np.asarray(fast.prim_idx))
    np.testing.assert_array_equal(np.asarray(ref.mat_id),
                                  np.asarray(fast.mat_id))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(ref.t)[h], np.asarray(fast.t)[h],
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ref.u)[h], np.asarray(fast.u)[h],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.v)[h], np.asarray(fast.v)[h],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.normal)[h],
                               np.asarray(fast.normal)[h],
                               rtol=2e-5, atol=2e-5)
