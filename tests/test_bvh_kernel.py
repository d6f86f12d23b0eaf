"""Pallas BVH4 traversal kernel vs the brute-force oracle and the jnp
traversal — the differential strategy of hitable/bvh4_test.go:86-157 applied
to the union-traversal kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from izpi_tpu.geometry import primitives as prim
from izpi_tpu.ops import bvh_kernel
from izpi_tpu.scene import types as st
from izpi_tpu.scene.compiler import compile_scene
from izpi_tpu.scene.library.cornell import cornell_box


def _random_tri_scene(n_tris: int, seed: int, spread: float = 10.0):
    rs = np.random.RandomState(seed)
    base = (rs.rand(n_tris, 1, 3) - 0.5) * 2 * spread
    verts = base + rs.randn(n_tris, 3, 3) * 0.5
    mesh = st.TriangleMesh(
        vertices=verts,
        material=st.Lambertian(albedo=st.ConstantTexture((0.5, 0.5, 0.5))),
    )
    cam = st.Camera(look_from=(0, 0, -30), look_at=(0, 0, 0))
    return st.Scene(world=[mesh], camera=cam)


def _rays_at(cs2, n_rays, seed, spread=12.0):
    rs = np.random.RandomState(seed)
    o = jnp.asarray((rs.rand(n_rays, 3) - 0.5) * 2 * spread, jnp.float32)
    d = jnp.asarray(rs.randn(n_rays, 3), jnp.float32)
    time = jnp.asarray(rs.rand(n_rays), jnp.float32)
    return o, d, time


def _check(scene, n_rays=512, seed=3, spread=12.0):
    cs, _ = compile_scene(scene)
    cs2, inter = bvh_kernel.attach(cs, seed=1, interpret=True)
    o, d, time = _rays_at(cs2, n_rays, seed, spread)
    got = inter(o, d, time, 1e-3, prim.T_MAX)
    want = prim.intersect_brute(cs2.prims, o, d, time, 1e-3, prim.T_MAX)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    hit = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5)
    # the winning primitive may differ only on exact t ties
    gi, wi = np.asarray(got.prim_idx)[hit], np.asarray(want.prim_idx)[hit]
    diff = gi != wi
    if diff.any():
        np.testing.assert_allclose(np.asarray(got.t)[hit][diff],
                                   np.asarray(want.t)[hit][diff], rtol=1e-6)
    return got, want


def test_kernel_vs_brute_random_tris():
    _check(_random_tri_scene(3000, seed=11))


def test_kernel_vs_brute_mixed_kinds_cornell():
    # Cornell: rects + boxes + a sphere — mixed primitive kinds.
    _check(cornell_box(), n_rays=512, seed=5, spread=400.0)


def test_kernel_vs_jnp_traversal():
    from izpi_tpu.accel import traverse

    scene = _random_tri_scene(2048, seed=23)
    cs, _ = compile_scene(scene)
    csa, jnp_inter = traverse.attach(cs, seed=1)
    csb, k_inter = bvh_kernel.attach(cs, seed=1, interpret=True)
    o, d, time = _rays_at(csa, 256, seed=7)
    a = jnp_inter(o, d, time, 1e-3, prim.T_MAX)
    b = k_inter(o, d, time, 1e-3, prim.T_MAX)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hit = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[hit], np.asarray(b.t)[hit],
                               rtol=1e-4, atol=1e-5)


def test_kernel_shrinking_t_window():
    # A second intersect with a small t_max must miss far geometry.
    scene = _random_tri_scene(512, seed=2)
    cs, _ = compile_scene(scene)
    cs2, inter = bvh_kernel.attach(cs, seed=1, interpret=True)
    o, d, time = _rays_at(cs2, 128, seed=9)
    full = inter(o, d, time, 1e-3, prim.T_MAX)
    clipped = inter(o, d, time, 1e-3, 1e-2)
    assert not bool(np.asarray(clipped.hit).any()) or (
        np.asarray(clipped.t)[np.asarray(clipped.hit)] <= 1e-2).all()
    hit = np.asarray(full.hit)
    assert hit.any()


def test_rebin_matches_single_pass():
    """Multi-round treelet re-binned traversal is exact: every accepted hit
    is genuine and a ray only stops once its next treelet's conservative
    entry distance exceeds its best t; the cleanup pass covers stragglers."""
    scene = _random_tri_scene(3000, seed=41)
    cs, _ = compile_scene(scene)
    cs_a, one = bvh_kernel.attach(cs, seed=1, interpret=True, rebin=False)
    cs_b, reb = bvh_kernel.attach(cs, seed=1, interpret=True, rebin=True,
                                  rounds=3)
    o, d, time = _rays_at(cs_a, 4096, seed=19)  # >=2048: binned path
    a = one(o, d, time, 1e-3, prim.T_MAX)
    b = reb(o, d, time, 1e-3, prim.T_MAX)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    h = np.asarray(a.hit)
    assert h.any()
    np.testing.assert_allclose(np.asarray(a.t)[h], np.asarray(b.t)[h],
                               rtol=1e-6)


def test_rebin_matches_brute_mixed_kinds():
    """Re-binned traversal vs brute force on a mixed-kind scene (rects +
    sphere + tris) with interior-origin rays exercising entry==0 bins."""
    from izpi_tpu.scene.library.cornell import cornell_box

    scene = cornell_box()
    cs, _ = compile_scene(scene)
    cs2, reb = bvh_kernel.attach(cs, seed=1, interpret=True, rebin=True,
                                 rounds=2, treelet_target=8)
    rs = np.random.RandomState(13)
    n = 2048
    o = jnp.asarray(rs.rand(n, 3) * 555.0, jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    time = jnp.asarray(rs.rand(n), jnp.float32)
    got = reb(o, d, time, 1e-3, prim.T_MAX)
    want = prim.intersect_brute(cs2.prims, o, d, time, 1e-3, prim.T_MAX)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                               rtol=1e-4, atol=1e-5)


def test_two_pass_matches_single_pass():
    """Treelet-primed two-pass traversal is exact: pass-1 caps are genuine
    hits, pass 2 restores the closest one from the full tree."""
    scene = _random_tri_scene(3000, seed=31)
    cs, _ = compile_scene(scene)
    cs_a, one = bvh_kernel.attach(cs, seed=1, interpret=True)
    cs_b, two = bvh_kernel.attach(cs, seed=1, interpret=True, two_pass=True)
    o, d, time = _rays_at(cs_a, 4096, seed=17)  # >=2048: sorted path
    a = one(o, d, time, 1e-3, prim.T_MAX)
    b = two(o, d, time, 1e-3, prim.T_MAX)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    h = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t)[h], np.asarray(b.t)[h],
                               rtol=1e-6)


def test_itinerary_scheduler_matches_brute():
    """The round-5 itinerary scheduler (precomputed 2-level-hierarchy
    candidates + exact root-walk cleanup) is exact vs brute force on both
    coherent and interior incoherent rays."""
    scene = _random_tri_scene(3000, seed=41)
    cs, _ = compile_scene(scene)
    cs2, inter = bvh_kernel.attach(cs, seed=1, interpret=True, rebin=True,
                                   rounds=3, treelet_target=64,
                                   sched="itin")
    assert inter.itin, "expected the itinerary scheduler to engage"
    o, d, time = _rays_at(cs2, 4096, seed=19)
    got = inter(o, d, time, 1e-3, prim.T_MAX)
    want = prim.intersect_brute(cs2.prims, o, d, time, 1e-3, prim.T_MAX)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    assert h.any()
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.prim_idx)[h],
                                  np.asarray(want.prim_idx)[h])
