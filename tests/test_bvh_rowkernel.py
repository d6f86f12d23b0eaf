"""Differential tests for the per-row-stack Pallas traversal
(ops.bvh_rowkernel) — the round-5 dragon path.

Mirrors the reference's BVH4-vs-BVH2 differential strategy
(internal/hitable/bvh4_test.go:86-157): the kernel (interpret mode on the
CPU mesh) must agree with brute force on hit/idx/t for coherent camera rays
AND incoherent interior rays. The kernel's traversal is exact per 128-lane
row (no unions beyond the row), so agreement is equality, not tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from izpi_tpu import camera as camera_mod
from izpi_tpu.geometry import primitives as prim
from izpi_tpu.ops import bvh_rowkernel
from izpi_tpu.scene.compiler import compile_scene
from izpi_tpu.scene.library import get_scene


@pytest.fixture(scope="module")
def cornell_row():
    scene = get_scene("cornell_box", aspect=1.0)
    cs, meta = compile_scene(scene)
    cs2, inter = bvh_rowkernel.attach(cs, seed=1, interpret=True)
    return cs2, inter


def _check(cs, inter, o, d, tm):
    hk = inter(o, d, tm, 1e-3, prim.T_MAX)
    hb = prim.intersect_brute(cs.prims, o, d, tm, 1e-3, prim.T_MAX)
    np.testing.assert_array_equal(np.asarray(hk.hit), np.asarray(hb.hit))
    m = np.asarray(hk.hit)
    np.testing.assert_array_equal(np.asarray(hk.prim_idx)[m],
                                  np.asarray(hb.prim_idx)[m])
    np.testing.assert_allclose(np.asarray(hk.t)[m], np.asarray(hb.t)[m],
                               rtol=1e-5, atol=1e-5)


def test_camera_rays_match_brute(cornell_row):
    cs, inter = cornell_row
    n = 1024
    rs = np.random.RandomState(0)
    s = jnp.asarray(rs.rand(n), jnp.float32)
    t = jnp.asarray(rs.rand(n), jnp.float32)
    u3 = jnp.asarray(rs.rand(n, 3), jnp.float32)
    o, d, tm = camera_mod.get_rays(cs.camera, s, t, u3)
    _check(cs, inter, o, d, tm)


def test_incoherent_rays_match_brute(cornell_row):
    cs, inter = cornell_row
    n = 1024
    rs = np.random.RandomState(1)
    o = jnp.asarray(rs.rand(n, 3) * 555.0, jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    tm = jnp.zeros((n,), jnp.float32)
    _check(cs, inter, o, d, tm)


def test_sorted_path_unsorts_correctly(cornell_row):
    """n >= 2048 triggers the argsort + packed gather/scatter path; results
    must land back in caller ray order."""
    cs, inter = cornell_row
    n = 2048
    rs = np.random.RandomState(2)
    o = jnp.asarray(rs.rand(n, 3) * 555.0, jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    tm = jnp.zeros((n,), jnp.float32)
    _check(cs, inter, o, d, tm)


def test_triangle_mesh_blocks():
    """A >64-prim all-triangle mesh exercises multi-block leaves and the
    triangle-only fast path."""
    from izpi_tpu.scene import types as st

    rs = np.random.RandomState(3)
    mat = st.Lambertian(albedo=st.ConstantTexture((0.5, 0.5, 0.5)))
    tris = []
    for _ in range(300):
        v0 = rs.rand(3) * 10.0
        tris.append(st.Triangle(
            v0=tuple(v0), v1=tuple(v0 + rs.rand(3)),
            v2=tuple(v0 + rs.rand(3)), material=mat))
    scene = st.Scene(world=tris,
                     camera=st.Camera(look_from=(5, 5, -15),
                                      look_at=(5, 5, 5)))
    cs, meta = compile_scene(scene)
    cs2, inter = bvh_rowkernel.attach(cs, seed=1, interpret=True)
    n = 1024
    o = jnp.asarray(rs.rand(n, 3) * 12.0 - 1.0, jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    tm = jnp.zeros((n,), jnp.float32)
    _check(cs2, inter, o, d, tm)
