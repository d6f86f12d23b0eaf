"""Pallas megakernel vs the XLA integrators (interpret mode on CPU).

The megakernel consumes the same Threefry streams as the oracle
(tests/test_ops_threefry.py), so images must agree to fp accumulation order
— the same contract test_wavefront holds the XLA pool to."""

import jax
import numpy as np
import pytest

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.cornell import cornell_box


@pytest.fixture(scope="module")
def ctx():
    return renderer.RenderContext(cornell_box(aspect=1.0))


def test_eligible(ctx):
    assert ctx.mega_supported()


def test_megakernel_matches_oracle(ctx):
    s = path_mod.RenderSettings(max_depth=4)
    nx = ny = 8
    spp = 2
    a = renderer.render(None, nx, ny, spp, settings=s, seed=3,
                        mode="simple", context=ctx)
    run = ctx.mega_runner(nx, ny, spp, s, interpret=True)
    from izpi_tpu.core import rng

    acc, nrays = run(rng.render_key(3), 0)
    img = (np.asarray(acc) / spp).reshape(ny, nx, 3)[::-1]
    assert int(nrays) == a.rays_traced
    np.testing.assert_allclose(img, a.image, atol=1e-5)


def test_megakernel_clustered_matches_flat(monkeypatch):
    """Cluster-skipped unrolled scan (>= CLUSTER_MIN_PRIMS prims) must match
    the flat unrolled scan bit-for-bit — cluster culling may only skip
    primitives whose slab window is empty for every lane. (Compared against
    the flat MEGAKERNEL, not the MXU-brute oracle: the sphere quadratic is
    formulated differently there and near-tangent hits legitimately flip,
    docs/PERF.md.)"""
    from izpi_tpu.ops import megakernel
    from izpi_tpu.scene import types as st

    rs = np.random.RandomState(4)
    world = [st.Sphere((0, -1000, 0), (0, -1000, 0), 0, 1, 1000,
                       st.Lambertian(albedo=st.ConstantTexture(
                           (0.5, 0.5, 0.5))))]
    for i in range(80):  # > CLUSTER_MIN_PRIMS -> clustered scan
        c = ((rs.rand(3) - 0.5) * np.array([20, 0, 20])
             + np.array([0, 0.4, 0]))
        world.append(st.Sphere(tuple(c), tuple(c), 0, 1, 0.4,
                               st.Metal(albedo=(0.8, 0.6, 0.4), fuzz=0.1)
                               if i % 3 else
                               st.Lambertian(albedo=st.ConstantTexture(
                                   tuple(rs.rand(3))))))
    cam = st.Camera(look_from=(13, 2, 3), look_at=(0, 0, 0), vfov=20,
                    aspect=1.0)
    scene = st.Scene(world=world, camera=cam)
    s = path_mod.RenderSettings(max_depth=4, background=(0.7, 0.8, 1.0))
    nx = ny = 8
    spp = 2
    from izpi_tpu.core import rng

    key = rng.render_key(5)

    monkeypatch.setattr(megakernel, "CLUSTER_MIN_PRIMS", 64)
    ctx_c = renderer.RenderContext(scene)
    static = megakernel.extract_static(ctx_c.cs, ctx_c.meta)
    assert len(static.prims) >= megakernel.CLUSTER_MIN_PRIMS
    acc_c, n_c = ctx_c.mega_runner(nx, ny, spp, s, interpret=True)(key, 0)

    monkeypatch.setattr(megakernel, "CLUSTER_MIN_PRIMS", 10_000)
    ctx_f = renderer.RenderContext(scene)
    acc_f, n_f = ctx_f.mega_runner(nx, ny, spp, s, interpret=True)(key, 0)

    assert int(n_c) == int(n_f)
    np.testing.assert_allclose(np.asarray(acc_c), np.asarray(acc_f),
                               atol=1e-6)


def test_megakernel_sample_offset_chunks(ctx):
    """Two chunked runs (offset 0 and 2) must sum to one 4-spp run —
    the checkpoint/resume contract."""
    s = path_mod.RenderSettings(max_depth=3)
    nx = ny = 8
    from izpi_tpu.core import rng

    key = rng.render_key(7)
    full = ctx.mega_runner(nx, ny, 4, s, interpret=True)(key, 0)
    half = ctx.mega_runner(nx, ny, 2, s, interpret=True)
    a0, n0 = half(key, 0)
    a1, n1 = half(key, 2)
    np.testing.assert_allclose(np.asarray(a0) + np.asarray(a1),
                               np.asarray(full[0]), atol=1e-5)
    assert int(n0) + int(n1) == int(full[1])
