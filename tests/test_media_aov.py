"""ConstantMedium and AOV sampler tests."""

import numpy as np
import jax.numpy as jnp

from izpi_tpu.integrator import aov, path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene import types as st
from izpi_tpu.scene.compiler import compile_scene


def _smoke_scene(density=0.1):
    white = st.Lambertian(albedo=st.ConstantTexture((0.73, 0.73, 0.73)))
    smoke = st.ConstantMedium(
        boundary=st.Box((-2, 0, -2), (2, 4, 2), white),
        density=density,
        phase=st.Isotropic(albedo=st.ConstantTexture((0.9, 0.9, 0.9))),
    )
    light = st.FlipNormals(st.XZRect(-1, 1, -1, 1, 8.0,
                                     st.DiffuseLight(emit=st.ConstantTexture((10, 10, 10)))))
    floor = st.XZRect(-10, 10, -10, 10, 0.0, white)
    return st.Scene(world=[smoke, light, floor],
                    camera=st.Camera(look_from=(0, 3, -9), look_at=(0, 2, 0),
                                     vfov=45))


def test_medium_occludes_statistically():
    s = path_mod.RenderSettings(max_depth=6)
    thin = renderer.render(_smoke_scene(0.01), 24, 24, 8, settings=s, seed=5)
    thick = renderer.render(_smoke_scene(5.0), 24, 24, 8, settings=s, seed=5)
    assert np.isfinite(thin.image).all() and np.isfinite(thick.image).all()
    # Dense smoke scatters into the zero-contribution isotropic phase
    # (reference RGB behavior) → darker image than thin smoke.
    assert thick.image.mean() < thin.image.mean()


def test_medium_free_flight_distribution():
    """A ray through a [0,4]-deep box medium: P(scatter) = 1 - exp(-ρ·L)."""
    from izpi_tpu.core import rng
    from izpi_tpu.integrator.path import _apply_media
    from izpi_tpu.geometry import primitives as prim

    cs, meta = compile_scene(_smoke_scene(0.5))
    n = 4096
    o = jnp.tile(jnp.asarray([[0.0, 2.0, -10.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    t = jnp.zeros(n)
    keys = rng.path_keys(rng.render_key(0), jnp.arange(n, dtype=jnp.int32), 0)
    # Miss record (no geometry along this ray until the far floor edge).
    base = prim.intersect_brute(cs.prims, o, d, t, 1e-3, prim.T_MAX)
    rec = _apply_media(cs, meta, base, o, d, t, keys, jnp.zeros(n, jnp.int32))
    frac = float(jnp.mean((rec.mat_id == cs.media.mat_id[0]) & rec.hit))
    expected = 1.0 - np.exp(-0.5 * 4.0)  # box spans z∈[-2,2] → length 4
    assert abs(frac - expected) < 0.05, (frac, expected)


def test_aov_samplers():
    from izpi_tpu.scene.library.cornell import cornell_box

    cs, meta = compile_scene(cornell_box())
    intersect = path_mod.make_brute_intersector(cs)
    o = jnp.asarray([[278.0, 278.0, -700.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = jnp.zeros(1)

    alb = np.asarray(aov.sample_albedo(cs, meta, intersect, o, d, t))
    np.testing.assert_allclose(alb[0], [0.73, 0.73, 0.73], atol=1e-5)  # back wall

    # x=100 avoids the rotated box and the sphere → back wall, normal -z.
    o_wall = jnp.asarray([[100.0, 400.0, -700.0]], jnp.float32)
    nrm = np.asarray(aov.sample_normal(cs, meta, intersect, o_wall, d, t))
    np.testing.assert_allclose(nrm[0], [0, 0, -1], atol=1e-5)  # flipped XY rect
    # And the ray at image center hits the 15°-rotated box: its baked normal
    # is (-sin15°, 0, -cos15°) — the RotateY bake in action.
    nrm2 = np.asarray(aov.sample_normal(cs, meta, intersect, o, d, t))
    np.testing.assert_allclose(
        nrm2[0], [-np.sin(np.pi / 12), 0.0, -np.cos(np.pi / 12)], atol=1e-5)

    # Glass sphere front → dielectric albedo (1,1,1).
    o2 = jnp.asarray([[190.0, 90.0, -700.0]], jnp.float32)
    alb2 = np.asarray(aov.sample_albedo(cs, meta, intersect, o2, d, t))
    np.testing.assert_allclose(alb2[0], [1, 1, 1], atol=1e-6)

    # Wireframe: a ray at the rect edge paints ink; center paints paper-hit.
    ink = (0, 0, 0)
    paper = (1, 1, 1)
    o3 = jnp.asarray([[555.0, 278.0, -700.0], [278.0, 278.0, -700.0]],
                     jnp.float32)
    d3 = jnp.tile(d, (2, 1))
    t3 = jnp.zeros(2)
    wf = np.asarray(aov.sample_wireframe(cs, meta, intersect, o3, d3, t3,
                                         ink, paper))
    np.testing.assert_allclose(wf[0], [0, 0, 0], atol=1e-6)   # on edge x=555
    np.testing.assert_allclose(wf[1], [1, 1, 1], atol=1e-6)   # interior
