"""Integrator tests: deterministic single-path checks + statistical sanity on
the Cornell box (the reference has no sampler tests — SURVEY.md §4 lists this
as a gap to close)."""

import numpy as np
import jax
import jax.numpy as jnp

from izpi_tpu.core import rng
from izpi_tpu.integrator import path as path_mod
from izpi_tpu.scene import types as st
from izpi_tpu.scene.compiler import compile_scene
from izpi_tpu.scene.library.cornell import cornell_box


def _trace(scene, o, d, settings):
    cs, meta = compile_scene(scene)
    intersect = path_mod.make_brute_intersector(cs)
    n = o.shape[0]
    keys = rng.path_keys(rng.render_key(7), jnp.arange(n, dtype=jnp.int32), 0)
    time = jnp.zeros(n, jnp.float32)
    color, nrays = path_mod.trace(cs, meta, settings, intersect,
                                  jnp.asarray(o, jnp.float32),
                                  jnp.asarray(d, jnp.float32), time, keys)
    return np.asarray(color), int(nrays)


def test_depth_cap_sentinel():
    # maxDepth=0 → immediate {Z:1} (colour.go:34-36), no rays counted.
    scene = cornell_box()
    color, nrays = _trace(scene, np.zeros((2, 3)), np.tile([0, 0, 1.0], (2, 1)),
                          path_mod.RenderSettings(max_depth=0))
    np.testing.assert_array_equal(color, [[0, 0, 1], [0, 0, 1]])
    assert nrays == 0


def test_direct_light_hit_and_miss_background():
    scene = cornell_box()
    settings = path_mod.RenderSettings(max_depth=50, background=(0.25, 0.5, 0.75))
    # Straight up at the light's center (one-sided: emits downward since its
    # normal is flipped to (0,-1,0)).
    o = np.array([[278.0, 300.0, 279.5], [0.0, 0.0, -900.0]])
    d = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    color, nrays = _trace(scene, o, d, settings)
    np.testing.assert_allclose(color[0], [15.0, 15.0, 15.0], atol=1e-4)
    np.testing.assert_allclose(color[1], [0.25, 0.5, 0.75], atol=1e-6)
    assert nrays == 2


def test_one_sided_light():
    light = st.DiffuseLight(emit=st.ConstantTexture((5.0, 5.0, 5.0)))
    scene = st.Scene(
        world=[st.XZRect(-1, 1, -1, 1, 0.0, light)],
        camera=st.Camera(look_from=(0, 2, 0), look_at=(0, 0, 0)),
    )
    settings = path_mod.RenderSettings(max_depth=5)
    o = np.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    d = np.array([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
    color, _ = _trace(scene, o, d, settings)
    # From above: dot(n=(0,1,0), d=(0,-1,0)) < 0 → emits.
    np.testing.assert_allclose(color[0], [5, 5, 5], atol=1e-5)
    # From below: back side → black (diffuselight.go:49-63).
    np.testing.assert_allclose(color[1], [0, 0, 0], atol=1e-5)


def test_cornell_statistics():
    """Render a tiny Cornell box; pixels must be finite, non-negative, and
    the ceiling-light region must be the brightest thing in frame."""
    from izpi_tpu.render import renderer

    res = renderer.render(cornell_box(), nx=32, ny=32, spp=8,
                          settings=path_mod.RenderSettings(max_depth=8),
                          seed=3)
    img = res.image
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert res.rays_traced > 32 * 32 * 8  # at least one bounce on average
    # Light patch (top middle of the image) should reach ~15 somewhere,
    # walls ~O(0.1-1).
    top = img[:8, 8:24].max()
    assert top > 5.0, top
    mid = img[12:20, 12:20].mean()
    assert 0.005 < mid < 2.0, mid
    # Camera looks down +z with u = vup×w = (-1,0,0), so film column 0 maps
    # to world +x: the GREEN wall (x=555) is on the image's left and the red
    # wall (x=0) on its right — same mirrored-x framing as the book's render.
    left = img[10:22, 0:4]
    right = img[10:22, 28:32]
    assert left[..., 1].mean() > left[..., 0].mean()   # green dominant
    assert right[..., 0].mean() > right[..., 1].mean()  # red dominant
