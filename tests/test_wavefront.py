"""Persistent-pool wavefront scheduler vs the lockstep oracle."""

import numpy as np

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.cornell import cornell_box


def test_wavefront_matches_simple_mode():
    s = path_mod.RenderSettings(max_depth=6)
    a = renderer.render(cornell_box(), 16, 16, 8, settings=s, seed=3,
                        mode="simple")
    b = renderer.render(cornell_box(), 16, 16, 8, settings=s, seed=3,
                        mode="wavefront")
    # Same (pixel, sample) RNG streams → same estimates up to fp
    # accumulation order; same total ray count.
    assert a.rays_traced == b.rays_traced
    np.testing.assert_allclose(a.image, b.image, atol=1e-5)


def test_wavefront_small_pool_still_complete():
    """A pool smaller than the sample count must still consume the whole
    queue (regeneration correctness)."""
    s = path_mod.RenderSettings(max_depth=4)
    a = renderer.render(cornell_box(), 8, 8, 4, settings=s, seed=1,
                        mode="simple")
    b = renderer.render(cornell_box(), 8, 8, 4, settings=s, seed=1,
                        mode="wavefront", pool_size=17)
    assert a.rays_traced == b.rays_traced
    np.testing.assert_allclose(a.image, b.image, atol=1e-5)
