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
