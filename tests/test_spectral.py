"""Spectral pipeline tests: transport, conversion, firefly rejection."""

import numpy as np
import jax.numpy as jnp

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.materials import spectral_eval
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.cornell_spectral import cornell_box_spectral
from izpi_tpu.spectral import convert


def test_spectral_cornell_colors():
    res = renderer.render(cornell_box_spectral(), 32, 32, 8,
                          settings=path_mod.RenderSettings(max_depth=6),
                          seed=2)
    img = res.image
    assert np.isfinite(img).all()
    assert res.xyz is not None
    # Green wall at image left (x=100, Gaussian 540nm), red at right (x=0).
    left = img[10:22, 0:4].mean(axis=(0, 1))
    right = img[10:22, -4:].mean(axis=(0, 1))
    assert left[1] > left[0]
    assert right[0] > right[1]


def test_spectral_gaussian_eval():
    # peak·exp(-((λ-center)/width)²), spectral_constant.go:75-79.
    table = jnp.zeros((1, 371), jnp.float32)
    sid = jnp.full((3,), -1, jnp.int32)
    gauss = jnp.tile(jnp.asarray([[0.9, 540.0, 40.0]], jnp.float32), (3, 1))
    lam = jnp.asarray([540.0, 580.0, 380.0], jnp.float32)
    got = np.asarray(spectral_eval.spectral_value(
        table, sid, gauss, lam, jnp.zeros(3)))
    want = 0.9 * np.exp(-(((np.asarray(lam) - 540.0) / 40.0) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_xyz_to_acescg_matrix():
    # D60 white (XYZ of ACES white) should map to ~equal RGB.
    xyz = np.array([[[0.95265, 1.0, 1.00883]]])
    rgb = convert.xyz_to_acescg(xyz)
    np.testing.assert_allclose(rgb[0, 0], [1.0, 1.0, 1.0], atol=2e-2)


def test_firefly_rejection_clamps_outlier():
    xyz = np.full((5, 5, 3), 1.0)
    xyz[2, 2] = [50.0, 100.0, 25.0]
    out = convert.firefly_rejection(xyz)
    # Neighbors are all Y=1, σ=0 → threshold=1 → pixel scaled to Y=1,
    # chromaticity preserved (X:Y:Z ratio kept).
    assert abs(out[2, 2, 1] - 1.0) < 1e-9
    np.testing.assert_allclose(out[2, 2, 0] / out[2, 2, 1], 0.5)
    # Non-outliers untouched.
    np.testing.assert_array_equal(out[0, 0], [1, 1, 1])


def test_firefly_keeps_legit_bright_region():
    # A bright 3×3 block is not an outlier w.r.t. its own neighborhood.
    xyz = np.full((6, 6, 3), 1.0)
    xyz[2:5, 2:5] = 10.0
    out = convert.firefly_rejection(xyz)
    assert out[3, 3, 1] == 10.0
