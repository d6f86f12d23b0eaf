"""Core math / sampling / spectral unit tests (the L0 layer,
mirroring the reference's co-located go tests, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from izpi_tpu.core import onb, sampling, vecmath as vm, rng
from izpi_tpu.spectral import cie, spd


def test_onb_orthonormal():
    normals = jnp.asarray(np.random.RandomState(0).randn(64, 3), jnp.float32)
    u, v, w = onb.build_from_w(normals)
    for a in (u, v, w):
        np.testing.assert_allclose(np.asarray(vm.length(a)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(u, v)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.dot(v, w)), 0.0, atol=1e-5)
    # Reference handedness (onb.go:38-50: v=unit(w×a), u=w×v) gives u×v=-w.
    np.testing.assert_allclose(np.asarray(vm.cross(u, v)), -np.asarray(w), atol=1e-5)


def test_onb_matches_reference_branch():
    # |w.x| > 0.9 uses a=(0,1,0) (onb.go:41-46)
    n = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    u, v, w = onb.build_from_w(n)
    # w=(1,0,0); v = unit(w × (0,1,0)) = (0,0,1)... cross((1,0,0),(0,1,0)) = (0,0,1)
    np.testing.assert_allclose(np.asarray(v)[0], [0.0, 0.0, 1.0], atol=1e-6)


def test_book_cosine_direction_quirk():
    # The reference's RandomCosineDirection yields non-unit vectors with
    # x²+y² = 4·r2 (vec3.go:119-128). Verify we reproduce that exactly.
    u1, u2 = jnp.float32(0.3), jnp.float32(0.25)
    d = sampling.random_cosine_direction(u1, u2, exact_book_cosine=True)
    d = np.asarray(d)
    assert abs(d[0] ** 2 + d[1] ** 2 - 4 * 0.25) < 1e-6
    assert abs(d[2] - np.sqrt(1 - 0.25)) < 1e-6
    d_correct = np.asarray(
        sampling.random_cosine_direction(u1, u2, exact_book_cosine=False))
    assert abs(np.linalg.norm(d_correct) - 1.0) < 1e-6


def test_refract_schlick_formulas():
    v = jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    refr, ok = vm.refract(v, n, jnp.asarray([1.0 / 1.5], jnp.float32))
    assert bool(ok[0])
    # Snell: sinθ_t = sinθ_i/1.5, incoming at 45°.
    sin_t = np.sin(np.pi / 4) / 1.5
    out = np.asarray(refr)[0]
    out_sin = abs(out[0]) / np.linalg.norm(out)
    assert abs(out_sin - sin_t) < 1e-5
    # schlick at normal incidence = ((1-n)/(1+n))^2
    s = np.asarray(vm.schlick(jnp.float32(1.0), jnp.float32(1.5)))
    assert abs(s - ((0.5 / 2.5) ** 2)) < 1e-6


def test_de_nan():
    x = jnp.asarray([[np.nan, np.inf, -np.inf]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(vm.de_nan(x)), [[0.0, 0.0, 0.0]])


def _sample_wavelength_scalar(u):
    """Literal transcription of the reference algorithm (spectral.go:184-224)
    as an independent oracle."""
    target = u * cie.CIE_Y_INTEGRAL
    current = 0.0
    for i, y in enumerate(cie.CIE_Y):
        if current + y >= target:
            if i > 0:
                t = (target - current) / y
                lam = cie.CIE_WAVELENGTHS[i - 1] + t * 5.0
                y_i = cie.CIE_Y[i - 1] + t * (cie.CIE_Y[i] - cie.CIE_Y[i - 1])
                return lam, y_i / cie.CIE_Y_INTEGRAL
            return cie.CIE_WAVELENGTHS[i], y / cie.CIE_Y_INTEGRAL
        current += y
    return 750.0, cie.CIE_Y[-1] / cie.CIE_Y_INTEGRAL


def test_sample_wavelength_matches_scalar_oracle():
    us = np.linspace(0.001, 0.999, 113)
    lam, pdf = cie.sample_wavelength(jnp.asarray(us, jnp.float32))
    lam = np.asarray(lam)
    pdf = np.asarray(pdf)
    for i, u in enumerate(us):
        l_ref, p_ref = _sample_wavelength_scalar(u)
        assert abs(lam[i] - l_ref) < 0.05, (u, lam[i], l_ref)
        assert abs(pdf[i] - p_ref) < 1e-5


def test_cie_interp_endpoints_and_midpoint():
    x, y, z = cie.get_cie_values(jnp.asarray([380.0, 750.0, 552.5]))
    np.testing.assert_allclose(np.asarray(x)[:2], [cie.CIE_X[0], cie.CIE_X[-1]], atol=1e-6)
    # midpoint between 550 and 555
    y_mid = 0.5 * (cie.CIE_Y[34] + cie.CIE_Y[35])
    assert abs(float(np.asarray(y)[2]) - y_mid) < 1e-6


def test_spd_device_grid_roundtrip():
    s = spd.SPD(np.array([380.0, 500.0, 750.0]), np.array([1.0, 0.5, 2.0]))
    dev = s.to_device_grid()
    table = jnp.asarray(dev)[None, :]
    lams = jnp.asarray([380.0, 440.0, 500.0, 625.0, 750.0], jnp.float32)
    got = np.asarray(spd.device_spd_value(table, jnp.zeros(5, jnp.int32), lams))
    want = s.value(np.asarray(lams))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_blackbody_peak_normalized():
    s = spd.blackbody(6500.0)
    assert abs(s.values.max() - 1.0) < 1e-12
    assert (s.values >= 0).all()


def test_rng_pixel_independence():
    key = rng.render_key(0)
    keys = rng.path_keys(key, jnp.arange(4, dtype=jnp.int32), 0)
    u = rng.bounce_uniforms(keys, jnp.int32(0), 2)
    assert u.shape == (4, 2)
    assert len(np.unique(np.asarray(u))) == 8


@pytest.mark.parametrize("n_iters,chunk", [(50, 8), (7, 8), (16, 4), (1, 8)])
def test_guarded_fori_exact_trip_count(n_iters, chunk):
    # The bounce loop's body is NOT a fixpoint past the depth cap
    # (colour.go:34-36 semantics): guarded_fori must run EXACTLY n_iters
    # iterations while cond holds — never ceil(n/chunk)*chunk.
    from izpi_tpu.core.loops import guarded_fori

    def body(s):
        return s + 1

    out = guarded_fori(n_iters, lambda s: s < 10_000, body, jnp.int32(0),
                       chunk=chunk)
    assert int(out) == n_iters
    # And the guard still short-circuits when cond goes false.
    out = guarded_fori(n_iters, lambda s: s < 3, body, jnp.int32(0),
                       chunk=chunk)
    want_min = min(3, n_iters)
    assert want_min <= int(out) <= min(n_iters, ((3 // chunk) + 1) * chunk)
