"""Spectral power distributions.

Host side: an exact float64 `SPD` class mirroring the reference's
interpolation semantics (internal/spectral/spectral.go:151-182), used at scene
compile time (white balance, uplift, resampling).

Device side: all tabulated spectra in a scene are resampled onto a common
1 nm grid over 380–750 nm (371 samples) and stacked into one (S, 371) f32
table; `device_spd_value` evaluates any of them at per-ray wavelengths with a
single gather + lerp. Resampling is exact for the reference's data, whose
nodes all sit on integer-nm wavelengths, so piecewise-linear values agree.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from izpi_tpu.spectral import cie

DEVICE_GRID_MIN = 380.0
DEVICE_GRID_MAX = 750.0
DEVICE_GRID_STEP = 1.0
DEVICE_GRID_N = 371

DEVICE_GRID = np.arange(DEVICE_GRID_MIN, DEVICE_GRID_MAX + 0.5, DEVICE_GRID_STEP)


class SPD:
    """Host-side spectral power distribution (float64, exact).

    Mirrors spectral.SpectralPowerDistribution: arbitrary wavelength nodes,
    linear interpolation, endpoint clamping (spectral.go:151-182).
    """

    def __init__(self, wavelengths, values):
        self.wavelengths = np.asarray(wavelengths, dtype=np.float64)
        self.values = np.asarray(values, dtype=np.float64)
        assert self.wavelengths.shape == self.values.shape

    @staticmethod
    def cie_grid(values) -> "SPD":
        values = np.asarray(values, dtype=np.float64)
        assert values.shape == (cie.N_CIE,)
        return SPD(cie.CIE_WAVELENGTHS, values)

    @staticmethod
    def constant(value: float) -> "SPD":
        return SPD.cie_grid(np.full(cie.N_CIE, float(value)))

    def value(self, lam) -> np.ndarray:
        """np.interp == reference's clamp-then-lerp."""
        return np.interp(lam, self.wavelengths, self.values)

    def to_device_grid(self) -> np.ndarray:
        """Resample to the common 1 nm device grid (371,), float32."""
        return np.interp(DEVICE_GRID, self.wavelengths, self.values).astype(
            np.float32
        )

    def scaled(self, s: float) -> "SPD":
        return SPD(self.wavelengths, self.values * s)


def blackbody(temperature: float) -> SPD:
    """Planck's-law SPD on the CIE grid, peak-normalized to 1.

    Reference: spectral.NewBlackbodySPD (spectral.go:275-319); same physical
    constants, same >700 exponent guard, same max-normalization.
    """
    h = 6.62607015e-34
    c = 2.99792458e8
    k = 1.380649e-23
    c1 = 2.0 * h * c * c
    c2 = (h * c) / k

    values = np.zeros(cie.N_CIE)
    for i, lam_nm in enumerate(cie.CIE_WAVELENGTHS):
        lam_m = lam_nm * 1e-9
        exponent = c2 / (lam_m * temperature)
        if exponent > 700:
            values[i] = 0.0
        else:
            values[i] = c1 / (lam_m**5 * (math.exp(exponent) - 1.0))
    m = values.max()
    if m > 0:
        values /= m
    return SPD.cie_grid(values)


def device_spd_value(table: jnp.ndarray, spd_id, lam):
    """Evaluate stacked SPD table at wavelengths.

    table: (S, 371) f32 on the 1 nm grid; spd_id: (...,) int32; lam: (...,).
    Returns (...,) f32 with endpoint clamping like the reference.
    """
    x = (jnp.asarray(lam, jnp.float32) - DEVICE_GRID_MIN) / DEVICE_GRID_STEP
    x = jnp.clip(x, 0.0, DEVICE_GRID_N - 1.0)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, DEVICE_GRID_N - 2)
    t = x - i0.astype(jnp.float32)
    v0 = table[spd_id, i0]
    v1 = table[spd_id, i0 + 1]
    return v0 * (1.0 - t) + v1 * t
