"""Per-ray spectral material evaluation.

Maps the reference's SpectralTexture dispatch (texture/spectral_constant.go)
onto the compiled tables: tabulated spectra live in the scene SPD stack
(1 nm grid), Gaussian responses stay parametric, and materials without
spectral data fall back to the luminance of their RGB texture (the PBR
fallback rule, material/pbr.go:285-293, applied uniformly — reference scenes
always carry explicit spectral data, so the fallback only covers
user-authored RGB materials rendered spectrally).
"""

from __future__ import annotations

import jax.numpy as jnp

from izpi_tpu.spectral import spd as spd_mod

# NTSC/Rec.601 luma — the reference's RGB→spectral fallback coefficients
# (pbr.go:293: 0.299·R + 0.587·G + 0.114·B).
LUMA = (0.299, 0.587, 0.114)


def luminance(rgb):
    return (LUMA[0] * rgb[..., 0] + LUMA[1] * rgb[..., 1]
            + LUMA[2] * rgb[..., 2])


def spectral_value(spd_table, spd_id, gauss, lam, fallback):
    """Evaluate a material's spectral response at per-ray wavelengths.

    spd_id: (N,) int32 (−1 = no tabulated SPD); gauss: (N,3) (peak, center,
    width; width<=0 = unused); lam: (N,); fallback: (N,) value when neither
    is present. Gaussian: peak·exp(−((λ−center)/width)²)
    (spectral_constant.go:75-79).
    """
    tab = spd_mod.device_spd_value(spd_table, jnp.maximum(spd_id, 0), lam)
    peak, center, width = gauss[..., 0], gauss[..., 1], gauss[..., 2]
    w_safe = jnp.where(width == 0.0, 1.0, width)
    gauss_val = peak * jnp.exp(-(((lam - center) / w_safe) ** 2))
    out = jnp.where(spd_id >= 0, tab,
                    jnp.where(width > 0.0, gauss_val, fallback))
    return out
