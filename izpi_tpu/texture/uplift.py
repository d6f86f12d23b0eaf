"""RGB → spectral uplift.

Parity with the reference's SpectralImage transform
(texture/spectral_image.go:100-190): per-channel Gaussian lobes with hard
wavelength gates (R: 580-750 @650/60, G: 480-620 @550/60, B: 380-520
@450/60), neutral-color preservation (|r-g|,|g-b|,|r-b| < 0.15 → keep
max(rgb)), bright-pixel preservation (max>0.7 → ≥0.8·max), clamped to [0,1].

The reference PRECOMPUTES the value at the 75 CIE bucket wavelengths and
linearly interpolates between buckets at eval time (spectral_image.go:193+);
`eval_bucketed` reproduces that exactly by evaluating the formula at the two
neighboring 5 nm nodes and lerping.
"""

from __future__ import annotations

import jax.numpy as jnp

from izpi_tpu.spectral import cie


def rgb_to_spectral_value(rgb, lam):
    """The uplift formula at exact wavelengths. rgb (...,3), lam (...,)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    out = jnp.zeros_like(lam)

    def lobe(channel, center, lo, hi):
        falloff = jnp.exp(-((lam - center) ** 2) / (2.0 * 60.0 * 60.0))
        gated = jnp.where((lam >= lo) & (lam <= hi), channel * falloff, 0.0)
        return gated

    out = out + lobe(r, 650.0, 580.0, 750.0)
    out = out + lobe(g, 550.0, 480.0, 620.0)
    out = out + lobe(b, 450.0, 380.0, 520.0)

    max_rgb = jnp.maximum(r, jnp.maximum(g, b))
    neutral = ((jnp.abs(r - g) < 0.15) & (jnp.abs(g - b) < 0.15)
               & (jnp.abs(r - b) < 0.15))
    out = jnp.where(neutral, jnp.maximum(out, max_rgb), out)
    bright = (max_rgb > 0.7) & (out < max_rgb * 0.8)
    out = jnp.where(bright, jnp.maximum(out, max_rgb * 0.8), out)
    return jnp.clip(out, 0.0, 1.0)


def eval_bucketed(rgb, lam):
    """Evaluate like the reference's bucketized SpectralImage: formula at
    the two neighboring 5 nm CIE nodes, lerped."""
    x = (jnp.asarray(lam, jnp.float32) - cie.WAVELENGTH_MIN) / cie.CIE_STEP
    x = jnp.clip(x, 0.0, cie.N_CIE - 1.0)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, cie.N_CIE - 2)
    t = x - i0.astype(jnp.float32)
    lam0 = cie.WAVELENGTH_MIN + i0.astype(jnp.float32) * cie.CIE_STEP
    lam1 = lam0 + cie.CIE_STEP
    v0 = rgb_to_spectral_value(rgb, lam0)
    v1 = rgb_to_spectral_value(rgb, lam1)
    return v0 * (1.0 - t) + v1 * t
