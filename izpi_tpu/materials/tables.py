"""Flat material parameter table.

The reference dispatches a 10-method Material interface per hit
(internal/material/api.go:19-30). Here materials are rows of a parameter
table; the integrator gathers a ray's row and executes all lobes with tagged
selects (izpi_tpu.integrator.path).

Kinds: 0 LAMBERT, 1 METAL, 2 DIELECTRIC, 3 DIFFUSE_LIGHT, 4 ISOTROPIC, 5 PBR.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

MAT_LAMBERT = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_DIFFUSE_LIGHT = 3
MAT_ISOTROPIC = 4
MAT_PBR = 5


class Materials(NamedTuple):
    kind: jax.Array           # (M,) int32
    tex_albedo: jax.Array     # (M,) int32 — albedo or emission texture id
    fuzz: jax.Array           # (M,) metal fuzz (metal.go:22)
    ref_idx: jax.Array        # (M,) dielectric η (dielectric.go:33)
    absorption: jax.Array     # (M, 3) Beer–Lambert α (dielectric.go:48)
    has_absorption: jax.Array # (M,) bool
    # PBR texture slots (pbr.go:20-31); -1 = absent.
    tex_rough: jax.Array      # (M,) int32
    tex_metal: jax.Array      # (M,) int32
    tex_normal: jax.Array     # (M,) int32
    tex_sss: jax.Array        # (M,) int32
    sss_radius: jax.Array     # (M,)
    # Spectral table ids (-1 = absent): index into the scene SPD stack for
    # tabulated spectra, or parametric Gaussian params.
    spec_albedo_id: jax.Array   # (M,) int32 spectral albedo/emission SPD id
    spec_albedo_gauss: jax.Array  # (M, 3) (peak, center, width); width<=0 ⇒ unused
    spec_ref_idx_id: jax.Array  # (M,) int32 η(λ) SPD id (dispersion)
    spec_absorb_id: jax.Array   # (M,) int32 spectral absorption SPD id
    # Spectral checker (texture/spectral_checker.go): second branch params.
    spec_checker: jax.Array     # (M,) bool
    spec_albedo_id2: jax.Array  # (M,) int32
    spec_albedo_gauss2: jax.Array  # (M, 3)
    # RGB→spectral uplift of the albedo texture (texture/spectral_image.go).
    spec_albedo_uplift: jax.Array  # (M,) bool
    # Combined-map stack row for this material (-1 = none); see
    # texture.tables.Textures.combined.
    combo_id: jax.Array  # (M,) int32

    @property
    def count(self) -> int:
        return self.kind.shape[0]
