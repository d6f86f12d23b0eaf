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


def test_light_source_library_full_42_name_parity():
    """Every SPD name of internal/lightsources/lightsources.go resolves
    (39 tabulated + 3 blackbody-synthesized at lightsources.go:217-223),
    and nothing extra exists."""
    from izpi_tpu.spectral import lightsources

    expected = {
        "cie_f10_narrowband_5000k", "cie_f11_narrowband_4000k",
        "cie_f12_narrowband_3000k", "cie_f1_daylight_fluorescent",
        "cie_f2_cool_white_fluorescent", "cie_f3_white_fluorescent",
        "cie_f4_warm_white_fluorescent", "cie_f5_daylight_fluorescent",
        "cie_f6_lite_white_fluorescent", "cie_f7_broadband_daylight",
        "cie_f8_broadband_cool_white", "cie_f9_broadband_cool_white_deluxe",
        "cie_illuminant_a_2856k", "cm_acuity_evo_4",
        "cm_edison_price_lumenetix", "cm_intense_mxrtr2", "cm_lumenetix",
        "cm_pathway_lexel", "halogen_3200k", "hps_c100s54_standard",
        "hps_cie238", "hps_sdw_t_100w", "hy_cree_llf_tm_30_90",
        "hy_cree_module", "hy_cree_par38", "hy_ge_lumination",
        "hy_ngl_47_tm_30_92", "incandescent_2800k",
        "incandescent_60w_a19_real", "incandescent_halogen_real",
        "incandescent_krypton_real", "laser_red_650nm", "pc_current_ge",
        "pc_green_creative_mr16", "pc_maxled", "pc_ngl_124_tm_30_194",
        "pc_ngl_308_tm_30_231", "pc_samjin", "pc_seoul_sunlike_3030",
        "pc_soraa_mr16_830", "pcv_soraa_prem_2700_k_tm_30_294",
        "pcv_soraa_vivid_2700_k_tm_30_296",
    }
    assert len(expected) == 42
    assert set(lightsources.list_light_sources()) == expected
    for name in expected:
        s = lightsources.get_light_source(name)
        assert float(np.max(s.values)) > 0.0
