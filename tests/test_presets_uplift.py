"""Material presets + spectral uplift tests."""

import numpy as np
import jax.numpy as jnp

from izpi_tpu.materials import presets
from izpi_tpu.texture import uplift


def test_porcelain_presets():
    assert presets.list_materials() == [
        "porcelain", "porcelain_glossy", "porcelain_matte"]
    p = presets.get_material("porcelain")
    assert p.sss_radius == 0.1
    assert p.spectral_albedo.values[0] == 0.78
    assert p.spectral_albedo.values[-1] == 0.93


def test_uplift_neutral_preserved():
    rgb = jnp.asarray([[0.8, 0.8, 0.8]])
    for lam in (400.0, 550.0, 700.0):
        v = float(uplift.rgb_to_spectral_value(rgb, jnp.asarray([lam]))[0])
        assert v >= 0.8 - 1e-6  # neutral keeps max(rgb)


def test_uplift_red_channel_gating():
    rgb = jnp.asarray([[1.0, 0.0, 0.0]])
    at_650 = float(uplift.rgb_to_spectral_value(rgb, jnp.asarray([650.0]))[0])
    at_450 = float(uplift.rgb_to_spectral_value(rgb, jnp.asarray([450.0]))[0])
    assert at_650 > 0.95  # peak + bright-pixel floor
    # Pure red below 520nm: no red lobe, but bright-pixel preservation
    # forces >= 0.8·max — the reference's brightness-floor quirk.
    assert abs(at_450 - 0.8) < 1e-6


def test_uplift_bucketed_matches_formula_at_nodes():
    rgb = jnp.tile(jnp.asarray([[0.3, 0.6, 0.1]]), (3, 1))
    lam = jnp.asarray([450.0, 550.0, 650.0])  # exact 5nm nodes
    a = np.asarray(uplift.rgb_to_spectral_value(rgb, lam))
    b = np.asarray(uplift.eval_bucketed(rgb, lam))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_porcelain_renders_spectrally():
    from izpi_tpu.integrator import path as path_mod
    from izpi_tpu.render import renderer
    from izpi_tpu.scene import types as st
    from izpi_tpu.spectral import spd as spd_mod

    porcelain = presets.get_material("porcelain")
    light = st.DiffuseLight(spectral_emit=st.SpectralNeutral(10.0))
    world = [
        st.Sphere((0, 1, 0), (0, 1, 0), 0, 1, 1.0, porcelain),
        st.XZRect(-5, 5, -5, 5, 0.0, porcelain),
        st.FlipNormals(st.XZRect(-2, 2, -2, 2, 5.0, light)),
    ]
    sc = st.Scene(world=world,
                  camera=st.Camera(look_from=(0, 2, -6), look_at=(0, 1, 0),
                                   vfov=40),
                  spectral=True,
                  spectral_background=spd_mod.SPD.constant(0.0))
    res = renderer.render(sc, 16, 16, 8,
                          settings=path_mod.RenderSettings(max_depth=5),
                          seed=2)
    assert np.isfinite(res.image).all()
    assert res.image.max() > 0
