"""The full built-in scene library: extraction parity + registry coverage.

Reference: internal/scenes/*.go — 25 constructors. Proto-literal scenes are
extracted to data/*.pbtxt by scripts/extract_go_scenes.py; imperative ones
(Environment, CornellBoxObj, DisplacementTest, TextureMappedSphere, dragon)
are rebuilt in Python with procedural stand-ins for missing user assets.
"""

import warnings

import numpy as np
import pytest

from izpi_tpu.scene import types as st
from izpi_tpu.scene.compiler import compile_scene
from izpi_tpu.scene.library import REGISTRY, extracted, get_scene, misc

# Reference scene constructors that must all exist in the registry
# (snake_cased names; scenes.go/pbr.go/spectral.go/water.go `func New…`).
REFERENCE_SCENES = [
    "random_scene", "two_spheres", "two_perlin_spheres",
    "texture_mapped_sphere", "simple_light", "cornell_box", "final",
    "environment", "cornell_box_obj", "displacement_test",
    "cornell_box_pb", "cornell_box_rgb", "cornell_box_spectral",
    "cornell_box_prism_spectral", "cornell_box_prism_spectral_enhanced",
    "cornell_box_diamonds_spectral", "cornell_box_colored_glass_spectral",
    "cornell_box_water_spectral", "cornell_box_transparent_pyramid_spectral",
    "cornell_box_pbr_rgb", "cornell_box_pbr_spectral",
    "cornell_box_empty_spectral", "cornell_box_pbr_coloured_glass_spectral",
    "cornell_box_pbr_stanford_dragon_spectral",
    "cornell_box_empty_displacement_spectral",
]


def test_registry_covers_reference_inventory():
    missing = [n for n in REFERENCE_SCENES if n not in REGISTRY]
    assert not missing, f"registry missing reference scenes: {missing}"


def test_extracted_scene_matches_go_literal_values():
    """Spot-check extracted data against values read from the Go source
    (scenes.go:1831 CornellBoxPrismSpectral)."""
    sc = extracted.load_extracted("cornell_box_prism_spectral")
    assert sc.spectral
    assert sc.camera.look_from == (50.0, 50.0, -140.0)
    assert sc.camera.vfov == 40.0
    # 20 triangles + 1 sphere.
    meshes = [h for h in sc.world if isinstance(h, st.TriangleMesh)]
    spheres = [h for h in sc.world if isinstance(h, st.Sphere)]
    assert sum(m.vertices.shape[0] for m in meshes) == 20
    assert len(spheres) == 1
    # The "Green" wall material: Gaussian peak 0.9 @540nm width 40.
    mats = {type(m.material).__name__ for m in meshes}
    assert "Lambertian" in mats or "Dielectric" in mats
    greens = [m.material.spectral_albedo for m in meshes
              if isinstance(m.material, st.Lambertian)
              and isinstance(m.material.spectral_albedo, st.SpectralGaussian)
              and m.material.spectral_albedo.center == 540.0]
    assert greens and greens[0].peak == pytest.approx(0.9)
    assert greens[0].width == pytest.approx(40.0)
    # Glass dispersion table: 20 entries 1.52 → 1.42.
    glass = [m.material for m in meshes
             if isinstance(m.material, st.Dielectric)]
    assert glass and isinstance(glass[0].spectral_ref_idx,
                                st.SpectralTabulated)
    vals = glass[0].spectral_ref_idx.values
    assert len(vals) == 20
    assert vals[0] == pytest.approx(1.52) and vals[-1] == pytest.approx(1.42)


def test_all_extracted_scenes_compile():
    for name in extracted.EXTRACTED:
        if name == "cornell_box_pbr_stanford_dragon_spectral":
            continue  # covered (with mesh) below
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sc = extracted.load_extracted(name)
            cs, meta = compile_scene(sc)
        assert meta.n_prims > 0, name


def test_dragon_scene_mesh_scale():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sc = extracted.cornell_box_pbr_stanford_dragon_spectral(
            n_tris=20_000)
        cs, meta = compile_scene(sc)
    assert meta.n_prims > 19_000
    # The stand-in must sit inside the 100³ box near (50, 25, 60).
    mesh = [h for h in sc.world if isinstance(h, st.TriangleMesh)][-1]
    lo = mesh.vertices.reshape(-1, 3).min(axis=0)
    hi = mesh.vertices.reshape(-1, 3).max(axis=0)
    assert np.all(lo > -10) and np.all(hi < 115), (lo, hi)


def test_misc_scenes_render_smoke():
    from izpi_tpu.integrator import path as path_mod
    from izpi_tpu.render import renderer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = renderer.render(misc.environment(), 16, 16, 2,
                              settings=path_mod.RenderSettings(max_depth=4),
                              seed=1, mode="simple")
    img = res.image
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05  # the sky dome lights the frame


def test_displacement_test_scene_builds_displaced_floor():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sc = misc.displacement_test()
        cs, meta = compile_scene(sc)
    # Adaptive tessellation must have subdivided the two floor triangles.
    assert meta.n_prims > 100


def test_get_scene_unknown_raises():
    with pytest.raises(KeyError):
        get_scene("not_a_scene")
