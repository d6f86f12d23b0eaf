"""pbtxt scene loader + light-source library tests."""

import numpy as np

from izpi_tpu.scene import pbtxt, types as st
from izpi_tpu.scene.compiler import compile_scene
from izpi_tpu.spectral import lightsources

SPECTRAL_SCENE = """
name: "mini spectral"
version: "1.0.0"
colour_representation: SPECTRAL
camera {
  lookfrom { x: 50 y: 50 z: -140 }
  lookat { x: 50 y: 50 z: 0 }
  vup { y: 1 }
  vfov: 40
  aspect: 1
  focusdist: 10
  time1: 1
}
materials {
  key: "White"
  value {
    name: "White"
    type: LAMBERT
    lambert {
      spectral_albedo { neutral { reflectance: 0.73 } }
    }
  }
}
materials {
  key: "Green"
  value {
    name: "Green"
    type: LAMBERT
    lambert {
      spectral_albedo {
        gaussian { peak_value: 0.9 center_wavelength: 540 width: 40 }
      }
    }
  }
}
materials {
  key: "lamp"
  value {
    name: "lamp"
    type: DIFFUSE_LIGHT
    diffuselight {
      spectral_emit {
        from_light_source_library { light_source_name: "cie_illuminant_a_2856k" }
      }
    }
  }
}
objects {
  triangles {
    vertex0 { x: 0 y: 0 z: 100 }
    vertex1 { x: 100 y: 0 z: 100 }
    vertex2 { x: 100 y: 100 z: 100 }
    uv0 { u: 0 v: 0 }
    uv1 { u: 1 v: 0 }
    uv2 { u: 1 v: 1 }
    material_name: "White"
  }
  triangles {
    vertex0 { x: 0 y: 99 z: 40 }
    vertex1 { x: 100 y: 99 z: 40 }
    vertex2 { x: 100 y: 99 z: 60 }
    material_name: "lamp"
  }
  spheres {
    center { x: 50 y: 20 z: 50 }
    radius: 15
    material_name: "Green"
  }
}
spectral_background {
  wavelengths: 380
  wavelengths: 750
  values: 0
  values: 0
}
"""

RGB_SCENE = """
colour_representation: RGB
camera { lookfrom { z: -5 } lookat {} vfov: 40 aspect: 1 }
materials {
  key: "m"
  value { type: METAL metal { albedo { x: 0.7 y: 0.6 z: 0.5 } fuzz: 0.1 } }
}
materials {
  key: "g"
  value { type: DIELECTRIC dielectric { refidx: 1.5 absorption_coeff { x: 0.1 y: 0.2 z: 0.3 } } }
}
objects {
  spheres { center { y: 1 } radius: 1 material_name: "m" }
  spheres { center { y: -1 } radius: 1 material_name: "g" }
}
"""


def test_parse_spectral_scene(tmp_path):
    p = tmp_path / "s.pbtxt"
    p.write_text(SPECTRAL_SCENE)
    scene = pbtxt.load_scene(str(p))
    assert scene.spectral
    assert scene.camera.look_from == (50.0, 50.0, -140.0)
    cs, meta = compile_scene(scene)
    assert meta.spectral
    assert meta.n_prims == 3  # 2 tris (2 meshes) + 1 sphere
    assert meta.n_lights == 1  # the lamp triangle
    # Light source SPD landed in the SPD stack (non-zero rows).
    assert np.asarray(cs.spd_table).shape[0] >= 3


def test_parse_rgb_scene():
    scene = pbtxt.scene_from_tree(pbtxt.parse_pbtxt(RGB_SCENE))
    assert not scene.spectral
    mats = {type(h.material).__name__ for h in scene.world}
    assert mats == {"Metal", "Dielectric"}
    cs, meta = compile_scene(scene)
    assert meta.has_absorbing_dielectric


def test_parser_handles_repeats_and_escapes():
    tree = pbtxt.parse_pbtxt('a: 1 a: 2 b { c: "x\\"y" } d: IDENT')
    assert tree["a"] == [1.0, 2.0]
    assert tree["b"]["c"] == 'x"y'
    assert tree["d"] == "IDENT"


def test_lightsources_library():
    names = lightsources.list_light_sources()
    assert len(names) == 42
    spd = lightsources.get_light_source("laser_red_650nm")
    # Monochromatic: the reference's table actually peaks at index 28
    # (= 520 nm) despite its name/comment claiming 650 nm — data kept
    # faithful (lightsources.go:455 laser_red_650nm).
    assert spd.value(520.0) > 0.5
    assert spd.value(650.0) == 0.0
    assert (np.asarray(spd.values) > 0).sum() == 1
    a = lightsources.get_light_source("cie_illuminant_a_2856k")
    assert abs(a.values.max() - 1.0) < 1e-12
    try:
        lightsources.get_light_source("nope")
        assert False
    except KeyError:
        pass
