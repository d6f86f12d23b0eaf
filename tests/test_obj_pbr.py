"""OBJ importer + PBR material tests."""

import os

import numpy as np
import jax.numpy as jnp

from izpi_tpu.geometry import wavefront_obj as obj_mod
from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene import types as st
from izpi_tpu.scene.compiler import compile_scene

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_obj_parse_cube():
    o = obj_mod.load_obj(os.path.join(DATA, "cube.obj"))
    assert len(o.vertices) == 8
    assert len(o.groups) == 3
    assert o.has_normals and o.has_uv
    assert o.mtl["redstuff"].kd == (0.9, 0.1, 0.05)
    assert o.mtl["redstuff"].ni == 1.45
    # quad group triangulates 0-1-2 / 0-2-3
    mesh = o.group_to_mesh(2, o.mtl["redstuff"].to_material())
    assert mesh.vertices.shape == (2, 3, 3)
    meshes = o.all_meshes()
    assert len(meshes) == 3
    assert meshes[0].uvs is not None and meshes[0].normals is not None


def test_obj_transforms():
    o = obj_mod.load_obj(os.path.join(DATA, "cube.obj"))
    o.scale((2.0, 2.0, 2.0))
    assert np.allclose(np.abs(np.asarray(o.vertices)), 2.0)
    o.translate((1.0, 0.0, 0.0))
    vs = np.asarray(o.vertices)
    assert vs[:, 0].min() == -1.0 and vs[:, 0].max() == 3.0
    # rotate 90° about Y: x' = x cos + z sin (about the centre (1,0,0))
    o2 = obj_mod.load_obj(os.path.join(DATA, "cube.obj"))
    o2.rotate(0.0, np.pi / 2, 0.0)
    vs2 = np.asarray(o2.vertices)
    assert np.allclose(np.abs(vs2), 1.0, atol=1e-12)


def test_obj_mesh_renders():
    o = obj_mod.load_obj(os.path.join(DATA, "cube.obj"))
    meshes = o.all_meshes()
    light = st.FlipNormals(st.XZRect(-2, 2, -2, 2, 4.0,
                                     st.DiffuseLight(emit=st.ConstantTexture((5, 5, 5)))))
    sc = st.Scene(world=meshes + [light],
                  camera=st.Camera(look_from=(0, 1.5, -6), look_at=(0, 0, 0),
                                   vfov=40))
    res = renderer.render(sc, 24, 24, 4,
                          settings=path_mod.RenderSettings(max_depth=4))
    assert np.isfinite(res.image).all()
    assert res.image.max() > 0


def _pbr_scene(normal_map=None):
    checker_r = st.ImageTexture(
        data=np.tile(np.array([[[0.1]], [[0.9]]], np.float32), (8, 16, 3))
    )
    pbr = st.PBR(
        albedo=st.ConstantTexture((0.7, 0.3, 0.2)),
        roughness=st.ConstantTexture((0.4, 0.4, 0.4)),
        metalness=st.ConstantTexture((0.3, 0.3, 0.3)),
        normal_map=normal_map,
    )
    world = [
        st.XZRect(-5, 5, -5, 5, 0.0, pbr),
        st.Sphere((0, 1, 0), (0, 1, 0), 0, 1, 1.0, pbr),
        st.FlipNormals(st.XZRect(-2, 2, -2, 2, 6.0,
                                 st.DiffuseLight(emit=st.ConstantTexture((8, 8, 8))))),
    ]
    return st.Scene(world=world,
                    camera=st.Camera(look_from=(0, 2, -7), look_at=(0, 1, 0),
                                     vfov=40))


def test_pbr_renders_statistically_sane():
    res = renderer.render(_pbr_scene(), 32, 32, 8,
                          settings=path_mod.RenderSettings(max_depth=6),
                          seed=9)
    img = res.image
    assert np.isfinite(img).all()
    # Albedo is reddish; the lit floor/sphere should show r > g > b.
    mid = img[8:28, 8:24].mean(axis=(0, 1))
    assert mid[0] > mid[1] > mid[2], mid
    assert img.max() > 1.0  # light visible somewhere or bright specular


def test_pbr_normal_map_changes_image():
    flat = st.ConstantTexture((0.5, 0.5, 1.0))     # identity tangent normal
    bent = st.ConstantTexture((0.9, 0.5, 1.0))     # tilted normal
    a = renderer.render(_pbr_scene(flat), 16, 16, 4,
                        settings=path_mod.RenderSettings(max_depth=4), seed=3)
    b = renderer.render(_pbr_scene(bent), 16, 16, 4,
                        settings=path_mod.RenderSettings(max_depth=4), seed=3)
    assert not np.allclose(a.image, b.image)


def test_pbr_meta_gating():
    cs, meta = compile_scene(_pbr_scene())
    assert meta.has_pbr
    from izpi_tpu.scene.library.cornell import cornell_box
    _, meta2 = compile_scene(cornell_box())
    assert not meta2.has_pbr
