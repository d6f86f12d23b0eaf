"""Displacement/tessellation invariants (the analog of
displacement_test.go:13-159)."""

import numpy as np

from izpi_tpu.geometry import displacement


def _quad():
    verts = np.array([
        [[0, 0, 0], [1, 0, 0], [1, 1, 0]],
        [[0, 0, 0], [1, 1, 0], [0, 1, 0]],
    ], np.float64)
    uvs = np.array([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float64)
    return verts, uvs


def test_tessellate_preserves_area_and_order():
    v, uv = _quad()
    v4, uv4 = displacement._tessellate(v, uv)
    assert v4.shape == (8, 3, 3)

    def area(tris):
        e1 = tris[:, 1] - tris[:, 0]
        e2 = tris[:, 2] - tris[:, 0]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()

    np.testing.assert_allclose(area(v4), area(v), atol=1e-12)
    # Child 0 keeps the parent's first vertex (displacement.go:52).
    np.testing.assert_array_equal(v4[0, 0], v[0, 0])


def test_flat_map_single_split():
    """A constant displacement map has zero variation → only the UV
    criterion drives splitting; with a tiny map every triangle stops after
    the mandatory first split."""
    v, uv = _quad()
    dmap = np.full((2, 2, 3), 0.5)
    out_v, out_uv = displacement.apply_displacement_map(v, uv, dmap, 0.0, 1.0)
    assert out_v.shape[0] == 8  # one mandatory split, then done
    # Flat 0.5 map displaces by 0.5 along +z (normal of CCW quad).
    np.testing.assert_allclose(out_v[:, :, 2], 0.5, atol=1e-12)


def test_varying_map_refines_more():
    v, uv = _quad()
    rs = np.random.RandomState(0)
    rough = np.zeros((64, 64, 3))
    rough[..., 2] = rs.rand(64, 64)
    flat = np.full((64, 64, 3), 0.25)
    out_rough, _ = displacement.apply_displacement_map(v, uv, rough, 0, 10.0)
    out_flat, _ = displacement.apply_displacement_map(v, uv, flat, 0, 10.0)
    assert out_rough.shape[0] > out_flat.shape[0]


def test_displaced_scene_renders():
    from izpi_tpu.integrator import path as path_mod
    from izpi_tpu.render import renderer
    from izpi_tpu.scene import types as st

    v, uv = _quad()
    # Bumpy height field.
    yy, xx = np.mgrid[0:16, 0:16]
    dmap = np.zeros((16, 16, 3))
    dmap[..., 2] = 0.5 + 0.5 * np.sin(xx) * np.sin(yy)
    mesh = st.TriangleMesh(
        vertices=v * 4.0, uvs=uv,
        material=st.Lambertian(albedo=st.ConstantTexture((0.6, 0.6, 0.6))))
    bumpy = displacement.displace_mesh(mesh, dmap, 0.0, 0.5)
    assert bumpy.vertices.shape[0] > 2
    light = st.FlipNormals(st.XZRect(0, 4, 0, 4, 6.0,
                                     st.DiffuseLight(emit=st.ConstantTexture((8, 8, 8)))))
    sc = st.Scene(world=[bumpy, light],
                  camera=st.Camera(look_from=(2, 3, -6), look_at=(2, 1, 0),
                                   vfov=45))
    res = renderer.render(sc, 16, 16, 4,
                          settings=path_mod.RenderSettings(max_depth=4))
    assert np.isfinite(res.image).all()
