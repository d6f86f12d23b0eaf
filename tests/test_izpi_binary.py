"""Binary .izpi wire-format decoder tests (hand-encoded fixtures)."""

import struct

import numpy as np

from izpi_tpu.scene import izpi_binary, pbtxt
from izpi_tpu.scene.compiler import compile_scene


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _f32(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _vec3(field: int, x, y, z) -> bytes:
    return _len_delim(field, _f32(1, x) + _f32(2, y) + _f32(3, z))


def _string(field: int, s: str) -> bytes:
    return _len_delim(field, s.encode())


def _enum(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _mini_scene_bytes() -> bytes:
    camera = (
        _vec3(1, 0, 2, -9) + _vec3(2, 0, 1, 0) + _vec3(3, 0, 1, 0)
        + _f32(4, 40.0) + _f32(5, 1.0) + _f32(7, 10.0) + _f32(9, 1.0)
    )
    lambert = _len_delim(6, _len_delim(1, (
        _enum(2, 1)  # type CONSTANT
        + _len_delim(3, _vec3(1, 0.6, 0.2, 0.2))
    )))
    mat_red = _string(1, "red") + _enum(2, 4) + lambert
    light_mat = (
        _string(1, "lamp") + _enum(2, 2)
        + _len_delim(4, _len_delim(1, (
            _enum(2, 1) + _len_delim(3, _vec3(1, 9, 9, 9)))))
    )
    materials = (
        _len_delim(5, _string(1, "red") + _len_delim(2, mat_red))
        + _len_delim(5, _string(1, "lamp") + _len_delim(2, light_mat))
    )
    sphere = _len_delim(2, _vec3(1, 0, 1, 0) + _f32(2, 1.0)
                        + _string(3, "red"))
    # Wound so the normal faces DOWN (one-sided emitter toward the sphere).
    tri = _len_delim(1, (
        _vec3(1, -3, 4, -3) + _vec3(2, 3, 4, -3) + _vec3(3, 3, 4, 3)
        + _string(10, "lamp")))
    objects = _len_delim(8, sphere + tri)
    scene = (
        _string(1, "bin test") + _string(2, "1.0") + _enum(3, 1)  # RGB
        + _len_delim(4, camera) + materials + objects
    )
    return scene


def test_decode_mini_scene(tmp_path):
    p = tmp_path / "mini.izpi"
    p.write_bytes(_mini_scene_bytes())
    tree = izpi_binary.load_tree(str(p))
    assert tree["name"] == "bin test"
    assert tree["colour_representation"] == "RGB"
    assert abs(tree["camera"]["vfov"] - 40.0) < 1e-6

    scene = pbtxt.load_scene(str(p))
    cs, meta = compile_scene(scene)
    assert meta.n_prims == 2
    assert meta.n_lights == 1
    assert not meta.spectral


def test_decode_renders(tmp_path):
    from izpi_tpu.integrator import path as path_mod
    from izpi_tpu.render import renderer

    p = tmp_path / "mini.izpi"
    p.write_bytes(_mini_scene_bytes())
    scene = pbtxt.load_scene(str(p))
    res = renderer.render(scene, 12, 12, 4,
                          settings=path_mod.RenderSettings(max_depth=4))
    assert np.isfinite(res.image).all()
    assert res.image.max() > 0
