"""I/O writers, postprocess, scene registry, CLI smoke."""

import os
import subprocess
import sys

import numpy as np

from izpi_tpu.io import output, postprocess


def test_png_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(8, 12, 3).astype(np.float32)
    p = str(tmp_path / "t.png")
    output.write_png(p, img)
    back = output.read_image(p)
    # PNG path applies gamma-2+clamp; undo for comparison.
    np.testing.assert_allclose(back ** 2, np.clip(img, 0, 1), atol=0.02)


def test_exr_roundtrip(tmp_path):
    img = (np.random.RandomState(1).rand(7, 9, 3) * 10).astype(np.float32)
    p = str(tmp_path / "t.exr")
    output.write_exr(p, img, aces=True)
    back = output._read_exr(p)
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_pfm_hdr_roundtrip(tmp_path):
    img = (np.random.RandomState(2).rand(5, 6, 3) * 4).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    output.write_pfm(p, img)
    np.testing.assert_allclose(output._read_pfm(p), img, atol=1e-7)
    p2 = str(tmp_path / "t.hdr")
    output.write_hdr(p2, img)  # write-only smoke (reader needs imageio plugin)


def test_postprocess_pipeline():
    img = np.array([[[0.25, 4.0, -1.0]]])
    out = postprocess.Pipeline([postprocess.Gamma(), postprocess.Clamp()]) \
        .apply(img)
    np.testing.assert_allclose(out[0, 0], [0.5, 1.0, 0.0])


def test_cube_lut(tmp_path):
    # Identity 2-point LUT.
    cube = "LUT_3D_SIZE 2\n0 0 0\n1 0 0\n0 1 0\n1 1 0\n0 0 1\n1 0 1\n0 1 1\n1 1 1\n"
    p = str(tmp_path / "id.cube")
    open(p, "w").write(cube)
    lut = postprocess.ColourGrading.from_cube_file(p)
    img = np.random.RandomState(3).rand(4, 4, 3)
    np.testing.assert_allclose(lut.apply(img), img, atol=1e-12)


def test_scene_registry():
    from izpi_tpu.scene.library import REGISTRY, get_scene
    from izpi_tpu.scene.compiler import compile_scene

    assert len(REGISTRY) >= 8
    for name in ("random_scene", "two_spheres", "simple_light"):
        cs, meta = compile_scene(get_scene(name, aspect=1.0))
        assert meta.n_prims > 0


def test_cli_smoke(tmp_path):
    out = str(tmp_path / "o.png")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from izpi_tpu.cli import main;"
         f"main(['--scene','cornell_box','-x','16','-y','16',"
         f"'--samples','2','--sampler','colour','--max-depth','3',"
         f"'--output-file',r'{out}'])"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    assert "Rendering completed" in r.stdout


def test_preview_server_serves_live_png(tmp_path):
    """Live display analog (internal/display): the preview server serves the
    progressive PNG and an auto-refresh page over HTTP."""
    import urllib.request

    import numpy as np

    from izpi_tpu.io import display as display_mod
    from izpi_tpu.io import output as output_mod

    path = str(tmp_path / "p.png")
    output_mod.write_png(path, np.full((4, 4, 3), 0.5, np.float32))
    srv = display_mod.PreviewServer(path, port=0).start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=5).read()
        assert b"preview.png" in page
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/preview.png", timeout=5).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # file updates are picked up (no caching)
        output_mod.write_png(path, np.zeros((4, 4, 3), np.float32))
        png2 = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/preview.png", timeout=5).read()
        assert png2 != png
    finally:
        srv.stop()
