"""A/B the megakernel cluster scan on shirley (flat vs clustered)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import numpy as np

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene.library import get_scene
from izpi_tpu.ops import megakernel

mode = sys.argv[1] if len(sys.argv) > 1 else "both"
nx = ny = 256
spp = 128
settings = path_mod.RenderSettings(max_depth=50, background=(0.7, 0.8, 1.0))
scene = get_scene("random_scene", aspect=1.0)
ctx = renderer.RenderContext(scene)


def run(tag):
    kwargs = dict(settings=settings, seed=0, context=ctx)
    renderer.render(None, nx, ny, spp, **kwargs)
    res = renderer.render(None, nx, ny, spp, **kwargs)
    print(f"{tag}: {res.mrays_per_sec:.1f} Mrays/s "
          f"({res.rays_traced} rays, {res.seconds:.2f}s)", flush=True)


if mode in ("both", "clustered"):
    run("clustered")
if mode in ("both", "flat"):
    megakernel.CLUSTER_MIN_PRIMS = 10 ** 9
    ctx._runners.clear()
    run("flat")
