"""Round-5 (VERDICT r4 #8): measure the engine-choice policy.

Sweeps primitive count across the BVH_THRESHOLD=512 crossover and races
the three single-chip engines on each scene:
  mega      — Pallas megakernel (unrolled scan; eligible to 560 prims)
  pool+mxu  — XLA wavefront pool + MXU brute intersector (use_bvh=False)
  pool+bvh  — XLA wavefront pool + Pallas BVH kernel   (use_bvh=True)
Writes the table to stdout; docs/PERF.md cites the result next to the
constant it validates (render/renderer.py BVH_THRESHOLD).
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene import types as st

NX = 128
SPP = 64
DEPTH = 8


def tri_scene(p):
    rs = np.random.RandomState(7)
    mat = st.Lambertian(albedo=st.ConstantTexture((0.6, 0.55, 0.5)))
    light = st.FlipNormals(st.XZRect(
        -2, 2, -2, 2, 12.0, st.DiffuseLight(emit=st.ConstantTexture(
            (14.0, 14.0, 14.0)))))
    tris = []
    for _ in range(p - 1):
        v0 = rs.rand(3) * 12.0 - 6.0
        tris.append(st.Triangle(v0=tuple(v0),
                                v1=tuple(v0 + rs.rand(3) * 0.8),
                                v2=tuple(v0 + rs.rand(3) * 0.8),
                                material=mat))
    return st.Scene(world=tris + [light],
                    camera=st.Camera(look_from=(0, 2, -18),
                                     look_at=(0, 0, 0), vfov=45,
                                     aspect=1.0))


def run(scene, mode, use_bvh):
    try:
        ctx = renderer.RenderContext(scene, use_bvh=use_bvh)
        kw = dict(settings=path_mod.RenderSettings(max_depth=DEPTH),
                  seed=0, context=ctx, mode=mode)
        renderer.render(None, NX, NX, SPP, **kw)
        vals = []
        for _ in range(3):
            res = renderer.render(None, NX, NX, SPP, **kw)
            vals.append(res.mrays_per_sec)
        return float(np.median(vals))
    except Exception as e:
        print(f"  ({type(e).__name__}: {str(e)[:80]})", flush=True)
        return float("nan")


for p in (128, 512, 2048):
    scene = tri_scene(p)
    row = {"prims": p}
    if p <= 560:
        row["mega"] = round(run(scene, "mega", False), 1)
    row["pool+mxu"] = round(run(scene, "pool", False), 1)
    row["pool+bvh"] = round(run(scene, "pool", True), 1)
    print(row, flush=True)
