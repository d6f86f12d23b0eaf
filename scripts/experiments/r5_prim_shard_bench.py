"""Round-5 (VERDICT r4 #6): race the prim-sharded dragon renderer vs the
replicated sample-sharded renderer on the 8-device CPU mesh and record the
result into SCALING_r05.json.

CPU-mesh wall-clock measures 8 threads on 2 host cores, so the absolute
numbers are meaningless; what the entry documents is (a) exact correctness
of the prim-sharded image at dragon-class geometry and (b) the relative
cost structure (per-bounce pmin/psum reductions vs replicated traversal).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.parallel import dist
from izpi_tpu.scene.library.extracted import (
    cornell_box_pbr_stanford_dragon_spectral)

N_TRIS = int(os.environ.get("IZPI_PRIMSHARD_TRIS", "20000"))
scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0, n_tris=N_TRIS)
settings = path_mod.RenderSettings(max_depth=4)

out = {}
for tag, kwargs in (("prim_sharded", dict(shard_prims=True)),
                    ("replicated", dict())):
    t0 = time.time()
    res = dist.render_distributed(scene, 16, 16, 8,
                                  mesh=dist.make_mesh(8),
                                  settings=settings, seed=0, warmup=True,
                                  **kwargs)
    out[tag] = dict(seconds=round(res.seconds, 3),
                    mrays=round(res.mrays_per_sec, 4),
                    rays=int(res.rays_traced))
    print(tag, out[tag], flush=True)
    if tag == "prim_sharded":
        img_a = res.image
    else:
        np.testing.assert_allclose(img_a, res.image, rtol=1e-3, atol=1e-4)
        print("prim-sharded image matches replicated", flush=True)

rec = {}
if os.path.exists("SCALING_r05.json"):
    rec = json.load(open("SCALING_r05.json"))
rec["dragon_prim_sharded_cpu_mesh"] = dict(
    n_tris=N_TRIS, frame="16x16@8spp depth4", **out,
    note=("8 virtual devices / 2 host cores: correctness real, wall-clock "
          "not. Single-chip projection: prim-sharding adds one pmin + "
          "seven psum reductions per bounce over ICI (~n_rays*44B), and "
          "each chip traverses a BVH over 1/8 of the geometry — the path "
          "exists for scenes whose SoA exceeds one chip's HBM, not for "
          "speed at dragon scale (the 871k-tri SoA is ~100 MB, "
          "replicable)."))
json.dump(rec, open("SCALING_r05.json", "w"), indent=1)
print("written", flush=True)
