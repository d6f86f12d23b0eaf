"""Probe the BVH kernel's fixed vs variable cost at dragon scale."""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu import camera as camera_mod
from izpi_tpu.geometry import primitives as prim
from izpi_tpu.ops import bvh_kernel
from izpi_tpu.scene.compiler import compile_scene
from izpi_tpu.scene.library.extracted import (
    cornell_box_pbr_stanford_dragon_spectral)

n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 871_414
scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0, n_tris=n_tris)
cs, meta = compile_scene(scene)
print("scene", meta.n_prims, flush=True)
t0 = time.time()
cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=False)
print("attach", round(time.time() - t0, 1), "T:", inter.treelets.shape[0],
      flush=True)

N = 1 << 16
rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o, d, tm = camera_mod.get_rays(cs2.camera, s, t, u3)
fn = inter._fn(N)

tile = bvh_kernel.TS * 128
n_grid = -(-N // tile)

def timeit(name, starts=None, tcap=None, n=5):
    t0 = time.time()
    out = fn(o, d, tm, 1e-3, prim.T_MAX, starts=starts, tcap=tcap,
             raw_idx=True)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(o, d, tm, 1e-3, prim.T_MAX, starts=starts, tcap=tcap,
                 raw_idx=True)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:8.1f} ms  (compile {c:.0f}s)  "
          f"hits {int((np.asarray(out[1]) >= 0).sum())}", flush=True)

# 1. all-dead windows: pure fixed cost (pop root once per tile)
timeit("dead windows", tcap=jnp.full((N,), 1e-3, jnp.float32))
# 2. full traversal from root, unsorted camera rays
timeit("camera full-tree")
# 3. sorted camera rays (coherent tiles)
keys = bvh_kernel.sort_keys(o, d, inter.lo, inter.hi, inter.treelets)
order = jnp.argsort(keys)
o, d, tm = o[order], d[order], tm[order]
timeit("camera sorted full-tree")
# 4. confined: every tile starts at its majority treelet
tl = bvh_kernel.treelet_ids(o, d, inter.treelets)
mids = np.minimum(np.arange(n_grid) * tile + tile // 2, N - 1)
starts = inter.treelet_nodes[tl[mids]]
timeit("camera sorted confined", starts=starts)
