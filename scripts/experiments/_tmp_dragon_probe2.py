"""Dragon rebin timing: whole-traverse cost at several pool sizes, camera
vs diffuse rays, with the multi-root-rounds code. Also one full mini render."""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial

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
t0 = time.time()
cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=True)
print(f"attach {time.time()-t0:.1f}s  T={inter.treelets.shape[0]} "
      f"nodes={inter.ks.ntab.shape[0]}", flush=True)

for N in (1 << 18,):
    rs = np.random.RandomState(0)
    s = jnp.asarray(rs.rand(N), jnp.float32)
    t = jnp.asarray(rs.rand(N), jnp.float32)
    u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
    o_c, d_c, tm = camera_mod.get_rays(cs.camera, s, t, u3)

    trav = jax.jit(lambda o, d, tm: inter(o, d, tm, 1e-3, prim.T_MAX))
    rec = jax.block_until_ready(trav(o_c, d_c, tm))
    t0 = time.time()
    rec = jax.block_until_ready(trav(o_c, d_c, tm))
    dt_c = time.time() - t0
    print(f"N={N}: camera rays {dt_c*1e3:7.1f} ms ({N/dt_c/1e6:6.2f} M/s)",
          flush=True)

    # diffuse bounce rays from hit points
    hitm = np.asarray(rec.hit)
    p = np.asarray(rec.p)
    ids = np.nonzero(hitm)[0]
    pick = ids[rs.randint(0, len(ids), N)]
    w = rs.randn(N, 3)
    w /= np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-9)
    o_b = jnp.asarray(p[pick] + w * 1e-3, jnp.float32)
    d_b = jnp.asarray(w, jnp.float32)
    jax.block_until_ready(trav(o_b, d_b, tm))
    t0 = time.time()
    jax.block_until_ready(trav(o_b, d_b, tm))
    dt_b = time.time() - t0
    print(f"N={N}: bounce rays {dt_b*1e3:7.1f} ms ({N/dt_b/1e6:6.2f} M/s)",
          flush=True)
