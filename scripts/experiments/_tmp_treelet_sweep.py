"""Sweep treelet_target for the dragon rebin traversal."""
import sys; sys.path.insert(0, "/root/repo")
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

scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0)
cs, meta = compile_scene(scene)
N = 1 << 18
rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_c, d_c, tm = camera_mod.get_rays(cs.camera, s, t, u3)

o_b = d_b = None
for target in (int(x) for x in (sys.argv[1:] or [50, 200, 400])):
    t0 = time.time()
    cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=True,
                                   treelet_target=target)
    print(f"T={inter.treelets.shape[0]} attach {time.time()-t0:.1f}s",
          flush=True)
    trav = jax.jit(lambda o, d, tm: inter(o, d, tm, 1e-3, prim.T_MAX))
    rec = jax.block_until_ready(trav(o_c, d_c, tm))
    t0 = time.time()
    rec = jax.block_until_ready(trav(o_c, d_c, tm))
    dt = time.time() - t0
    print(f"  camera {dt*1e3:7.1f} ms ({N/dt/1e6:5.2f} M/s)", flush=True)
    if o_b is None:
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
    dt = time.time() - t0
    print(f"  bounce {dt*1e3:7.1f} ms ({N/dt/1e6:5.2f} M/s)", flush=True)
