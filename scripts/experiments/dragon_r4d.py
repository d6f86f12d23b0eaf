"""Final round-4 dragon measure: v3 + 8-row binning kernel, default attach
(rounds=3, target=512), traverse timing + end-to-end bench config."""
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

N = 1 << 18
scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0)
cs, meta = compile_scene(scene)
cs2, inter = bvh_kernel.attach(cs, seed=1)
print(f"T={inter.treelets.shape[0]} rounds={inter.rounds} "
      f"rebin={inter.rebin}", flush=True)

rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_c, d_c, tm = camera_mod.get_rays(cs.camera, s, t, u3)
rec = prim.intersect_brute(cs.prims, o_c[:4096], d_c[:4096], tm[:4096],
                           1e-3, prim.T_MAX)
rec = jax.device_get(rec)
ids = np.nonzero(np.asarray(rec.hit))[0]
p = np.asarray(rec.p)[ids]
nrm = np.asarray(rec.normal)[ids]
pick = rs.randint(0, len(ids), N)
w = rs.randn(N, 3)
w /= np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-9)
flip = (w * nrm[pick]).sum(1) < 0
w[flip] = -w[flip]
o_b = jnp.asarray(p[pick] + nrm[pick] * 1e-3, jnp.float32)
d_b = jnp.asarray(w, jnp.float32)

trav = jax.jit(lambda o, d, tm: inter(o, d, tm, 1e-3, prim.T_MAX))
for label, o, d in (("camera", o_c, d_c), ("bounce", o_b, d_b)):
    out = jax.block_until_ready(trav(o, d, tm))
    t0 = time.time()
    out = jax.block_until_ready(trav(o, d, tm))
    dt = time.time() - t0
    print(f"traverse {label}: {dt*1e3:8.1f} ms ({N/dt/1e6:6.2f} M/s)",
          flush=True)

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer

ctx = renderer.RenderContext(scene)
settings = path_mod.RenderSettings(max_depth=16, background=(0, 0, 0))
kw = dict(settings=settings, seed=0, context=ctx, sampler_type="colour")
renderer.render(None, 256, 256, 8, **kw)
res = renderer.render(None, 256, 256, 8, **kw)
print(f"dragon 256^2@8 e2e: {res.mrays_per_sec:.3f} Mrays/s "
      f"({res.rays_traced} rays, {res.seconds:.2f}s)", flush=True)
