"""Row-kernel diagnosis: body-iteration and leaf-serve counts per tile.

Splits H1 (rows visit too many leaves — union fatness) from H2 (per-body
mechanics cost) for camera vs incoherent rays on the dragon.
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu import camera as camera_mod
from izpi_tpu.scene.compiler import compile_scene
from izpi_tpu.scene.library.extracted import (
    cornell_box_pbr_stanford_dragon_spectral)
from izpi_tpu.ops import bvh_rowkernel
from izpi_tpu.geometry import primitives as prim

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0)
cs, meta = compile_scene(scene)
cs_r, inter = bvh_rowkernel.attach(cs, seed=1)
fn = inter._fn(N)

rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_cam, d_cam, tm = camera_mod.get_rays(cs_r.camera, s, t, u3)
lo, hi = np.asarray(inter.lo), np.asarray(inter.hi)
o_b = jnp.asarray(rs.rand(N, 3) * (hi - lo) + lo, jnp.float32)
d_b = jnp.asarray(rs.randn(N, 3), jnp.float32)


def sortit(o, d):
    keys = bvh_rowkernel.sort_keys(o, d, inter.lo, inter.hi)
    order = jnp.argsort(keys)
    return o[order], d[order], tm[order]


for name, (o, d, tmm) in (("camera", sortit(o_cam, d_cam)),
                          ("bounce", sortit(o_b, d_b))):
    t0 = time.time()
    tt, idx, stats = fn(o, d, tmm, 1e-3, prim.T_MAX, with_stats=True)
    jax.block_until_ready(tt)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        out = fn(o, d, tmm, 1e-3, prim.T_MAX, with_stats=True)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    st = np.asarray(stats)
    iters = st[:, 0]
    serves = st[:, 1]
    print(f"{name}: {dt*1e3:.1f} ms ({c:.0f}s compile) | body iters/tile "
          f"mean {iters.mean():.0f} p50 {np.percentile(iters,50):.0f} "
          f"max {iters.max()} | leaf serves/tile mean {serves.mean():.0f} "
          f"(per row {serves.mean()/8:.1f}) | "
          f"us/body {dt/iters.sum()*1e6:.2f}", flush=True)
