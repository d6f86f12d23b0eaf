"""Round-5: per-row-stack kernel vs the rebin union kernel on the dragon.

Times both traversals at 262k rays (camera + synthetic incoherent bounce
rays) on the real chip and cross-checks t/hit agreement.
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu import camera as camera_mod
from izpi_tpu.geometry import primitives as prim
from izpi_tpu.scene.compiler import compile_scene
from izpi_tpu.scene.library.extracted import (
    cornell_box_pbr_stanford_dragon_spectral)

n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 871_414
N = int(sys.argv[2]) if len(sys.argv) > 2 else 262144

scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0, n_tris=n_tris)
cs, meta = compile_scene(scene)
print("scene prims:", meta.n_prims, flush=True)

from izpi_tpu.ops import bvh_rowkernel

t0 = time.time()
cs_r, inter_r = bvh_rowkernel.attach(cs, seed=1)
print(f"row attach {time.time()-t0:.1f}s  nodes={inter_r.rs.ntab.shape[0]} "
      f"blocks={inter_r.rs.pblocks.shape[0]//8}", flush=True)

rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_cam, d_cam, tm = camera_mod.get_rays(cs_r.camera, s, t, u3)

# synthetic bounce rays: origins on scene surfaces-ish (inside box), random
# directions — the incoherent workload that killed the union kernel
lo, hi = np.asarray(inter_r.lo), np.asarray(inter_r.hi)
o_b = jnp.asarray(rs.rand(N, 3) * (hi - lo) + lo, jnp.float32)
d_b = jnp.asarray(rs.randn(N, 3), jnp.float32)


def timeit(name, fn, *args, reps=5):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:30s} {dt*1e3:8.1f} ms (compile {c:.0f}s)", flush=True)
    return out


@jax.jit
def run_row_cam():
    return inter_r(o_cam, d_cam, tm, 1e-3, prim.T_MAX)


@jax.jit
def run_row_bounce():
    return inter_r(o_b, d_b, tm, 1e-3, prim.T_MAX)


hit_cam = timeit("row kernel, camera", run_row_cam)
hit_b = timeit("row kernel, bounce", run_row_bounce)
print("camera hit rate:", float(np.asarray(hit_cam.hit).mean()), flush=True)
print("bounce hit rate:", float(np.asarray(hit_b.hit).mean()), flush=True)

# cross-check vs the production rebin kernel (t agreement where both hit)
from izpi_tpu.ops import bvh_kernel

t0 = time.time()
cs_u, inter_u = bvh_kernel.attach(cs, seed=1)
print(f"rebin attach {time.time()-t0:.1f}s", flush=True)


@jax.jit
def run_union_cam():
    return inter_u(o_cam, d_cam, tm, 1e-3, prim.T_MAX)


@jax.jit
def run_union_bounce():
    return inter_u(o_b, d_b, tm, 1e-3, prim.T_MAX)


hu_cam = timeit("rebin kernel, camera", run_union_cam)
hu_b = timeit("rebin kernel, bounce", run_union_bounce)

for name, a, b in (("camera", hit_cam, hu_cam), ("bounce", hit_b, hu_b)):
    ha, hb_ = np.asarray(a.hit), np.asarray(b.hit)
    agree = (ha == hb_).mean()
    m = ha & hb_
    tclose = np.allclose(np.asarray(a.t)[m], np.asarray(b.t)[m],
                         rtol=1e-4, atol=1e-4)
    print(f"{name}: hit agree {agree:.6f}, t close {tclose}", flush=True)
