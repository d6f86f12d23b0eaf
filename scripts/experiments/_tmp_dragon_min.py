"""Dragon traversal micro-bench on the real chip: sort vs rebin, camera vs
bounce rays. Temporary round-3 tuning harness."""
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

mode = sys.argv[1] if len(sys.argv) > 1 else "rebin"
n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 871_414
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6
target = int(sys.argv[4]) if len(sys.argv) > 4 else 48

scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0, n_tris=n_tris)
t0 = time.time()
cs, meta = compile_scene(scene)
print("scene", meta.n_prims, "prims", round(time.time() - t0, 1), flush=True)
t0 = time.time()
cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=(mode == "rebin"),
                               rounds=rounds, treelet_target=target)
print("attach", round(time.time() - t0, 1), "rebin:", inter.rebin,
      "T:", inter.treelets.shape[0], flush=True)

N = 1 << 16
rs = np.random.RandomState(0)

# camera rays: through the film like the real render
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_cam, d_cam, tm = camera_mod.get_rays(cs2.camera, s, t, u3)

def run(name, o, d):
    t0 = time.time()
    hit = inter(o, d, tm, 1e-3, prim.T_MAX)
    jax.block_until_ready(hit.t)
    compile_s = time.time() - t0
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        hit = inter(o, d, tm, 1e-3, prim.T_MAX)
    jax.block_until_ready(hit.t)
    dt = (time.time() - t0) / reps
    nhit = int(np.asarray(hit.hit).sum())
    print(f"{name:12s} {dt*1e3:8.1f} ms/{N} rays = {N/dt/1e6:6.2f} M/s  "
          f"hits {nhit}  (compile {compile_s:.0f}s)", flush=True)
    return hit

h = run("camera", o_cam, d_cam)

# bounce rays: cosine hemisphere from the camera-hit points
p = np.asarray(h.p)
n = np.asarray(h.normal)
hitm = np.asarray(h.hit)
# replicate hit points to fill N rays
idxs = np.nonzero(hitm)[0]
pick = idxs[rs.randint(0, len(idxs), N)]
o_b = p[pick] + n[pick] * 1e-3
z = rs.rand(N)
phi = 2 * np.pi * rs.rand(N)
sq = np.sqrt(np.maximum(1 - z, 0))
local = np.stack([np.cos(phi) * sq, np.sin(phi) * sq, np.sqrt(z)], -1)
w = n[pick]
a = np.where(np.abs(w[:, :1]) > 0.9, [[0., 1., 0.]], [[1., 0., 0.]])
v = np.cross(w, a); v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
u = np.cross(w, v)
d_b = (local[:, :1] * u + local[:, 1:2] * v + local[:, 2:3] * w)
run("bounce", jnp.asarray(o_b, jnp.float32), jnp.asarray(d_b, jnp.float32))
