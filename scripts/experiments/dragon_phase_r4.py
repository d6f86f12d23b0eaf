"""Round-4 dragon phase breakdown: where do the ~800 ms of one incoherent
traverse go? Times each piece separately on the chip:
  - treelet entry matrix + argmin (the O(nT) binning math)
  - the 262k argsort + ray re-gather
  - ONE confined kernel pass (round-1 conditions: pure tiles, single roots)
  - ONE full-root kernel pass (the saturated union baseline)
  - the production __call__ (sort + rounds + cleanup)
"""
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

target = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N = 1 << 18
scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0)
cs, meta = compile_scene(scene)
cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=True, treelet_target=target)
T = inter.treelets.shape[0]
print(f"T={T} nodes={inter.ks.ntab.shape[0]}", flush=True)

rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_c, d_c, tm = camera_mod.get_rays(cs.camera, s, t, u3)

sub = 4096
rec = prim.intersect_brute(cs.prims, o_c[:sub], d_c[:sub], tm[:sub], 1e-3,
                           prim.T_MAX)
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

tile = bvh_kernel.TS * 128
n_grid = N // tile
fn = inter._fn(N)


def timeit(name, f, *args):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    print(f"{name:40s} {(time.perf_counter()-t0)*1e3:9.2f} ms", flush=True)
    return out


@jax.jit
def binning(o, d):
    entry = bvh_kernel.treelet_entries(o, d, inter.treelets)
    morton = bvh_kernel.sort_keys(o, d, inter.lo, inter.hi)
    tl0 = jnp.argmin(entry, axis=1).astype(jnp.int32)
    key0 = jnp.where(jnp.any(jnp.isfinite(entry), axis=1), tl0, T)
    return entry, (key0 << 20) | (morton >> 4), key0


@jax.jit
def sort_gather(o, d, keyfull):
    order = jnp.argsort(keyfull)
    return o[order], d[order], order


@jax.jit
def confined_pass(o_s, d_s, tm, key0_s):
    mids = jnp.minimum(jnp.arange(n_grid, dtype=jnp.int32) * tile + tile // 2,
                       N - 1)
    tl = jnp.minimum(key0_s[mids], T - 1)
    starts = inter.treelet_nodes[tl]
    return fn(o_s, d_s, tm, 1e-3, prim.T_MAX, starts=starts, raw_idx=True)


@jax.jit
def root_pass(o_s, d_s, tm):
    return fn(o_s, d_s, tm, 1e-3, prim.T_MAX, raw_idx=True)


trav = jax.jit(lambda o, d, tm: inter(o, d, tm, 1e-3, prim.T_MAX))

for label, o, d in (("camera", o_c, d_c), ("bounce", o_b, d_b)):
    print(f"--- {label} ---", flush=True)
    entry, keyfull, key0 = timeit("binning (entry+argmin+keys)", binning, o, d)
    o_s, d_s, order = timeit("argsort + ray gather", sort_gather, o, d,
                             keyfull)
    key0_s = key0[order]
    timeit("kernel: confined single-root pass", confined_pass, o_s, d_s, tm,
           key0_s)
    timeit("kernel: full-root union pass", root_pass, o_s, d_s, tm)
    timeit("production __call__ (all rounds)", trav, o, d, tm)
