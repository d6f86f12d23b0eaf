"""Instrumented rebin: per-round pending counts + timing (TPU), fully
jitted per round (eager ops through the tunnel cost a compile each)."""
import sys
sys.path.insert(0, "/root/repo")
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
cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=True)
print("attach done, T:", inter.treelets.shape[0], flush=True)

N = 1 << 16
TS = bvh_kernel.TS
rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_c, d_c, tm = camera_mod.get_rays(cs.camera, s, t, u3)
fn = inter._fn(N)

t_c, i_c = jax.jit(partial(fn, t_min=1e-3, t_max=prim.T_MAX,
                           raw_idx=True))(o_c, d_c, tm)
jax.block_until_ready(t_c)
print("camera pass done", flush=True)
hitm = np.asarray(i_c >= 0)
p = np.asarray(o_c) + np.asarray(d_c) * np.asarray(t_c)[:, None]
ids = np.nonzero(hitm)[0]
pick = ids[rs.randint(0, len(ids), N)]
w = rs.randn(N, 3)
w /= np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-9)
o = jnp.asarray(p[pick] + w * 1e-3, jnp.float32)
d = jnp.asarray(w, jnp.float32)
t_min, t_max = 1e-3, prim.T_MAX

tile = TS * 128
n_grid = -(-N // tile)
T = inter.treelets.shape[0]


@jax.jit
def setup(o, d):
    entry = bvh_kernel.treelet_entries(o, d, inter.treelets)
    itin = jnp.argsort(entry, axis=1).astype(jnp.int32)
    entry_sorted = jnp.take_along_axis(entry, itin, axis=1)
    morton = bvh_kernel.sort_keys(o, d, inter.lo, inter.hi)
    return itin, entry_sorted, morton


itin, entry_sorted, morton = jax.block_until_ready(setup(o, d))
mids = jnp.minimum(jnp.arange(n_grid, dtype=jnp.int32) * tile + tile // 2,
                   N - 1)
ray_tile = jnp.arange(N, dtype=jnp.int32) // tile


@jax.jit
def pre(pos, best_t):
    posc = jnp.minimum(pos, T - 1)[:, None]
    cur_tl = jnp.take_along_axis(itin, posc, axis=1)[:, 0]
    cur_entry = jnp.take_along_axis(entry_sorted, posc, axis=1)[:, 0]
    pending = (pos < T) & (cur_entry < best_t)
    key = jnp.where(pending, cur_tl, T)
    order = jnp.argsort((key << 24) | morton)
    tile_tl = key[order][mids]
    starts = inter.treelet_nodes[tile_tl]
    tcap = jnp.where(pending[order], best_t[order], t_min)
    return pending, cur_tl, order, tile_tl, starts, tcap


@jax.jit
def post(order, tile_tl, t_r, i_r, best_t, best_raw, pending, cur_tl, pos):
    t_u = jnp.zeros_like(t_r).at[order].set(t_r)
    i_u = jnp.full_like(i_r, -1).at[order].set(i_r)
    improved = (i_u >= 0) & (t_u < best_t)
    best_t = jnp.where(improved, t_u, best_t)
    best_raw = jnp.where(improved, i_u, best_raw)
    ray_tl = jnp.zeros_like(cur_tl).at[order].set(tile_tl[ray_tile])
    adv = pending & (ray_tl == cur_tl)
    return best_t, best_raw, pos + adv.astype(jnp.int32), adv


kern = jax.jit(lambda o, d, tm, starts, tcap: fn(
    o, d, tm, t_min, t_max, starts=starts, tcap=tcap, raw_idx=True))
sortoda = jax.jit(lambda o, d, tm, order: (o[order], d[order], tm[order]))

best_t = jnp.full((N,), prim.T_MAX, jnp.float32)
best_raw = jnp.full((N,), -1, jnp.int32)
pos = jnp.zeros((N,), jnp.int32)

for rep in range(2):   # rep 0 compiles, rep 1 is the timed pass
    best_t = jnp.full((N,), prim.T_MAX, jnp.float32)
    best_raw = jnp.full((N,), -1, jnp.int32)
    pos = jnp.zeros((N,), jnp.int32)
    for r in range(6):
        t0 = time.time()
        pending, cur_tl, order, tile_tl, starts, tcap = jax.block_until_ready(
            pre(pos, best_t))
        t_pre = time.time() - t0
        t0 = time.time()
        o_s, d_s, tm_s = jax.block_until_ready(sortoda(o, d, tm, order))
        t_so = time.time() - t0
        t0 = time.time()
        t_r, i_r = jax.block_until_ready(
            kern(o_s, d_s, tm_s, starts, tcap))
        t_k = time.time() - t0
        t0 = time.time()
        best_t, best_raw, pos, adv = jax.block_until_ready(
            post(order, tile_tl, t_r, i_r, best_t, best_raw, pending,
                 cur_tl, pos))
        t_po = time.time() - t0
        if rep:
            print(f"round {r}: pending {int(pending.sum()):6d} adv "
                  f"{int(adv.sum()):6d} live-tiles "
                  f"{int(np.asarray(tile_tl < T).sum()):3d} | pre "
                  f"{t_pre*1e3:6.1f} sort {t_so*1e3:6.1f} kern "
                  f"{t_k*1e3:6.1f} post {t_po*1e3:6.1f} ms", flush=True)

posc = jnp.minimum(pos, T - 1)[:, None]
cur_entry = jnp.take_along_axis(entry_sorted, posc, axis=1)[:, 0]
pending = (pos < T) & (cur_entry < best_t)
print("cleanup pending:", int(pending.sum()), flush=True)
order = jnp.argsort(jnp.where(pending, morton, 1 << 26))
tcap = jnp.where(pending[order], best_t[order], t_min)
o_s, d_s, tm_s = sortoda(o, d, tm, order)
ck = jax.jit(lambda o, d, tm, tcap: fn(o, d, tm, t_min, t_max, tcap=tcap,
                                       raw_idx=True))
jax.block_until_ready(ck(o_s, d_s, tm_s, tcap))
t0 = time.time()
jax.block_until_ready(ck(o_s, d_s, tm_s, tcap))
print(f"cleanup: {1e3*(time.time()-t0):6.1f} ms", flush=True)
