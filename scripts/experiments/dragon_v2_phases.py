"""Pin the v2 re-bin traverse's 391 ms: jit partial pipelines of the REAL
_rebin_traverse code (matrices only / +sort / +round1 / full) on bounce
rays."""
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
T = inter.treelets.shape[0]
fn = inter._fn(N)
print(f"T={T} rounds={inter.rounds}", flush=True)

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

tile = bvh_kernel.TS * 128
n_grid = N // tile
t_min, t_max = 1e-3, prim.T_MAX
mids = jnp.minimum(jnp.arange(n_grid, dtype=jnp.int32) * tile + tile // 2,
                   N - 1)
ray_tile_s = jnp.arange(N, dtype=jnp.int32) // tile
jcol = jnp.arange(T, dtype=jnp.int32)[None, :]
k_roots = min(bvh_kernel.MULTI_K, T)


def round_parts(o, d, time_, todo, best_t, best_raw, stage):
    entry = bvh_kernel.treelet_entries(o, d, inter.treelets)
    morton = bvh_kernel.sort_keys(o, d, inter.lo, inter.hi)
    masked = jnp.where(todo & (entry < best_t[:, None]), entry, jnp.inf)
    cur = jnp.min(masked, axis=1)
    pending = jnp.isfinite(cur)
    key = jnp.where(pending, jnp.argmin(masked, axis=1).astype(jnp.int32), T)
    if stage == "matrices":
        return key.sum() + pending.sum()
    order = jnp.argsort((key << 20) | (morton >> 4))
    o_s, d_s, tm_s = o[order], d[order], time_[order]
    key_s = key[order]
    tile_any = (jnp.zeros((n_grid, T + 1), bool)
                .at[ray_tile_s, key_s].set(True))[:, :T]
    topk = jnp.sort(jnp.where(tile_any, jcol, T), axis=1)[:, :k_roots]
    starts = jnp.where(topk < T, inter.treelet_nodes[topk], -1)
    tcap_s = jnp.where(pending, best_t, t_min)[order]
    if stage == "sorted":
        return o_s.sum() + starts.sum() + tcap_s.sum()
    t_r, i_r = fn(o_s, d_s, tm_s, t_min, t_max, starts=starts, tcap=tcap_s,
                  raw_idx=True)
    return t_r.sum() + i_r.sum()


def timeit(name, f, *args):
    g = jax.jit(f)
    out = jax.block_until_ready(g(*args))
    t0 = time.time()
    out = jax.block_until_ready(g(*args))
    print(f"{name:40s} {(time.time()-t0)*1e3:8.1f} ms", flush=True)


todo0 = jnp.ones((N, T), bool)
bt0 = jnp.full((N,), prim.T_MAX, jnp.float32)
br0 = jnp.full((N,), -1, jnp.int32)

for label, o, d in (("bounce", o_b, d_b),):
    timeit(f"{label}: matrices (entry+argmin)", lambda o, d: round_parts(
        o, d, tm, todo0, bt0, br0, "matrices"), o, d)
    timeit(f"{label}: + sort + tile sets", lambda o, d: round_parts(
        o, d, tm, todo0, bt0, br0, "sorted"), o, d)
    timeit(f"{label}: + round-1 kernel", lambda o, d: round_parts(
        o, d, tm, todo0, bt0, br0, "full"), o, d)
    trav = jax.jit(lambda o, d: inter(o, d, tm, t_min, t_max))
    out = jax.block_until_ready(trav(o, d))
    t0 = time.time()
    out = jax.block_until_ready(trav(o, d))
    print(f"{label}: production (2 rounds + cleanup)   "
          f"{(time.time()-t0)*1e3:8.1f} ms", flush=True)
