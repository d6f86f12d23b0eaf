"""Rounds sweep + glue piece timing for the mask-based rebin (dragon)."""
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

cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=True, treelet_target=256)
fn = inter._fn(N)

# bounce rays
trav0 = jax.jit(lambda o, d, tm: inter(o, d, tm, 1e-3, prim.T_MAX))
rec = jax.block_until_ready(trav0(o_c, d_c, tm))
hitm = np.asarray(rec.hit); p = np.asarray(rec.p)
ids = np.nonzero(hitm)[0]
pick = ids[rs.randint(0, len(ids), N)]
w = rs.randn(N, 3); w /= np.maximum(np.linalg.norm(w, 1, keepdims=True), 1e-9)
o_b = jnp.asarray(p[pick] + w * 1e-3, jnp.float32)
d_b = jnp.asarray(w, jnp.float32)


def timeit(tag, f, *a):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    out = jax.block_until_ready(f(*a))
    print(f"{tag}: {1e3*(time.time()-t0):7.1f} ms", flush=True)
    return out

for rounds in (1, 2, 3):
    inter.rounds = rounds
    trav = jax.jit(lambda o, d, tm, _r=rounds: inter(o, d, tm, 1e-3,
                                                     prim.T_MAX))
    timeit(f"rounds={rounds} camera", trav, o_c, d_c, tm)
    timeit(f"rounds={rounds} bounce", trav, o_b, d_b, tm)

# pieces
morton = jax.jit(lambda o, d: bvh_kernel.sort_keys(o, d, inter.lo, inter.hi))
timeit("sort_keys", morton, o_b, d_b)
keys = morton(o_b, d_b)
srt = jax.jit(lambda k: jnp.argsort(k))
timeit("argsort(26bit keys)", srt, keys)
ent = jax.jit(lambda o, d: bvh_kernel.treelet_entries(o, d, inter.treelets))
timeit("treelet_entries (n,T)", ent, o_b, d_b)
order = srt(keys)
single = jax.jit(lambda o, d, tm: fn(o, d, tm, 1e-3, prim.T_MAX,
                                     raw_idx=True))
timeit("single full-tree launch (sorted)", single, o_b[order], d_b[order],
       tm[order])
e = ent(o_b, d_b)
tl = jax.jit(lambda e: jnp.argmin(e, axis=1))(e)
order2 = jnp.argsort((jnp.where(jnp.isfinite(e[jnp.arange(N), tl]), tl, 256)
                      << 24) | keys)
starts1 = inter.treelet_nodes[tl[order2][jnp.minimum(
    jnp.arange(-(-N // 1024), dtype=jnp.int32) * 1024 + 512, N - 1)]]
conf = jax.jit(lambda o, d, tm, st: fn(o, d, tm, 1e-3, prim.T_MAX,
                                       starts=st, raw_idx=True))
timeit("single confined launch (1 root/tile)", conf, o_b[order2],
       d_b[order2], tm[order2], starts1)
