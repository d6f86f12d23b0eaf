"""Round-4 dragon A/B: whole-traverse cost vs treelet_target and rounds,
camera + bounce rays, 262144 rays (the bench pool size). Each target is a
fresh attach + kernel compile (~5 min via the tunnel), so run detached."""
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

targets = [int(x) for x in sys.argv[1:]] or [1024, 512, 48]
N = 1 << 18
scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0)
cs, meta = compile_scene(scene)

rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_c, d_c, tm = camera_mod.get_rays(cs.camera, s, t, u3)

# bounce rays from brute-force hit points on a camera subset
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

ref = {}
for target in targets:
    for rounds in ((2, 3) if target >= 512 else (2,)):
        t0 = time.time()
        cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=True,
                                       rounds=rounds,
                                       treelet_target=target)
        ta = time.time() - t0
        trav = jax.jit(lambda o, d, tm: inter(o, d, tm, 1e-3, prim.T_MAX))
        t0 = time.time()
        r_c = jax.block_until_ready(trav(o_c, d_c, tm))
        tc = time.time() - t0
        for label, o, d in (("camera", o_c, d_c), ("bounce", o_b, d_b)):
            out = jax.block_until_ready(trav(o, d, tm))
            t0 = time.time()
            out = jax.block_until_ready(trav(o, d, tm))
            dt = time.time() - t0
            print(f"target={target:5d} T={inter.treelets.shape[0]:5d} "
                  f"rounds={rounds} {label}: {dt*1e3:8.1f} ms "
                  f"({N/dt/1e6:7.2f} M/s)  [attach {ta:.0f}s "
                  f"compile {tc:.0f}s]", flush=True)
            ref.setdefault((label,), {})[(target, rounds)] = (
                np.asarray(out.t), np.asarray(out.prim_idx))

# cross-check exactness across configs (same rays, same scene)
base_key = min(ref[("camera",)].keys())
for label in ("camera", "bounce"):
    tb, ib = ref[(label,)][base_key]
    for k, (tt_, ii_) in ref[(label,)].items():
        if k == base_key:
            continue
        mism = (np.abs(tt_ - tb) > 1e-3 * np.maximum(1, np.abs(tb))).sum()
        print(f"{label}: {k} vs {base_key}: t mismatches={mism}", flush=True)
