"""Dragon v2: rounds=1 vs rounds=2, plus end-to-end bench-config render;
then cornell 256^2@1024 x3 repeats (VERDICT r3 #4 regression check)."""
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

ref = {}
for rounds in (1, 2):
    cs2, inter = bvh_kernel.attach(cs, seed=1, rebin=True, rounds=rounds,
                                   treelet_target=512)
    trav = jax.jit(lambda o, d, tm: inter(o, d, tm, 1e-3, prim.T_MAX))
    for label, o, d in (("camera", o_c, d_c), ("bounce", o_b, d_b)):
        out = jax.block_until_ready(trav(o, d, tm))
        t0 = time.time()
        out = jax.block_until_ready(trav(o, d, tm))
        dt = time.time() - t0
        print(f"rounds={rounds} {label}: {dt*1e3:8.1f} ms "
              f"({N/dt/1e6:6.2f} M/s)", flush=True)
        ref.setdefault(label, {})[rounds] = (np.asarray(out.t),
                                             np.asarray(out.hit))
for label in ("camera", "bounce"):
    a = ref[label][1]
    b = ref[label][2]
    mism = (np.abs(a[0] - b[0]) > 1e-3 * np.maximum(1, np.abs(b[0]))).sum()
    print(f"{label}: rounds 1 vs 2 t mismatches={mism}", flush=True)

# end-to-end bench config with rounds=1
import izpi_tpu.ops.bvh_kernel as bk
from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer

orig_attach = bk.attach
bk.attach = lambda cs, **kw: orig_attach(cs, **{**kw, "rounds": 1})
ctx = renderer.RenderContext(scene)
settings = path_mod.RenderSettings(max_depth=16, background=(0, 0, 0))
kw = dict(settings=settings, seed=0, context=ctx, sampler_type="colour")
renderer.render(None, 256, 256, 8, **kw)
res = renderer.render(None, 256, 256, 8, **kw)
print(f"dragon 256^2@8 rounds=1: {res.mrays_per_sec:.3f} Mrays/s "
      f"({res.rays_traced} rays, {res.seconds:.2f}s)", flush=True)
bk.attach = orig_attach

# --- cornell regression check: 3 repeats at bench config ---
from izpi_tpu.scene.library import get_scene

cscene = get_scene("cornell_box", aspect=1.0)
cctx = renderer.RenderContext(cscene)
csettings = path_mod.RenderSettings(max_depth=50, background=(0, 0, 0))
ckw = dict(settings=csettings, seed=0, context=cctx, sampler_type="colour")
renderer.render(None, 256, 256, 1024, **ckw)
for i in range(3):
    res = renderer.render(None, 256, 256, 1024, **ckw)
    print(f"cornell 256^2@1024 rep{i}: {res.mrays_per_sec:.1f} Mrays/s",
          flush=True)
