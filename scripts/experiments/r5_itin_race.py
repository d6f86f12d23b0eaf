"""Round-5: itinerary (v5) vs masked-argmin re-binning (v2) scheduler race
on the 871k-tri dragon at 262k rays."""
import os
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
from izpi_tpu.ops import bvh_kernel

N = 262144
scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0)
cs, meta = compile_scene(scene)

rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)


def run(tag):
    t0 = time.time()
    cs2, inter = bvh_kernel.attach(cs, seed=1)
    print(f"{tag} attach {time.time()-t0:.1f}s itin={inter.itin}",
          flush=True)
    o, d, tm = camera_mod.get_rays(cs2.camera, s, t, u3)
    lo, hi = np.asarray(inter.lo), np.asarray(inter.hi)
    # fresh per-run generator with a FIXED seed: the two schedulers must
    # see identical bounce rays or the comparison is garbage
    rb = np.random.RandomState(99)
    o_b = jnp.asarray(rb.rand(N, 3) * (hi - lo) + lo, jnp.float32)
    d_b = jnp.asarray(rb.randn(N, 3), jnp.float32)

    outs = {}
    for name, oo, dd in (("camera", o, d), ("bounce", o_b, d_b)):
        f = jax.jit(lambda oo=oo, dd=dd: inter(oo, dd, tm, 1e-3,
                                               prim.T_MAX))
        t0 = time.time()
        out = jax.block_until_ready(f())
        c = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            out = f()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 5
        print(f"{tag} {name:8s} {dt*1e3:8.1f} ms (compile {c:.0f}s) "
              f"hits {float(np.asarray(out.hit).mean()):.4f}", flush=True)
        outs[name] = out
    return outs


os.environ["IZPI_DRAGON_SCHED"] = "itin"
a = run("itin")
os.environ["IZPI_DRAGON_SCHED"] = "v2"
b = run("v2  ")

for name in ("camera", "bounce"):
    ha, hb = np.asarray(a[name].hit), np.asarray(b[name].hit)
    m = ha & hb
    ta, tb = np.asarray(a[name].t)[m], np.asarray(b[name].t)[m]
    print(f"{name}: hit agree {(ha == hb).mean():.6f} "
          f"t max rel diff {np.abs(ta - tb).max() / max(tb.max(), 1e-9):.2e} "
          f"idx agree {(np.asarray(a[name].prim_idx)[m] == np.asarray(b[name].prim_idx)[m]).mean():.6f}",
          flush=True)
