"""In-jit profiling of pbr_ibl bounce pieces: each stage runs REPS times
inside one jit (fori with output feedback to defeat CSE), so the ~2ms
per-dispatch tunnel floor doesn't pollute the numbers."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.misc import pbr_ibl
from izpi_tpu.core import rng
from izpi_tpu.geometry import primitives as prim
from izpi_tpu.texture import tables as tt

REPS = 20
scene = pbr_ibl()
ctx = renderer.RenderContext(scene)
cs, meta, intersect = ctx.cs, ctx.meta, ctx.intersect
settings = path_mod.RenderSettings(max_depth=16)


def bench(name, make_fn, n):
    """make_fn(o) -> o-like array; iterated REPS times on-device."""
    fn = jax.jit(lambda o: jax.lax.fori_loop(
        0, REPS, lambda i, oo: make_fn(oo), o))
    rs = np.random.RandomState(0)
    o = jnp.asarray(rs.randn(n, 3) * 5, jnp.float32)
    out = jax.block_until_ready(fn(o))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(o))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:38s} N={n:7d} {dt*1e3:8.3f} ms ({n/dt/1e6:8.1f} M/s)",
          flush=True)
    return dt


for n in (1 << 16, 1 << 19):
    rs = np.random.RandomState(1)
    d_c = jnp.asarray(rs.randn(n, 3), jnp.float32)
    tme = jnp.zeros((n,), jnp.float32)
    keys = rng.path_keys(rng.render_key(0), jnp.arange(n, dtype=jnp.int32), 0)
    depth = jnp.zeros((n,), jnp.int32)
    active = jnp.ones((n,), bool)
    uu = jnp.asarray(rs.rand(n), jnp.float32)
    vv = jnp.asarray(rs.rand(n), jnp.float32)
    tid = jnp.asarray(rs.randint(0, int(cs.textures.kind.shape[0]), n),
                      jnp.int32)

    # full bounce (o feedback via rec.p-ish: take output o)
    def full_bounce(o):
        o2, d2, thru, rad, act, nr = path_mod.bounce_rgb(
            cs, meta, settings, intersect, o, d_c, tme, keys, depth,
            jnp.ones((n, 3), jnp.float32), jnp.zeros((n, 3), jnp.float32),
            active)
        return o2
    bench("bounce_rgb (full)", full_bounce, n)

    # intersect via MXU
    def isect_mxu(o):
        rec = intersect(o, d_c, tme, 1e-3, prim.T_MAX)
        return o + rec.t[:, None] * 1e-9
    bench("intersect MXU (4 prims)", isect_mxu, n)

    # intersect via brute VPU
    def isect_brute(o):
        rec = prim.intersect_brute(cs.prims, o, d_c, tme, 1e-3, prim.T_MAX)
        return o + rec.t[:, None] * 1e-9
    bench("intersect brute VPU (4 prims)", isect_brute, n)

    # one eval_rgb image gather
    def tex1(o):
        rgb = tt.eval_rgb(cs.textures, tid, uu, vv, o, has_checker=False,
                          has_image=True, has_noise=False)
        return o + rgb * 1e-9
    bench("eval_rgb x1", tex1, n)

    # four eval_rgb calls (albedo+normal+rough+metal pattern)
    def tex4(o):
        acc = o * 0.0
        for s in range(4):
            rgb = tt.eval_rgb(cs.textures, (tid + s) % 13, uu, vv, o,
                              has_checker=False, has_image=True,
                              has_noise=False)
            acc = acc + rgb
        return o + acc * 1e-9
    bench("eval_rgb x4 separate", tex4, n)

    # fused: one gather for 4 texture ids
    def tex4_fused(o):
        tids = jnp.stack([(tid + s) % 13 for s in range(4)], 0).reshape(-1)
        uu4 = jnp.tile(uu, 4)
        vv4 = jnp.tile(vv, 4)
        img = tt.image_lookup(cs.textures.images, cs.textures.img_w,
                              cs.textures.img_h,
                              jnp.maximum(cs.textures.img_id[tids], 0),
                              uu4, vv4)
        return o + img.reshape(4, n, 3).sum(0) * 1e-9
    bench("image_lookup x4 fused", tex4_fused, n)

    # lights sample+pdf
    from izpi_tpu.integrator import lights as lights_mod
    us = jnp.asarray(rs.rand(n, 12), jnp.float32)

    def light_fn(o):
        dl = lights_mod.sample(cs.lights, o, us[:, 5:9])
        pv = lights_mod.pdf_value(cs.lights, o, dl)
        return o + dl * 1e-9 + pv[:, None] * 1e-9
    bench("lights sample+pdf", light_fn, n)
