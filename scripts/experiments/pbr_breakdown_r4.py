"""Round-4 pbr_ibl end-to-end breakdown (VERDICT item 2): where do the
milliseconds of one POOL ITERATION go, and how many iterations does the
bench config actually run? The bounce kernel measures 201 M bounces/s but
the scene delivers ~10 Mrays/s — this probe attributes the 20x gap.

Findings land in docs/PERF.md."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.integrator import wavefront
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.misc import pbr_ibl
from izpi_tpu.core import rng
from izpi_tpu.geometry import primitives as prim

REPS = 16
scene = pbr_ibl()
ctx = renderer.RenderContext(scene)
cs, meta, intersect = ctx.cs, ctx.meta, ctx.intersect
settings = path_mod.RenderSettings(max_depth=16)
NX = NY = 256
SPP = 256


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt, out


# ---- 1. whole-render timing + true iteration count --------------------
# Re-create the pinned-pool loop but with an ITERATION COUNTER in the carry
# so we learn the real trip count of the bench config.
def counted_pool(pool_size):
    n_pix = NX * NY
    r = max(1, min(pool_size // n_pix, SPP))
    n = n_pix * r
    total = n_pix * SPP
    base_key = rng.render_key(0)
    gen = wavefront._make_ray_fns(cs, base_key, NX, NY, n_pix, False, 0)
    slot = jnp.arange(n, dtype=jnp.int32)
    pix = slot % n_pix
    replica = slot // n_pix

    def slot_rays(samp_ctr, issued):
        return gen(pix, samp_ctr * r + replica, issued)

    samp0 = jnp.zeros(n, jnp.int32)
    issued0 = replica < SPP
    o0, d0, t0, keys0, lam0, lpdf0 = slot_rays(samp0, issued0)
    zf = t0 * 0.0
    rad0 = zf[:, None] + jnp.zeros(3, jnp.float32)
    state0 = dict(
        o=o0, d=d0, time=t0, keys=keys0, lam=lam0, lam_pdf=lpdf0,
        depth=zf.astype(jnp.int32), thru=rad0 + 1.0, rad=rad0,
        active=issued0 & (zf == 0.0), samp=samp0,
        acc=jnp.zeros((n, 3), jnp.float32), nrays=jnp.int32(0),
        iters=jnp.int32(0),
    )

    def cond(st):
        return jnp.any(st["active"])

    def body(st):
        upd, died, contrib = wavefront._bounce_step(
            cs, meta, settings, intersect, st, False, 0)
        acc = st["acc"] + jnp.where(died[:, None], contrib, 0.0)
        samp = jnp.where(died, st["samp"] + 1, st["samp"])
        issue = died & (samp * r + replica < SPP)
        o_n, d_n, t_n, k_n, lam_n, lpdf_n = slot_rays(samp, issue)
        sel = issue[:, None]
        return dict(
            o=jnp.where(sel, o_n, upd["o"]),
            d=jnp.where(sel, d_n, upd["d"]),
            time=jnp.where(issue, t_n, st["time"]),
            keys=jnp.where(sel, k_n, st["keys"]),
            lam=st["lam"], lam_pdf=st["lam_pdf"],
            depth=jnp.where(issue, 0, upd["depth"]),
            thru=jnp.where(sel, 1.0, upd["thru"]),
            rad=jnp.where(sel, 0.0, upd["rad"]),
            active=upd["active"] | issue, samp=samp, acc=acc,
            nrays=st["nrays"] + upd["nrays"],
            iters=st["iters"] + 1,
        )

    final = jax.lax.while_loop(cond, body, state0)
    return final["iters"], final["nrays"]


for pool in (1 << 18,):
    f = jax.jit(lambda: counted_pool(pool))
    it, nr = jax.block_until_ready(f())
    t0 = time.perf_counter()
    it, nr = jax.block_until_ready(f())
    dt = time.perf_counter() - t0
    it, nr = int(it), int(nr)
    print(f"pool={pool}: iters={it} nrays={nr} wall={dt:.2f}s "
          f"-> {nr/dt/1e6:.1f} Mrays/s, {dt/it*1e3:.2f} ms/iter, "
          f"avg_depth={nr/(NX*NY*SPP):.2f}", flush=True)

# ---- 2. one-iteration stage breakdown at pool-size rays ----------------
n = 1 << 18
rs = np.random.RandomState(1)
o = jnp.asarray(rs.randn(n, 3) * 2, jnp.float32)
d = jnp.asarray(rs.randn(n, 3), jnp.float32)
tme = jnp.zeros((n,), jnp.float32)
keys = rng.path_keys(rng.render_key(0), jnp.arange(n, dtype=jnp.int32), 0)
depth = jnp.zeros((n,), jnp.int32)
active = jnp.ones((n,), bool)
thru = jnp.ones((n, 3), jnp.float32)
rad = jnp.zeros((n, 3), jnp.float32)


def rep(fn):
    return jax.jit(lambda o: jax.lax.fori_loop(
        0, REPS, lambda i, oo: fn(oo), o))


def bench(name, fn):
    f = rep(fn)
    jax.block_until_ready(f(o))
    t0 = time.perf_counter()
    jax.block_until_ready(f(o))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.3f} ms/iter ({n/dt/1e6:8.1f} M/s)",
          flush=True)
    return dt


def full_bounce(oo):
    o2, d2, th, ra, act, nrr = path_mod.bounce_rgb(
        cs, meta, settings, intersect, oo, d, tme, keys, depth, thru, rad,
        active)
    return o2

bench("bounce_rgb (full)", full_bounce)


def isect(oo):
    rec = intersect(oo, d, tme, 1e-3, prim.T_MAX)
    return oo + rec.t[:, None] * 1e-9

bench("intersect", isect)

from izpi_tpu.texture import tables as tt  # noqa: E402
uu = jnp.asarray(rs.rand(n), jnp.float32)
vv = jnp.asarray(rs.rand(n), jnp.float32)
tid = jnp.asarray(rs.randint(0, int(cs.textures.kind.shape[0]), n), jnp.int32)


def tex1(oo):
    rgb = tt.eval_rgb(cs.textures, tid, uu, vv, oo, has_checker=False,
                      has_image=True, has_noise=False)
    return oo + rgb * 1e-9

bench("eval_rgb x1 (of 4 per bounce)", tex1)

from izpi_tpu.integrator import lights as lights_mod  # noqa: E402
us = jnp.asarray(rs.rand(n, 12), jnp.float32)


def light_fn(oo):
    dl = lights_mod.sample(cs.lights, oo, us[:, 5:9])
    pv = lights_mod.pdf_value(cs.lights, oo, dl)
    return oo + dl * 1e-9 + pv[:, None] * 1e-9

bench("lights sample+pdf", light_fn)

# refill path: key derivation + camera rays
base_key = rng.render_key(0)
gen = wavefront._make_ray_fns(cs, base_key, NX, NY, NX * NY, False, 0)
pixv = jnp.arange(n, dtype=jnp.int32) % (NX * NY)


def gen_fn(oo):
    o2, d2, t2, k2, lam2, lp2 = gen(pixv, depth, active)
    return oo + o2 * 1e-9 + d2 * 1e-9

bench("refill gen (keys+camera)", gen_fn)


# rng uniforms (12 per bounce)
def rng_fn(oo):
    u = rng.bounce_uniforms_perray(keys, depth, 12)
    return oo + u[:, :3] * 1e-9

bench("bounce_uniforms x12", rng_fn)
