"""Bisect the pinned-pool iteration cost for pbr_ibl: run N fixed
iterations of progressively larger body subsets under one jit'd fori_loop
(full data dependence via the carried state) and report ms/iter.
All variants force active=all so occupancy is 100% and work is identical.
"""
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

ITERS = 40
N = 1 << 18
NX = NY = 256
scene = pbr_ibl()
ctx = renderer.RenderContext(scene)
cs, meta, intersect = ctx.cs, ctx.meta, ctx.intersect
settings = path_mod.RenderSettings(max_depth=16)

base_key = rng.render_key(0)
n_pix = NX * NY
gen = wavefront._make_ray_fns(cs, base_key, NX, NY, n_pix, False, 0)
slot = jnp.arange(N, dtype=jnp.int32)
pix = slot % n_pix
replica = slot // n_pix
o0, d0, t0, keys0, _, _ = gen(pix, jnp.zeros(N, jnp.int32),
                              jnp.ones(N, bool))

state0 = dict(
    o=o0, d=d0, time=t0, keys=keys0,
    depth=jnp.zeros(N, jnp.int32),
    thru=jnp.ones((N, 3), jnp.float32),
    rad=jnp.zeros((N, 3), jnp.float32),
    active=jnp.ones(N, bool),
    samp=jnp.zeros(N, jnp.int32),
    acc=jnp.zeros((N, 3), jnp.float32),
    nrays=jnp.int32(0),
)


def run_variant(name, body):
    f = jax.jit(lambda st: jax.lax.fori_loop(
        0, ITERS, lambda i, s: body(s), st))
    out = jax.block_until_ready(f(state0))
    t0_ = time.perf_counter()
    out = jax.block_until_ready(f(state0))
    dt = (time.perf_counter() - t0_) / ITERS
    print(f"{name:46s} {dt*1e3:8.2f} ms/iter", flush=True)


def v_bounce(st):
    """bounce only, loop state reduced to rays."""
    o, d, thru, rad, active, nr = path_mod.bounce_rgb(
        cs, meta, settings, intersect, st["o"], st["d"], st["time"],
        st["keys"], st["depth"], st["thru"], st["rad"],
        jnp.ones(N, bool))
    return dict(st, o=o, d=jnp.where(jnp.isfinite(d), d, 1.0),
                thru=jnp.minimum(thru, 2.0), rad=rad * 0.5)


def v_bounce_deposit(st):
    st2 = v_bounce(st)
    died = st2["rad"][:, 0] > 0.5
    contrib = st2["rad"]
    acc = st["acc"] + jnp.where(died[:, None], contrib, 0.0)
    return dict(st2, acc=acc)


def v_bounce_deposit_gen(st):
    st2 = v_bounce_deposit(st)
    died = st2["rad"][:, 0] > 0.5
    samp = jnp.where(died, st["samp"] + 1, st["samp"])
    o_n, d_n, t_n, k_n, _, _ = gen(pix, samp * 4 + replica, died)
    sel = died[:, None]
    return dict(st2,
                o=jnp.where(sel, o_n, st2["o"]),
                d=jnp.where(sel, d_n, st2["d"]),
                time=jnp.where(died, t_n, st["time"]),
                keys=jnp.where(sel, k_n, st["keys"]),
                samp=samp,
                depth=jnp.where(died, 0, st["depth"] + 1))


def v_full(st):
    upd, died, contrib = wavefront._bounce_step(
        cs, meta, settings, intersect, st, False, 0)
    acc = st["acc"] + jnp.where(died[:, None], contrib, 0.0)
    samp = jnp.where(died, st["samp"] + 1, st["samp"])
    issue = died
    o_n, d_n, t_n, k_n, _, _ = gen(pix, samp * 4 + replica, issue)
    sel = issue[:, None]
    return dict(
        st,
        o=jnp.where(sel, o_n, upd["o"]),
        d=jnp.where(sel, d_n, upd["d"]),
        time=jnp.where(issue, t_n, st["time"]),
        keys=jnp.where(sel, k_n, st["keys"]),
        depth=jnp.where(issue, 0, upd["depth"]),
        thru=jnp.where(sel, 1.0, upd["thru"]),
        rad=jnp.where(sel, 0.0, upd["rad"]),
        active=jnp.ones(N, bool),
        samp=samp, acc=acc, nrays=st["nrays"] + upd["nrays"],
    )


def v_intersect_only(st):
    from izpi_tpu.geometry import primitives as prim
    rec = intersect(st["o"], st["d"], st["time"], 1e-3, prim.T_MAX)
    return dict(st, o=st["o"] + rec.t[:, None] * 1e-9,
                d=jnp.where(rec.hit[:, None], st["d"], -st["d"]))


run_variant("intersect only", v_intersect_only)
run_variant("bounce only", v_bounce)
run_variant("bounce + deposit", v_bounce_deposit)
run_variant("bounce + deposit + refill gen", v_bounce_deposit_gen)
run_variant("full pinned body", v_full)
