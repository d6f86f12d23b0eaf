"""Bisect INSIDE bounce_rgb for pbr_ibl with STRONG data dependence
(outputs feed the next iteration's rays), so XLA cannot pipeline the cost
away across iterations. Each variant adds one stage."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.integrator import lights as lights_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.misc import pbr_ibl
from izpi_tpu.core import rng, sampling
from izpi_tpu.core import vecmath as vm
from izpi_tpu.geometry import primitives as prim

ITERS = 40
N = 1 << 18
scene = pbr_ibl()
ctx = renderer.RenderContext(scene)
cs, meta, intersect = ctx.cs, ctx.meta, ctx.intersect
settings = path_mod.RenderSettings(max_depth=16)

rs = np.random.RandomState(1)
o0 = jnp.asarray(rs.randn(N, 3) * 2, jnp.float32)
d0 = jnp.asarray(rs.randn(N, 3), jnp.float32)
keys = rng.path_keys(rng.render_key(0), jnp.arange(N, dtype=jnp.int32), 0)
state0 = dict(o=o0, d=d0, time=jnp.zeros(N, jnp.float32),
              depth=jnp.zeros(N, jnp.int32),
              thru=jnp.ones((N, 3), jnp.float32))


def run(name, body):
    f = jax.jit(lambda st: jax.lax.fori_loop(
        0, ITERS, lambda i, s: body(s), st))
    out = jax.block_until_ready(f(state0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(state0))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1e3:8.2f} ms/iter", flush=True)


def norm_dep(x3):
    return vm.safe_normalize(jnp.where(jnp.isfinite(x3), x3, 1.0))


def v1(st):
    """intersect only; o/d from hit."""
    rec = intersect(st["o"], st["d"], st["time"], 1e-3, prim.T_MAX)
    o = jnp.where(rec.hit[:, None], rec.p, st["o"] * 0.99)
    d = norm_dep(st["d"] + rec.normal * 0.1)
    return dict(st, o=o, d=d, depth=st["depth"] + 1)


def v2(st):
    """+ mat gather + threefry uniforms."""
    rec = intersect(st["o"], st["d"], st["time"], 1e-3, prim.T_MAX)
    mat = path_mod._gather_mat(cs, rec.mat_id)
    us = rng.bounce_uniforms_perray(keys, st["depth"], 12)
    o = jnp.where(rec.hit[:, None], rec.p, st["o"] * 0.99)
    d = norm_dep(st["d"] + rec.normal * 0.1 + us[:, :3] * 0.01
                 + mat["fuzz"][:, None] * 0.01)
    return dict(st, o=o, d=d, depth=st["depth"] + 1)


def v3(st):
    """+ the fused 4N texture eval."""
    rec = intersect(st["o"], st["d"], st["time"], 1e-3, prim.T_MAX)
    mat = path_mod._gather_mat(cs, rec.mat_id)
    us = rng.bounce_uniforms_perray(keys, st["depth"], 12)
    alb, nm, ro, me = path_mod._eval_pbr_texs(cs, meta, mat, rec)
    o = jnp.where(rec.hit[:, None], rec.p, st["o"] * 0.99)
    d = norm_dep(st["d"] + rec.normal * 0.1 + us[:, :3] * 0.01
                 + alb * 0.01 + nm * 0.01 + ro * 0.01 + me * 0.01)
    return dict(st, o=o, d=d, depth=st["depth"] + 1)


def v4(st):
    """+ lights sample + dense pdf."""
    rec = intersect(st["o"], st["d"], st["time"], 1e-3, prim.T_MAX)
    mat = path_mod._gather_mat(cs, rec.mat_id)
    us = rng.bounce_uniforms_perray(keys, st["depth"], 12)
    alb, nm, ro, me = path_mod._eval_pbr_texs(cs, meta, mat, rec)
    dl = lights_mod.sample(cs.lights, rec.p, us[:, 5:9])
    pv = lights_mod.pdf_value(cs.lights, rec.p, dl)
    o = jnp.where(rec.hit[:, None], rec.p, st["o"] * 0.99)
    d = norm_dep(st["d"] + rec.normal * 0.1 + us[:, :3] * 0.01
                 + alb * 0.01 + nm * 0.01 + ro * 0.01 + me * 0.01
                 + dl * 0.001 + pv[:, None] * 1e-6)
    return dict(st, o=o, d=d, depth=st["depth"] + 1)


def v5(st):
    """full bounce_rgb."""
    o, d, thru, rad, active, nr = path_mod.bounce_rgb(
        cs, meta, settings, intersect, st["o"], st["d"], st["time"], keys,
        st["depth"], st["thru"], jnp.zeros((N, 3), jnp.float32),
        jnp.ones(N, bool))
    return dict(st, o=jnp.where(jnp.isfinite(o), o, 0.0) * 0.999,
                d=norm_dep(d), thru=jnp.minimum(jnp.abs(thru) + 0.01, 2.0),
                depth=st["depth"] + 1)


run("v1 intersect", v1)
run("v2 + matgather + threefry x12", v2)
run("v3 + fused 4N texture eval", v3)
run("v4 + lights sample+pdf", v4)
run("v5 full bounce_rgb", v5)
