"""Split intersect cost: raw t-test vs finalize_hit, pbr_ibl (4 spheres)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu.render import renderer
from izpi_tpu.scene.library.misc import pbr_ibl
from izpi_tpu.geometry import primitives as prim

REPS = 20
ctx = renderer.RenderContext(pbr_ibl())
cs = ctx.cs
N = 1 << 19
rs = np.random.RandomState(1)
d_c = jnp.asarray(rs.randn(N, 3), jnp.float32)
tme = jnp.zeros((N,), jnp.float32)


def bench(name, make_fn):
    fn = jax.jit(lambda o: jax.lax.fori_loop(
        0, REPS, lambda i, oo: make_fn(oo), o))
    o = jnp.asarray(rs.randn(N, 3) * 5, jnp.float32)
    jax.block_until_ready(fn(o))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(o))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt*1e3:8.3f} ms ({N/dt/1e6:8.1f} M/s)", flush=True)


def raw_t(o):
    t, ok = prim.prim_t(cs.prims.kind[None, :], cs.prims.g0[None],
                        cs.prims.g1[None], cs.prims.g2[None],
                        cs.prims.g3[None], o[:, None, :], d_c[:, None, :],
                        tme[:, None], 1e-3, prim.T_MAX)
    t = jnp.where(ok, t, prim.T_MAX)
    arg = jnp.argmin(t, axis=1)
    tm = jnp.take_along_axis(t, arg[:, None], axis=1)[:, 0]
    return o + tm[:, None] * 1e-9
bench("raw prim_t + argmin (4 prims)", raw_t)


def fin_only(o):
    t = jnp.abs(o[:, 0]) + 1.0
    idx = (o[:, 1] > 0).astype(jnp.int32) * 3
    hit = o[:, 2] > -10.0
    rec = prim.finalize_hit(cs.prims, o, d_c, tme, t, idx, hit)
    return o + rec.p * 1e-9 + rec.u[:, None] * 1e-9
bench("finalize_hit only", fin_only)


def full(o):
    rec = prim.intersect_brute(cs.prims, o, d_c, tme, 1e-3, prim.T_MAX)
    return o + rec.t[:, None] * 1e-9 + rec.u[:, None] * 1e-9
bench("intersect_brute full", full)
