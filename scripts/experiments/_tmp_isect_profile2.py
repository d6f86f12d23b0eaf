"""Layout experiments for small-P intersection: (N,P) vs (P,N) vs
python-unrolled scan over (N,) arrays."""
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
P = int(cs.prims.count)
print("P =", P)


def bench(name, make_fn):
    fn = jax.jit(lambda o: jax.lax.fori_loop(
        0, REPS, lambda i, oo: make_fn(oo), o))
    o = jnp.asarray(rs.randn(N, 3) * 5, jnp.float32)
    jax.block_until_ready(fn(o))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(o))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt*1e3:8.3f} ms ({N/dt/1e6:8.1f} M/s)", flush=True)


def np_layout(o):
    t, ok = prim.prim_t(cs.prims.kind[None, :], cs.prims.g0[None],
                        cs.prims.g1[None], cs.prims.g2[None],
                        cs.prims.g3[None], o[:, None, :], d_c[:, None, :],
                        tme[:, None], 1e-3, prim.T_MAX)
    t = jnp.where(ok, t, prim.T_MAX)
    tm = jnp.min(t, axis=1)
    return o + tm[:, None] * 1e-9
bench("(N,P) layout prim_t + min", np_layout)


def pn_layout(o):
    t, ok = prim.prim_t(cs.prims.kind[:, None], cs.prims.g0[:, None],
                        cs.prims.g1[:, None], cs.prims.g2[:, None],
                        cs.prims.g3[:, None], o[None, :, :], d_c[None, :, :],
                        tme[None, :], 1e-3, prim.T_MAX)
    t = jnp.where(ok, t, prim.T_MAX)
    tm = jnp.min(t, axis=0)
    return o + tm[:, None] * 1e-9
bench("(P,N) layout prim_t + min", pn_layout)


g0h = np.asarray(cs.prims.g0); g1h = np.asarray(cs.prims.g1)
g2h = np.asarray(cs.prims.g2); g3h = np.asarray(cs.prims.g3)
kindh = np.asarray(cs.prims.kind)


def unrolled(o):
    best_t = jnp.full((N,), prim.T_MAX, jnp.float32)
    best_i = jnp.full((N,), -1, jnp.int32)
    for i in range(P):
        t, ok = prim.prim_t(
            jnp.int32(kindh[i]), jnp.asarray(g0h[i]), jnp.asarray(g1h[i]),
            jnp.asarray(g2h[i]), jnp.asarray(g3h[i]), o, d_c, tme,
            1e-3, best_t)
        better = ok & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, i, best_i)
    return o + best_t[:, None] * 1e-9
bench(f"unrolled python loop over {P}", unrolled)


def unrolled_full(o):
    best_t = jnp.full((N,), prim.T_MAX, jnp.float32)
    best_i = jnp.full((N,), -1, jnp.int32)
    for i in range(P):
        t, ok = prim.prim_t(
            jnp.int32(kindh[i]), jnp.asarray(g0h[i]), jnp.asarray(g1h[i]),
            jnp.asarray(g2h[i]), jnp.asarray(g3h[i]), o, d_c, tme,
            1e-3, best_t)
        better = ok & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, i, best_i)
    rec = prim.finalize_hit(cs.prims, o, d_c, tme, best_t, best_i,
                            best_i >= 0)
    return o + rec.p * 1e-9 + rec.u[:, None] * 1e-9
bench("unrolled + finalize_hit", unrolled_full)
