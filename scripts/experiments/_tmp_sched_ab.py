"""A/B pool scheduler variants + bounce cost on pbr_ibl (TPU)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu.core import rng
from izpi_tpu.integrator import path as path_mod, wavefront
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.misc import pbr_ibl

ctx = renderer.RenderContext(pbr_ibl())
cs, meta, intersect = ctx.cs, ctx.meta, ctx.intersect
settings = path_mod.RenderSettings(max_depth=16)

# 1. bounce cost with the production intersector (now unrolled)
REPS = 20
for N in (1 << 18,):
    rs = np.random.RandomState(1)
    d_c = jnp.asarray(rs.randn(N, 3), jnp.float32)
    tme = jnp.zeros((N,), jnp.float32)
    keys = rng.path_keys(rng.render_key(0), jnp.arange(N, dtype=jnp.int32), 0)
    depth = jnp.zeros((N,), jnp.int32)
    active = jnp.ones((N,), bool)

    def full_bounce(o):
        o2, _, _, _, _, _ = path_mod.bounce_rgb(
            cs, meta, settings, intersect, o, d_c, tme, keys, depth,
            jnp.ones((N, 3), jnp.float32), jnp.zeros((N, 3), jnp.float32),
            active)
        return o2
    fn = jax.jit(lambda o: jax.lax.fori_loop(
        0, REPS, lambda i, oo: full_bounce(oo), o))
    o = jnp.asarray(rs.randn(N, 3) * 5, jnp.float32)
    jax.block_until_ready(fn(o))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(o))
    dt = (time.perf_counter() - t0) / REPS
    print(f"bounce_rgb unrolled-intersect N={N}: {dt*1e3:.3f} ms "
          f"({N/dt/1e6:.1f} M/s)", flush=True)

# 2. scheduler variants at two pool sizes
nx = ny = 128
spp = 32


def timed_render(tag, max_static, chunk, guard, pool):
    wavefront.MAX_STATIC_ITERS = max_static
    wavefront.LOOP_CHUNK = chunk
    import izpi_tpu.core.loops as loops
    orig = loops.chunked_while
    if not guard:
        def unguarded(cond, body, state, chunk, guard=False):
            return orig(cond, body, state, chunk, guard=False)
        loops.chunked_while_patched = None
        wavefront.chunked_while = unguarded
    else:
        wavefront.chunked_while = orig
    ctx._runners.clear()
    kw = dict(settings=settings, seed=0, context=ctx, pool_size=pool)
    renderer.render(None, nx, ny, spp, **kw)
    res = renderer.render(None, nx, ny, spp, **kw)
    print(f"{tag}: {res.mrays_per_sec:.2f} Mrays/s ({res.rays_traced} rays, "
          f"{res.seconds*1e3:.0f} ms)", flush=True)


timed_render("fori-guarded pool=256k", 4096, 64, True, 1 << 18)
timed_render("fori-guarded pool=64k", 4096, 64, True, 1 << 16)
timed_render("while-guard chunk=64 pool=256k", 0, 64, True, 1 << 18)
timed_render("while-noguard chunk=8 pool=64k (old)", 0, 8, False, 1 << 16)
timed_render("while-noguard chunk=8 pool=256k", 0, 8, False, 1 << 18)
timed_render("while-guard chunk=16 pool=256k", 0, 16, True, 1 << 18)
