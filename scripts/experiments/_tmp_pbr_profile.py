"""Profile the PBR+IBL pool render: where do the ms go per bounce?"""
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
from izpi_tpu.texture import tables as tt

scene = pbr_ibl()
ctx = renderer.RenderContext(scene)
cs, meta, intersect = ctx.cs, ctx.meta, ctx.intersect
print("n_prims", meta.n_prims, "images", cs.textures.images.shape, flush=True)
settings = path_mod.RenderSettings(max_depth=16)

N = 1 << 16
key = rng.render_key(0)
rs = np.random.RandomState(0)
o = jnp.asarray(rs.randn(N, 3) * 5, jnp.float32)
d = jnp.asarray(rs.randn(N, 3), jnp.float32)
tme = jnp.zeros((N,), jnp.float32)
keys = rng.path_keys(key, jnp.arange(N, dtype=jnp.int32), 0)
depth = jnp.zeros((N,), jnp.int32)
thru = jnp.ones((N, 3), jnp.float32)
rad = jnp.zeros((N, 3), jnp.float32)
active = jnp.ones((N,), bool)


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:8.2f} ms  ({N/dt/1e6:8.1f} M/s)", flush=True)
    return dt


# 1. one full bounce
bounce = jax.jit(lambda o, d, t, k, dep, th, ra, ac: path_mod.bounce_rgb(
    cs, meta, settings, intersect, o, d, t, k, dep, th, ra, ac))
timeit("bounce_rgb", bounce, o, d, tme, keys, depth, thru, rad, active)

# 2. intersect alone
isect = jax.jit(lambda o, d, t: intersect(o, d, t, 1e-3, 3e38))
timeit("intersect (4 prims MXU)", isect, o, d, tme)

# 3. texture gather alone (image eval at N uv points)
u = jnp.asarray(rs.rand(N), jnp.float32)
v = jnp.asarray(rs.rand(N), jnp.float32)
tid = jnp.asarray(rs.randint(0, int(cs.textures.kind.shape[0]), N), jnp.int32)
p = o
tex_eval = jax.jit(lambda tid, u, v, p: tt.eval_rgb(
    cs.textures, tid, u, v, p, has_checker=False, has_image=True,
    has_noise=False))
timeit("eval_rgb (1 image gather)", tex_eval, tid, u, v, p)

# 4. raw gather from the image stack
img = cs.textures.images
ji = jnp.asarray(rs.randint(0, img.shape[1], N), jnp.int32)
ii = jnp.asarray(rs.randint(0, img.shape[2], N), jnp.int32)
gid = jnp.asarray(rs.randint(0, img.shape[0], N), jnp.int32)
raw_gather = jax.jit(lambda g, j, i: img[g, j, i])
timeit("raw images[g,j,i] gather", raw_gather, gid, ji, ii)

# flat variant
flat = img.reshape(-1, 3)
lin = (gid * img.shape[1] + ji) * img.shape[2] + ii
flat_gather = jax.jit(lambda l: flat[l])
timeit("flat (M,3) row gather", flat_gather, lin)

# 5. full pool render timing at bench shape
run = ctx.pool_runner(128, 128, False, 0, settings)
out = run(key, 32, 1 << 16, jnp.int32(0))
jax.block_until_ready(out)
t0 = time.perf_counter()
out = run(key, 32, 1 << 16, jnp.int32(0))
jax.block_until_ready(out)
dt = time.perf_counter() - t0
nrays = int(out[1])
print(f"pool 128x128@32: {dt:.2f}s rays={nrays} -> "
      f"{nrays/dt/1e6:.2f} Mrays/s", flush=True)
