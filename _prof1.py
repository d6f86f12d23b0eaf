import time, jax, jax.numpy as jnp
from functools import partial
from izpi_tpu.integrator import path as path_mod, wavefront
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.cornell import cornell_box
from izpi_tpu.core import rng

nx = ny = 256; spp = 64
settings = path_mod.RenderSettings(max_depth=50)
scene = cornell_box(aspect=nx/ny)
cs, meta, intersect = renderer.prepare(scene)
base_key = rng.render_key(0)

@partial(jax.jit, static_argnames=("n_spp","pool"))
def run(key, n_spp, pool, off):
    return wavefront.trace_pool(cs, meta, settings, intersect, nx, ny, n_spp, key, pool, sample_offset=off)

for pool in (1<<16, 1<<18, 1<<20):
    acc, nrays = run(base_key, spp, pool, jnp.int32(0)); jax.block_until_ready(acc)
    t0 = time.perf_counter()
    acc, nrays = run(base_key, spp, pool, jnp.int32(0)); jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    print(f"pool={pool}: {dt:.3f}s  {int(nrays)/dt/1e6:.1f} Mrays/s  nrays={int(nrays)}")
