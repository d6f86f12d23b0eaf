"""pbr_ibl pool-size and scheduler sweep on the chip (round 4)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.integrator import wavefront
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.misc import pbr_ibl

NX = NY = 256
SPP = 256
scene = pbr_ibl()
ctx = renderer.RenderContext(scene)
settings = path_mod.RenderSettings(max_depth=16)

for pool in (1 << 18, 1 << 19, 1 << 20):
    kwargs = dict(settings=settings, seed=0, context=ctx,
                  sampler_type="colour", mode="wavefront", pool_size=pool)
    renderer.render(None, NX, NY, SPP, **kwargs)
    t0 = time.time()
    res = renderer.render(None, NX, NY, SPP, **kwargs)
    print(f"pinned pool={pool}: {res.mrays_per_sec:7.2f} Mrays/s "
          f"({res.rays_traced} rays, {res.seconds:.2f}s)", flush=True)

# queue scheduler: force by rendering a frame larger than the pool?  No —
# call trace_pool's queue variant directly at the same workload.
from izpi_tpu.core import rng  # noqa: E402

cs, meta, intersect = ctx.cs, ctx.meta, ctx.intersect
for pool in (1 << 18, 1 << 19):
    run = jax.jit(lambda key: wavefront._trace_pool_queue(
        cs, meta, settings, intersect, NX, NY, SPP, key, pool,
        spectral=False, bg_spd_id=0, sample_offset=0))
    key = rng.render_key(0)
    acc, nrays = jax.block_until_ready(run(key))
    t0 = time.time()
    acc, nrays = jax.block_until_ready(run(key))
    dt = time.time() - t0
    print(f"queue  pool={pool}: {int(nrays)/dt/1e6:7.2f} Mrays/s "
          f"({int(nrays)} rays, {dt:.2f}s)", flush=True)
