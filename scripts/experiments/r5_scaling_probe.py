"""Round-5: decompose the strong-scaling shard overhead (VERDICT r4 #5).

At the reference default workload (cornell 500x500@1000spp), the projected
strong efficiency T(spp)/(N*T(spp/N)) was 0.43 at N=8: T(125) carried
~0.235 s of fixed cost. Where? Three timings per spp:
  kernel   — megakernel runner only, result stays on device
  +sync    — plus block_until_ready
  +host    — plus np.asarray host transfer of the canvas
  render() — the full renderer.render path (what the bench measures)
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import numpy as np
import jax.numpy as jnp

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.cornell import cornell_box
from izpi_tpu.core import rng

NX = 500
settings = path_mod.RenderSettings(max_depth=8)
ctx = renderer.RenderContext(cornell_box(aspect=1.0))
key = rng.render_key(0)

for spp in (1000, 500, 250, 125):
    mega = ctx.mega_runner(NX, NX, spp, settings)
    out = mega(key, jnp.uint32(0))
    jax.block_until_ready(out)           # compile
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = mega(key, jnp.uint32(0))
    jax.block_until_ready(out)
    t_sync = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        out = mega(key, jnp.uint32(0))
        acc = np.asarray(out[0])
    t_host = (time.time() - t0) / reps
    kw = dict(settings=settings, seed=0, context=ctx)
    renderer.render(None, NX, NX, spp, **kw)
    t0 = time.time()
    res = renderer.render(None, NX, NX, spp, **kw)
    t_render = time.time() - t0
    print(f"spp {spp:5d}: sync {t_sync:.3f}s  +host {t_host:.3f}s  "
          f"render() {t_render:.3f}s", flush=True)
