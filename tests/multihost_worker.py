"""Subprocess body for test_multihost: one process of a 2-process JAX
cluster. Forms the cluster via izpi_tpu.parallel.dist.initialize_multihost
(the replacement for the reference's mDNS discovery + gRPC setup handshake,
internal/leader/setup.go:22-131), renders a tiny frame with the production
sample-sharded pool over the GLOBAL 4-device mesh, and (rank 0) writes the
image + ray count for the parent test to compare."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

coordinator, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from izpi_tpu.parallel import dist  # noqa: E402

n_proc = dist.initialize_multihost(coordinator=coordinator,
                                   num_processes=2, process_id=pid)
assert n_proc == 2, n_proc
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()       # 2 local + 2 remote
assert len(jax.local_devices()) == 2

from izpi_tpu.integrator import path as path_mod  # noqa: E402
from izpi_tpu.scene.library.cornell import cornell_box  # noqa: E402

settings = path_mod.RenderSettings(max_depth=3)
res = dist.render_distributed(cornell_box(aspect=1.0), 16, 16, 4,
                              settings=settings, seed=0)
if pid == 0:
    np.savez(out_path, image=res.image, rays=res.rays_traced)
print(f"rank {pid} ok rays={res.rays_traced}", flush=True)
