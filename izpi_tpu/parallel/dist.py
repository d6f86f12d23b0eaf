"""Multi-chip scale-out: shard_map over a device mesh.

Replaces the reference's entire distribution stack (gRPC leader/worker tile
streaming, mDNS discovery, asset streaming — internal/leader, internal/worker,
internal/transport; SURVEY.md §2.6) with the TPU-native design:

- image pixels (izpi's tiles) are sharded over the mesh axis 'tiles' — the
  data-parallel axis of this workload,
- the compiled scene is replicated to every device (the analog of each worker
  fetching the whole scene and building its own BVH, worker/setup.go:155-388),
- the ray counter is a psum (the analog of RenderEnd stats collection,
  renderer.go:203-211),
- the differentiable path all-reduces parameter gradients over ICI
  (jax.grad over shard_map inserts the psum automatically).

Multi-host: run one process per host with jax.distributed.initialize();
jax.devices() then spans the pod slice and the same mesh code scales — no
bespoke RPC layer exists or is needed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from izpi_tpu.core import rng
from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer as renderer_mod
from izpi_tpu.scene import types as st
from izpi_tpu.scene.compiler import compile_scene

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (TILE_AXIS,))


def _pad_to(x, n, fill=0):
    pad = (-x.shape[0]) % n
    if pad == 0:
        return x, 0
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill), pad


def build_sharded_sampler(cs, meta, settings, intersect, nx, ny, mesh: Mesh):
    """Returns a jitted fn(xs, ys, key, n_spp) -> (color (N,3), rays ())
    with pixels sharded over the mesh and the scene replicated."""

    @partial(jax.jit, static_argnames=("n_spp",))
    def run(xs, ys, key, n_spp):
        def shard_body(cs_rep, xs, ys, key):
            def body(s, carry):
                acc, rays = carry
                color, nrays = renderer_mod.sample_pass(
                    cs_rep, meta, settings, intersect, nx, ny, xs, ys, key, s
                )
                return acc + color, rays + nrays

            acc0 = jnp.zeros((xs.shape[0], 3), jnp.float32) + (
                xs * 0
            ).astype(jnp.float32)[:, None]
            rays0 = jnp.sum(xs * 0)
            acc, rays = jax.lax.fori_loop(0, n_spp, body, (acc0, rays0))
            # Total ray count over the mesh (RenderEnd psum analog).
            rays = jax.lax.psum(rays, TILE_AXIS)
            return acc / n_spp, rays

        fn = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P()),
            out_specs=(P(TILE_AXIS), P()),
        )
        return fn(cs, xs, ys, key)

    return run


def render_distributed(scene: st.Scene, nx: int, ny: int, spp: int,
                       mesh: Optional[Mesh] = None,
                       settings: Optional[path_mod.RenderSettings] = None,
                       seed: int = 0) -> renderer_mod.RenderResult:
    """Whole-image render with pixels sharded across the mesh."""
    import time as time_mod

    settings = settings or path_mod.RenderSettings()
    mesh = mesh or make_mesh()
    cs, meta, intersect = renderer_mod.prepare(scene)
    n_dev = mesh.devices.size

    ys = jnp.repeat(jnp.arange(ny, dtype=jnp.int32), nx)
    xs = jnp.tile(jnp.arange(nx, dtype=jnp.int32), ny)
    xs, pad = _pad_to(xs, n_dev)
    ys, _ = _pad_to(ys, n_dev)

    run = build_sharded_sampler(cs, meta, settings, intersect, nx, ny, mesh)
    t0 = time_mod.perf_counter()
    color, rays = run(xs, ys, rng.render_key(seed), spp)
    color = np.asarray(color)
    seconds = time_mod.perf_counter() - t0

    if pad:
        color = color[:-pad]
    image = color.reshape(ny, nx, 3)[::-1]
    return renderer_mod.RenderResult(
        image=image, rays_traced=int(rays), seconds=seconds
    )


# ---------------------------------------------------------------------------
# Differentiable render step (the "training step" of this framework): render
# sharded pixels, compare to a target, all-reduce parameter gradients.
# ---------------------------------------------------------------------------


def extract_params(cs):
    """The differentiable parameter pytree: material/texture/light knobs
    (BASELINE: 'differentiable w.r.t. material/texture/light parameters')."""
    return {
        "tex_c0": cs.textures.c0,
        "tex_c1": cs.textures.c1,
        "tex_images": cs.textures.images,
        "mat_absorption": cs.materials.absorption,
        "mat_fuzz": cs.materials.fuzz,
        "spd_table": cs.spd_table,
    }


def inject_params(cs, params):
    textures = cs.textures._replace(
        c0=params["tex_c0"], c1=params["tex_c1"], images=params["tex_images"]
    )
    materials = cs.materials._replace(
        absorption=params["mat_absorption"], fuzz=params["mat_fuzz"]
    )
    return cs._replace(
        textures=textures, materials=materials, spd_table=params["spd_table"]
    )


def build_train_step(cs, meta, settings, intersect, nx, ny, mesh: Mesh,
                     spp: int = 1):
    """Returns jitted fn(params, xs, ys, target, key) -> (loss, grads).

    Pixels sharded over 'tiles'; loss is the global mean squared error; grads
    are identical (all-reduced) on every device — the ICI gradient
    all-reduce that replaces nothing in izpi (it has no differentiable path)
    but fulfils the BASELINE contract.
    """

    def local_loss(params, xs, ys, target, key):
        cs_p = inject_params(cs, params)

        def body(s, acc):
            color, _ = renderer_mod.sample_pass(
                cs_p, meta, settings, intersect, nx, ny, xs, ys, key, s,
                differentiable=True,
            )
            return acc + color

        acc0 = jnp.zeros((xs.shape[0], 3), jnp.float32) + (
            xs * 0
        ).astype(jnp.float32)[:, None]
        acc = jax.lax.fori_loop(0, spp, body, acc0)
        color = acc / spp
        # Global mean: sum locally, psum, divide by global count.
        se = jnp.sum((color - target) ** 2)
        n_total = jax.lax.psum(jnp.float32(xs.shape[0] * 3), TILE_AXIS)
        return jax.lax.psum(se, TILE_AXIS) / n_total

    def shard_body(params, xs, ys, target, key):
        loss, grads = jax.value_and_grad(local_loss)(params, xs, ys, target, key)
        # value_and_grad of a psum'd loss already yields summed gradients;
        # psum again is NOT needed — grads of replicated params under
        # shard_map are averaged via the psum inside the loss.
        return loss, grads

    @jax.jit
    def step(params, xs, ys, target, key):
        fn = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P()),
            out_specs=(P(), P()),
        )
        return fn(params, xs, ys, target, key)

    return step
