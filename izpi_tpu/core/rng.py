"""Stateless RNG plumbing.

The reference threads a per-goroutine LCG (internal/fastrandom/fastrandom.go)
through the whole call graph — already "counter-style RNG passed explicitly",
which maps 1:1 onto stateless jax.random Threefry keys:

- one base key per render,
- folded with the flat pixel index and the sample index to give every
  (pixel, sample) path an independent stream,
- folded with the bounce depth and a per-use salt inside the wavefront loop.

Exact sequence parity with the Go LCG is deliberately NOT a goal: parity tests
compare converged images (BASELINE.md), not sample-level bitstreams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def render_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def path_keys(base_key: jax.Array, pixel_ids: jax.Array, sample_id) -> jax.Array:
    """Per-path keys: fold the flat pixel index and sample index into the key.

    pixel_ids: (N,) int32. Returns (N, 2) uint32 keys (vmapped fold_in).
    """
    k = jax.random.fold_in(base_key, sample_id)
    return jax.vmap(lambda p: jax.random.fold_in(k, p))(pixel_ids)


def bounce_uniforms(keys: jax.Array, depth, n: int, salt: int = 0) -> jax.Array:
    """n independent U[0,1) per ray for a given bounce.

    keys: (N, 2) per-path keys; depth: scalar int (traced ok).
    Returns (N, n) float32.
    """
    def one(k):
        kk = jax.random.fold_in(jax.random.fold_in(k, depth), salt)
        return jax.random.uniform(kk, (n,), dtype=jnp.float32)

    return jax.vmap(one)(keys)


def uniforms(key: jax.Array, shape) -> jax.Array:
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def path_keys_perray(base_key: jax.Array, pixel_ids: jax.Array,
                     sample_ids: jax.Array) -> jax.Array:
    """Per-path keys with per-ray sample indices (pool scheduling).
    Identical stream to path_keys: fold sample, then pixel."""
    def one(p, s):
        return jax.random.fold_in(jax.random.fold_in(base_key, s), p)

    return jax.vmap(one)(pixel_ids, sample_ids)


def bounce_uniforms_perray(keys: jax.Array, depths: jax.Array, n: int,
                           salt: int = 0) -> jax.Array:
    """bounce_uniforms with a per-ray depth (pool slots hold paths of mixed
    ages). Same stream as bounce_uniforms for equal depths."""
    def one(k, dep):
        kk = jax.random.fold_in(jax.random.fold_in(k, dep), salt)
        return jax.random.uniform(kk, (n,), dtype=jnp.float32)

    return jax.vmap(one)(keys, depths)
