"""Stateless RNG plumbing.

The reference threads a per-goroutine LCG (internal/fastrandom/fastrandom.go)
through the whole call graph — already "counter-style RNG passed explicitly",
which maps 1:1 onto stateless counter-based Threefry keys:

- one base key per render,
- folded with the flat pixel index and the sample index to give every
  (pixel, sample) path an independent stream,
- folded with the bounce depth and a per-use salt inside the wavefront loop.

The cipher lives in izpi_tpu.ops.threefry (plain uint32 jnp ops) so the SAME
derivation runs inside the Pallas megakernel and in the XLA oracle — the two
integrators consume bit-identical sample streams. fold_in matches
jax.random.fold_in exactly; the uniform counter layout is the classic
(non-partitionable) jax.random one (see ops.threefry.uniforms_n).

Exact sequence parity with the Go LCG is deliberately NOT a goal: parity
tests compare converged images (BASELINE.md), not sample-level bitstreams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from izpi_tpu.ops import threefry as tf


def render_key(seed: int) -> jax.Array:
    """(2,) uint32 base key — same contents as jax.random.PRNGKey(seed)."""
    return jnp.asarray(jax.random.PRNGKey(seed)).astype(jnp.uint32)


def _key_words(key: jax.Array):
    key = jnp.asarray(key).astype(jnp.uint32)
    return key[..., 0], key[..., 1]


def path_keys(base_key: jax.Array, pixel_ids: jax.Array, sample_id) -> jax.Array:
    """Per-path keys: fold the flat pixel index and sample index into the key.

    pixel_ids: (N,) int32. Returns (N, 2) uint32 keys.
    """
    k0, k1 = _key_words(base_key)
    s0, s1 = tf.fold_in(k0, k1, jnp.asarray(sample_id, jnp.uint32))
    p0, p1 = tf.fold_in(jnp.broadcast_to(s0, pixel_ids.shape),
                        jnp.broadcast_to(s1, pixel_ids.shape),
                        pixel_ids.astype(jnp.uint32))
    return jnp.stack([p0, p1], axis=-1)


def bounce_uniforms(keys: jax.Array, depth, n: int, salt: int = 0) -> jax.Array:
    """n independent U[0,1) per ray for a given bounce.

    keys: (N, 2) per-path keys; depth: scalar int (traced ok).
    Returns (N, n) float32.
    """
    return bounce_uniforms_perray(
        keys, jnp.broadcast_to(jnp.asarray(depth, jnp.int32),
                               keys.shape[:-1]), n, salt=salt)


def uniforms(key: jax.Array, shape) -> jax.Array:
    k0, k1 = _key_words(key)
    n = 1
    for dim in shape:
        n *= dim
    us = tf.uniforms_n(k0, k1, n)
    return jnp.stack(us).reshape(shape)


def path_keys_perray(base_key: jax.Array, pixel_ids: jax.Array,
                     sample_ids: jax.Array) -> jax.Array:
    """Per-path keys with per-ray sample indices (pool scheduling).
    Identical stream to path_keys: fold sample, then pixel."""
    k0, k1 = _key_words(base_key)
    k0 = jnp.broadcast_to(k0, sample_ids.shape)
    k1 = jnp.broadcast_to(k1, sample_ids.shape)
    s0, s1 = tf.fold_in(k0, k1, sample_ids.astype(jnp.uint32))
    p0, p1 = tf.fold_in(s0, s1, pixel_ids.astype(jnp.uint32))
    return jnp.stack([p0, p1], axis=-1)


def bounce_uniforms_perray(keys: jax.Array, depths: jax.Array, n: int,
                           salt: int = 0) -> jax.Array:
    """bounce_uniforms with a per-ray depth (pool slots hold paths of mixed
    ages). Same stream as bounce_uniforms for equal depths."""
    k0 = keys[..., 0].astype(jnp.uint32)
    k1 = keys[..., 1].astype(jnp.uint32)
    d0, d1 = tf.fold_in(k0, k1, depths.astype(jnp.uint32))
    f0, f1 = tf.fold_in(d0, d1, jnp.full_like(d0, salt))
    us = tf.uniforms_n(f0, f1, n)
    return jnp.stack(us, axis=-1)
