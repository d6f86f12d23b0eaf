"""ops.threefry vs jax.random: bit-identical streams.

This is the hinge that lets the Pallas megakernel reproduce the XLA oracle's
sample streams exactly (core/rng.py derivations)."""

import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu.core import rng
from izpi_tpu.ops import threefry as tf


def test_cipher_matches_jax_threefry():
    from jax._src import prng as jax_prng

    k0 = jnp.uint32([0, 1, 0xDEADBEEF, 7, 123456789])
    k1 = jnp.uint32([0, 2, 0xCAFEBABE, 9, 987654321])
    x = jnp.uint32([5, 6, 11, 0xFFFFFFFF, 42,
                    17, 18, 19, 20, 21])  # (10,) → halves (5,), (5,)
    for i in range(5):
        got = tf.threefry2x32(k0[i], k1[i], x[:5], x[5:])
        want = jax_prng.threefry_2x32((k0[i], k1[i]), x)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[:5]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[5:]))


def test_fold_in_matches_jax():
    key = jax.random.PRNGKey(1234)
    raw = jax.random.key_data(key) if hasattr(jax.random, "key_data") else key
    k0, k1 = jnp.uint32(raw[0]), jnp.uint32(raw[1])
    for d in [0, 1, 17, 65535, 2**31 - 1]:
        want = jax.random.fold_in(key, d)
        wraw = np.asarray(want)
        g0, g1 = tf.fold_in(k0, k1, jnp.uint32(d))
        assert int(g0) == int(wraw[0]) and int(g1) == int(wraw[1])


def test_uniforms_use_classic_counter_layout():
    """uniforms_n follows the classic (non-partitionable) jax.random layout:
    bits = threefry(key, [0..n-1] zero-padded to even), halves paired."""
    from jax._src import prng as jax_prng

    key = jax.random.PRNGKey(99)
    raw = np.asarray(key).astype(np.uint32)
    for n in [2, 4, 5, 12]:
        half = (n + 1) // 2
        # counter layout: halves [0..half-1] and [half..2*half-1] paired
        # (for odd n the final word is computed then dropped).
        counters = np.arange(2 * half, dtype=np.uint32)
        bits = np.asarray(jax_prng.threefry_2x32(
            (jnp.uint32(raw[0]), jnp.uint32(raw[1])),
            jnp.uint32(counters)))
        want = np.asarray(tf.bits_to_uniform(jnp.uint32(bits)))[:n]
        got = tf.uniforms_n(jnp.uint32(raw[0]), jnp.uint32(raw[1]), n)
        got = np.asarray([float(g) for g in got])
        np.testing.assert_array_equal(got, want)
        assert all(0.0 <= g < 1.0 for g in got)


def test_bounce_uniform_chain_matches_core_rng():
    """The megakernel's per-bounce derivation (fold depth, fold salt,
    uniform n) must equal core.rng.bounce_uniforms_perray bit-for-bit."""
    base = rng.render_key(5)
    pix = jnp.int32([0, 3, 77, 1024])
    samp = jnp.int32([0, 1, 2, 3])
    keys = rng.path_keys_perray(base, pix, samp)  # (4, 2) uint32
    depth = jnp.int32([0, 1, 2, 49])
    want = np.asarray(rng.bounce_uniforms_perray(keys, depth, 12, salt=7))

    k0 = keys[:, 0].astype(jnp.uint32)
    k1 = keys[:, 1].astype(jnp.uint32)
    f0, f1 = tf.fold_in(k0, k1, depth.astype(jnp.uint32))
    g0, g1 = tf.fold_in(f0, f1, jnp.full_like(f0, 7))
    us = tf.uniforms_n(g0, g1, 12)
    got = np.stack([np.asarray(u) for u in us], axis=1)
    np.testing.assert_array_equal(got, want)


def test_path_key_chain_matches_core_rng():
    base = rng.render_key(0)
    braw = np.asarray(base).astype(np.uint32)
    pix = jnp.int32([5, 6, 7])
    samp = jnp.int32([0, 9, 63])
    want = np.asarray(rng.path_keys_perray(base, pix, samp)).astype(np.uint32)
    s0, s1 = tf.fold_in(jnp.uint32(braw[0]), jnp.uint32(braw[1]),
                        samp.astype(jnp.uint32))
    p0, p1 = tf.fold_in(s0, s1, pix.astype(jnp.uint32))
    got = np.stack([np.asarray(p0), np.asarray(p1)], axis=1)
    np.testing.assert_array_equal(got, want)
