"""Race image-texture lookup forms at pbr_ibl scale (1M lookups/bounce):
a) (I,H,W,3) row gather  b) 3 flat scalar gathers  c) one packed-u32
gather + RGB9E5 decode. Strong data dependence via index feedback."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 40
N = 1 << 20
I, H, W = 13, 512, 1024
rs = np.random.RandomState(0)
imgs = jnp.asarray(rs.rand(I, H, W, 3).astype(np.float32))
flat = imgs.reshape(-1)

# RGB9E5 pack (shared exponent, 9-bit mantissas)
def pack_rgb9e5(a):
    a = np.maximum(np.asarray(a, np.float64), 0.0)
    m = a.max(axis=-1)
    exp = np.clip(np.floor(np.log2(np.maximum(m, 1e-30))) + 1, -15, 16)
    scale = 2.0 ** (exp - 9)
    mant = np.clip((a / scale[..., None]).astype(np.int64), 0, 511)
    return (mant[..., 0] | (mant[..., 1] << 9) | (mant[..., 2] << 18)
            | ((exp.astype(np.int64) + 15) << 27)).astype(np.uint32)


packed = jnp.asarray(pack_rgb9e5(np.asarray(imgs)))

img_id0 = jnp.asarray(rs.randint(0, I, N), jnp.int32)
jj0 = jnp.asarray(rs.randint(0, H, N), jnp.int32)
ii0 = jnp.asarray(rs.randint(0, W, N), jnp.int32)


def run(name, body):
    f = jax.jit(lambda s: jax.lax.fori_loop(0, ITERS,
                                            lambda i, st: body(st), s))
    s0 = (img_id0, jj0, ii0, jnp.zeros(N, jnp.float32))
    out = jax.block_until_ready(f(s0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(s0))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms/iter ({N/dt/1e6:7.0f} M lookups/s)",
          flush=True)


def dep(rgb, st):
    img_id, jj, ii, acc = st
    jj = (jj + (rgb[:, 0] * 7).astype(jnp.int32)) % H
    ii = (ii + (rgb[:, 1] * 7).astype(jnp.int32)) % W
    return (img_id, jj, ii, acc + rgb[:, 2])


def v_row(st):
    img_id, jj, ii, acc = st
    rgb = imgs[img_id, jj, ii]
    return dep(rgb, st)


def v_flat3(st):
    img_id, jj, ii, acc = st
    base = ((img_id * H + jj) * W + ii) * 3
    rgb = jnp.stack([flat[base], flat[base + 1], flat[base + 2]], axis=-1)
    return dep(rgb, st)


def v_packed(st):
    img_id, jj, ii, acc = st
    idx = (img_id * H + jj) * W + ii
    p = packed.reshape(-1)[idx]
    mant = jnp.stack([p & 0x1FF, (p >> 9) & 0x1FF, (p >> 18) & 0x1FF],
                     axis=-1).astype(jnp.float32)
    exp = ((p >> 27) & 0x1F).astype(jnp.int32) - 15 - 9
    rgb = mant * jnp.exp2(exp.astype(jnp.float32))[:, None]
    return dep(rgb, st)


run("a) (I,H,W,3) row gather", v_row)
run("b) 3 flat scalar gathers", v_flat3)
run("c) packed u32 + RGB9E5 decode", v_packed)

# accuracy check
rgb_ref = np.asarray(imgs[img_id0[:1000], jj0[:1000], ii0[:1000]])
p = np.asarray(packed.reshape(-1)[((img_id0[:1000] * H + jj0[:1000]) * W
                                   + ii0[:1000])])
mant = np.stack([p & 0x1FF, (p >> 9) & 0x1FF, (p >> 18) & 0x1FF], -1)
exp = ((p >> 27) & 0x1F).astype(np.int64) - 24
dec = mant * (2.0 ** exp)[:, None]
rel = np.abs(dec - rgb_ref) / np.maximum(rgb_ref.max(-1, keepdims=True),
                                         1e-6)
print(f"RGB9E5 max rel err vs f32: {rel.max():.4f}", flush=True)
