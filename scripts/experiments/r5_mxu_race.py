"""Round-5: race the in-kernel MXU intersector against the unrolled VPU
scan at Shirley scale (VERDICT r4 #2).

Toy workload: 560 static spheres, (16,128)-tile of rays, closest-hit with
normals — the megakernel's per-bounce intersection. Three kernels:
  A: unrolled VPU sphere scan (the production megakernel form)
  B: MXU K^T@F per 64-prim chunk + component-blocked epilogue
     (precision=HIGHEST, 6-pass f32)
  C: B at bf16_3x (if the lowering accepts a DotAlgorithmPreset)
Each runs ITERS intersections inside one kernel with output feedback (so
XLA can't CSE), per-iteration cost reported; plus a cross-check of t/idx.
"""
import sys
sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 560
TILE_S = 16
N = TILE_S * 128
N_GRID = 32             # tiles per launch: lifts runtime over the ~0.1 s
ITERS = 64              # dispatch floor so the 1x/4x diff is measurable
CHUNK = 64

rs = np.random.RandomState(0)
centers = (rs.rand(P, 3) * 20.0 - 10.0).astype(np.float64)
radii = (rs.rand(P) * 0.4 + 0.2).astype(np.float64)

o_np = (rs.rand(N, 3) * 20.0 - 10.0).astype(np.float32)
d_np = rs.randn(N, 3).astype(np.float32)

T_MAX = 3.0e38


# ---------------- A: unrolled VPU scan ----------------

def kern_vpu(it_ref, ox, oy, oz, dx, dy, dz, t_out, i_out):
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    a_safe = jnp.where(a == 0.0, 1.0, a)

    def body(i, carry):
        t_acc, i_acc = carry
        best = jnp.full((TILE_S, 128), T_MAX, jnp.float32)
        idx = jnp.full((TILE_S, 128), -1, jnp.int32)
        # REAL data feedback so the prim loop can't be hoisted out of the
        # fori body (an x*0 feedback constant-folds away).
        oxx = o[0] + t_acc * jnp.float32(1e-30)
        for k in range(P):
            cx, cy, cz = (float(centers[k][0]), float(centers[k][1]),
                          float(centers[k][2]))
            r = float(radii[k])
            ocx, ocy, ocz = oxx - cx, o[1] - cy, o[2] - cz
            b = ocx * d[0] + ocy * d[1] + ocz * d[2]
            cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b * b - a * cq
            has = disc > 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_near = (-b - sq) / a_safe
            t_far = (-b + sq) / a_safe
            near_ok = has & (t_near < best) & (t_near > 1e-3)
            far_ok = has & (t_far < best) & (t_far > 1e-3) & ~near_ok
            t_k = jnp.where(near_ok, t_near, t_far)
            ok = near_ok | far_ok
            best = jnp.where(ok, t_k, best)
            idx = jnp.where(ok, k, idx)
        return best, idx

    t, i = jax.lax.fori_loop(0, it_ref[0], body,
                             (jnp.zeros((TILE_S, 128), jnp.float32),
                              jnp.zeros((TILE_S, 128), jnp.int32)))
    t_out[:] = t
    i_out[:] = i


# ---------------- B/C: MXU chunked matmul ----------------
# K rows (features): [ox,oy,oz, dx,dy,dz, 1] -> 7 used, padded to 8.
# Sphere columns per prim: c0 = c.d (d block), c1 = c.o (o block),
# c2 = |c|^2 - r^2 (const). Component-blocked: chunk columns are
# [c0 x64 | c1 x64 | c2 x64].

n_chunks = -(-P // CHUNK)
P_pad = n_chunks * CHUNK
K_np = np.zeros((8, n_chunks, 3 * CHUNK), np.float64)
for k in range(P):
    ch, j = divmod(k, CHUNK)
    c = centers[k]
    K_np[3:6, ch, 0 * CHUNK + j] = c            # c.d
    K_np[0:3, ch, 1 * CHUNK + j] = c            # c.o
    K_np[6, ch, 2 * CHUNK + j] = c @ c - radii[k] ** 2
K_f32 = K_np.astype(np.float32)


def make_kern_mxu(precision):
    def kern(it_ref, kt_ref, ox, oy, oz, dx, dy, dz, t_out, i_out):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        a2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        o_dot_o = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]
        o_dot_d = o[0] * d[0] + o[1] * d[1] + o[2] * d[2]
        flat = lambda x: x.reshape(1, N)
        f = jnp.concatenate(
            [flat(o[0]), flat(o[1]), flat(o[2]),
             flat(d[0]), flat(d[1]), flat(d[2]),
             jnp.ones((1, N), jnp.float32),
             jnp.zeros((1, N), jnp.float32)], axis=0)     # (8, N)
        a_flat = flat(a2)
        a_safe = jnp.where(a_flat == 0.0, 1.0, a_flat)
        oo_flat = flat(o_dot_o)
        od_flat = flat(o_dot_d)

        def body(i, carry):
            t_acc, i_acc = carry
            best = jnp.full((1, N), T_MAX, jnp.float32)
            idx = jnp.full((1, N), -1, jnp.int32)
            fi = f + t_acc.reshape(1, N) * jnp.float32(1e-30)
            for ch in range(n_chunks):
                kt = kt_ref[ch * 3 * CHUNK:(ch + 1) * 3 * CHUNK, :]
                at = jax.lax.dot_general(
                    kt, fi, (((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)    # (192, N)
                c0 = at[0 * CHUNK:1 * CHUNK]               # c.d
                c1 = at[1 * CHUNK:2 * CHUNK]               # c.o
                c2 = at[2 * CHUNK:3 * CHUNK]               # |c|^2-r^2
                b = od_flat - c0                           # (64, N)
                cq = oo_flat - 2.0 * c1 + c2
                disc = b * b - a_flat * cq
                has = disc > 0.0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t_near = (-b - sq) / a_safe
                t_far = (-b + sq) / a_safe
                near_ok = has & (t_near < best) & (t_near > 1e-3)
                far_ok = has & (t_far < best) & (t_far > 1e-3) & ~near_ok
                t_k = jnp.where(near_ok, t_near, t_far)
                ok = near_ok | far_ok
                t_masked = jnp.where(ok, t_k, T_MAX)
                cmin = jnp.min(t_masked, axis=0, keepdims=True)  # (1, N)
                rowi = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, N), 0)
                eq = (t_masked == cmin) & ok
                lidx = jnp.min(jnp.where(eq, rowi, CHUNK), axis=0,
                               keepdims=True)
                better = (cmin < best) & (lidx < CHUNK)
                best = jnp.where(better, cmin, best)
                idx = jnp.where(better, ch * CHUNK + lidx, idx)
            return best.reshape(TILE_S, 128), idx.reshape(TILE_S, 128)

        t, i = jax.lax.fori_loop(0, it_ref[0], body,
                                 (jnp.zeros((TILE_S, 128), jnp.float32),
                                  jnp.zeros((TILE_S, 128), jnp.int32)))
        t_out[:] = t
        i_out[:] = i
    return kern


KT_ALL = jnp.asarray(
    np.concatenate([K_f32[:, ch].T for ch in range(n_chunks)], axis=0))


def run_kernel(kern, name, with_k=False):
    ray_spec = pl.BlockSpec((TILE_S, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE_S, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 7 if with_k else 6
    call = pl.pallas_call(
        kern,
        grid=(N_GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + ([k_spec] if with_k else [])
                 + [ray_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N_GRID * TILE_S, 128), jnp.float32),
            jax.ShapeDtypeStruct((N_GRID * TILE_S, 128), jnp.int32)],
    )
    args = ([KT_ALL] if with_k else []) + [
            jnp.asarray(o_np[:, 0]).reshape(TILE_S, 128),
            jnp.asarray(o_np[:, 1]).reshape(TILE_S, 128),
            jnp.asarray(o_np[:, 2]).reshape(TILE_S, 128),
            jnp.asarray(d_np[:, 0]).reshape(TILE_S, 128),
            jnp.asarray(d_np[:, 1]).reshape(TILE_S, 128),
            jnp.asarray(d_np[:, 2]).reshape(TILE_S, 128)]

    def run(it):
        return call(jnp.asarray([it], jnp.int32), *args)

    try:
        t0 = time.time()
        out = jax.block_until_ready(run(ITERS))
        comp = time.time() - t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return None
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = run(ITERS)
    jax.block_until_ready(out)
    t1 = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        out2 = run(ITERS * 4)
    jax.block_until_ready(out2)
    t4 = (time.time() - t0) / reps
    per_iter = (t4 - t1) / (3 * ITERS * N_GRID)
    mrays = N / per_iter / 1e6
    print(f"{name:18s} {per_iter*1e6:8.2f} us/intersect/tile "
          f"({mrays:7.1f} M isect/s/tile)  compile {comp:.0f}s", flush=True)
    return out


print("devices:", jax.devices(), flush=True)
out_a = run_kernel(kern_vpu, "VPU scan")
out_b = run_kernel(make_kern_mxu(jax.lax.Precision.HIGHEST), "MXU highest",
                   with_k=True)
out_c = run_kernel(make_kern_mxu(jax.lax.Precision.DEFAULT),
                   "MXU default-bf16", with_k=True)

if out_a is not None and out_b is not None:
    ta, ia = (np.asarray(out_a[0])[:TILE_S], np.asarray(out_a[1])[:TILE_S])
    tb, ib = (np.asarray(out_b[0])[:TILE_S], np.asarray(out_b[1])[:TILE_S])
    print("B idx agree:", (ia == ib).mean(),
          "t relerr:", float(np.nanmax(np.abs(ta - tb)
                                       / np.maximum(np.abs(ta), 1e-6))),
          flush=True)
if out_a is not None and out_c is not None:
    ta, ia = (np.asarray(out_a[0])[:TILE_S], np.asarray(out_a[1])[:TILE_S])
    tc, ic = (np.asarray(out_c[0])[:TILE_S], np.asarray(out_c[1])[:TILE_S])
    print("C idx agree:", (ia == ic).mean(),
          "t relerr:", float(np.nanmax(np.abs(ta - tc)
                                       / np.maximum(np.abs(ta), 1e-6))),
          flush=True)
