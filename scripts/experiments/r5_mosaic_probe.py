"""Round-5 probe: Mosaic mechanics needed by the per-row-stack traversal
kernel and the in-kernel MXU intersector.

Questions (each gated so one failure doesn't kill the rest):
  1. reshape (16,128) -> (1,2048) inside a kernel (lane-collapse)
  2. 2D transpose (16,128) -> (128,16)
  3. jnp.dot in-kernel: (128,16)@(16,768) and (2048,16)@(16,768),
     bf16_3x vs highest
  4. static lane slice broadcast: pblk[:, f:f+1] -> (8,1) used in (8,128) op
  5. per-row dynamic sublane slice: nodebuf[r:r+1,:] = tab[pl.ds(idx_r,1),:]
  6. VMEM ref scalar read (vector -> scalar handoff): flags[r, 0]
  7. SMEM (8, K) per-row stacks with scalar push/pop
Timing: per-step cost of a fake 8-row-stack traversal skeleton.
"""
import sys
sys.path.insert(0, "/root/repo")
import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tryit(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {out}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)
        return False


# ---- 1. reshape (16,128) -> (1,2048) ----
def t_reshape():
    def k(x_ref, o_ref):
        x = x_ref[:]
        y = x.reshape(1, 2048)
        o_ref[:] = y
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32))(x)
    ok = np.allclose(np.asarray(out).ravel(), np.arange(2048))
    return f"correct={ok}"


# ---- 2. transpose ----
def t_transpose():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].T
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 16), jnp.float32))(x)
    return f"correct={np.allclose(np.asarray(out), np.asarray(x).T)}"


# ---- 3. in-kernel matmul ----
def t_dot(m, prec):
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], precision=prec,
                           preferred_element_type=jnp.float32)
    a = jnp.asarray(np.random.rand(m, 16), jnp.float32)
    b = jnp.asarray(np.random.rand(16, 768), jnp.float32)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((m, 768), jnp.float32))
    out = f(a, b)
    ref = np.asarray(a) @ np.asarray(b)
    err = float(np.abs(np.asarray(out) - ref).max() / np.abs(ref).max())
    return f"relerr={err:.2e}"


# ---- 4/5/6/7 + timing: fake row-stack skeleton ----
TS = 8
KST = 96


def rowstack_kernel(steps_ref, tab_hbm, ox, oy, oz, out,
                    nodebuf, stacks_smem, flagbuf, tab_vmem, sem,
                    *, n_nodes):
    # one-shot DMA of the node table HBM->VMEM
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp = pltpu.make_async_copy(tab_hbm, tab_vmem, sem)
        cp.start()
        cp.wait()

    # init per-row stacks: row r starts at node r
    for r in range(TS):
        stacks_smem[r, 0] = r
    acc = jnp.zeros((TS, 128), jnp.float32)
    o = (ox[:], oy[:], oz[:])
    n_steps = steps_ref[0]

    def body(i, carry):
        acc, sps = carry
        # per-row pops (sp held in an SMEM row to exercise scalar memory)
        for r in range(TS):
            spr = sps[r]
            node = stacks_smem[r, jnp.maximum(spr - 1, 0)]
            node = jnp.clip(node, 0, n_nodes - 1)
            # (5) per-row dynamic sublane slice into scratch
            nodebuf[r, :] = tab_vmem[node, :]
        nb = nodebuf[:]
        # (4) static lane-slice broadcast math: 4-child slab-ish test
        tn = jnp.full((TS, 128), -1e30, jnp.float32)
        tf = jnp.full((TS, 128), 1e30, jnp.float32)
        for s in range(4):
            for ax in range(3):
                lo = nb[:, ax * 4 + s][:, None]
                hi = nb[:, 12 + ax * 4 + s][:, None]
                t0 = (lo - o[ax]) * 0.5
                t1 = (hi - o[ax]) * 0.5
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = tf > tn
        acc = acc + jnp.where(hit, 1.0, 0.0)
        # (6) vector->scalar handoff: per-row any-hit flags via VMEM ref
        flagbuf[:, :] = jnp.max(jnp.where(hit, 1.0, 0.0), axis=1,
                                keepdims=True)
        new_sps = []
        for r in range(TS):
            anyr = flagbuf[r, 0] > 0.0
            spr = sps[r]
            # fake push/pop: pop one, push two when hit (bounded)
            child = (stacks_smem[r, jnp.maximum(spr - 1, 0)] * 2 + 1)
            child = jnp.where(child >= n_nodes, 0, child)
            npush = jnp.where(anyr, 2, 0).astype(jnp.int32)
            stacks_smem[r, jnp.minimum(spr, KST - 1)] = child
            stacks_smem[r, jnp.minimum(spr + 1, KST - 1)] = child + 1
            new_sps.append(
                jnp.clip(spr - 1 + npush, 1, KST - 2))
        return acc, tuple(new_sps)

    init_sps = tuple(jnp.int32(1) for _ in range(TS))
    acc, _ = jax.lax.fori_loop(0, n_steps, body, (acc, init_sps))
    out[:] = acc


def t_rowstack(n_nodes=8192, steps=100, n_grid=64):
    tab = jnp.asarray(np.random.rand(n_nodes, 128), jnp.float32)
    rays = jnp.asarray(np.random.rand(3, n_grid * TS, 128), jnp.float32)
    spec = pl.BlockSpec((TS, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(rowstack_kernel, n_nodes=n_nodes),
        grid=(n_grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)] + [spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_grid * TS, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TS, 128), jnp.float32),
            pltpu.SMEM((TS, KST), jnp.int32),
            pltpu.VMEM((TS, 1), jnp.float32),
            pltpu.VMEM((n_nodes, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(n_nodes * 128 * 4 + (8 << 20))),
    )

    def run(steps_v):
        return call(jnp.asarray([steps_v], jnp.int32), tab,
                    rays[0], rays[1], rays[2])

    out = jax.block_until_ready(run(steps))
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = run(steps)
    jax.block_until_ready(out)
    per_call = (time.time() - t0) / reps
    # subtract fixed cost via a 10x-steps run
    out = jax.block_until_ready(run(steps * 10))
    t0 = time.time()
    for _ in range(reps):
        out = run(steps * 10)
    jax.block_until_ready(out)
    per_call10 = (time.time() - t0) / reps
    step_ns = (per_call10 - per_call) / (9 * steps * n_grid) * 1e9
    return (f"call({steps} steps x {n_grid} tiles)={per_call*1e3:.2f}ms "
            f"10x={per_call10*1e3:.2f}ms -> {step_ns:.0f} ns/step/tile")


# ---- leaf-phase cost: 16-prim test with per-row operands ----
def leaf_kernel(nit_ref, blk, ox, oy, oz, out, *, n_prims):
    o = (ox[:], oy[:], oz[:])
    b = blk[:]                      # (TS, n_prims*16) per-row blocks
    acc = jnp.zeros((TS, 128), jnp.float32)

    def body(i, acc):
        best = jnp.full((TS, 128), 1e30, jnp.float32)
        for k in range(n_prims):
            def f(c, k=k):
                return b[:, k * 16 + c][:, None]
            hx = o[1] * f(8) - o[2] * f(7)
            hy = o[2] * f(6) - o[0] * f(8)
            hz = o[0] * f(7) - o[1] * f(6)
            a = f(3) * hx + f(4) * hy + f(5) * hz
            par = jnp.abs(a) < 1e-8
            inv = 1.0 / jnp.where(par, 1.0, a)
            sx, sy, sz = o[0] - f(0), o[1] - f(1), o[2] - f(2)
            u = inv * (sx * hx + sy * hy + sz * hz)
            qx = sy * f(5) - sz * f(4)
            qy = sz * f(3) - sx * f(5)
            qz = sx * f(4) - sy * f(3)
            v = inv * (o[0] * qx + o[1] * qy + o[2] * qz)
            t = inv * (f(6) * qx + f(7) * qy + f(8) * qz)
            ok = (~par) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            best = jnp.where(ok & (t < best), t, best)
        return acc + jnp.where(best < 1e30, best, 0.0) + i * 0.0

    acc = jax.lax.fori_loop(0, nit_ref[0], body, acc)
    out[:] = acc


def t_leafphase(n_prims=16, n_grid=64, iters=50):
    blk = jnp.asarray(np.random.rand(n_grid * TS, n_prims * 16),
                      jnp.float32)
    rays = jnp.asarray(np.random.rand(3, n_grid * TS, 128), jnp.float32)
    rspec = pl.BlockSpec((TS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((TS, n_prims * 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(leaf_kernel, n_prims=n_prims),
        grid=(n_grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec] +
                 [rspec] * 3,
        out_specs=rspec,
        out_shape=jax.ShapeDtypeStruct((n_grid * TS, 128), jnp.float32),
    )

    def run(it):
        return call(jnp.asarray([it], jnp.int32), blk,
                    rays[0], rays[1], rays[2])

    jax.block_until_ready(run(iters))
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = run(iters)
    jax.block_until_ready(out)
    t1 = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        out = run(iters * 10)
    jax.block_until_ready(out)
    t10 = (time.time() - t0) / reps
    ns = (t10 - t1) / (9 * iters * n_grid) * 1e9
    return (f"{n_prims}-prim leaf phase: {ns:.0f} ns/phase/tile "
            f"({ns/n_prims:.1f} ns/prim, serves {TS} rows)")


# ---- row gather race: (N,8) row gather vs 7 scalar gathers ----
def t_rowgather(n=262144):
    packed = jnp.asarray(np.random.rand(n, 8), jnp.float32)
    cols = [jnp.asarray(np.random.rand(n), jnp.float32) for _ in range(7)]
    idx = jnp.asarray(np.random.permutation(n), jnp.int32)

    @jax.jit
    def rowg(idx):
        return packed[idx]

    @jax.jit
    def colg(idx):
        return [c[idx] for c in cols]

    jax.block_until_ready(rowg(idx)); jax.block_until_ready(colg(idx))
    t0 = time.time()
    for _ in range(20):
        out = rowg(idx)
    jax.block_until_ready(out)
    tr = (time.time() - t0) / 20
    t0 = time.time()
    for _ in range(20):
        out = colg(idx)
    jax.block_until_ready(out)
    tc = (time.time() - t0) / 20
    return f"row-gather {tr*1e3:.2f}ms vs 7-col {tc*1e3:.2f}ms @ {n} rays"


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    tryit("reshape (16,128)->(1,2048)", t_reshape)
    tryit("transpose (16,128)->(128,16)", t_transpose)
    for m in (128, 2048):
        for prec in ("highest", "bfloat16_3x"):
            try:
                p = dict(highest=jax.lax.Precision.HIGHEST,
                         bfloat16_3x=jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3,
                         )[prec]
            except Exception:
                p = jax.lax.Precision.HIGHEST
            tryit(f"dot ({m},16)@(16,768) prec={prec}",
                  functools.partial(t_dot, m, p))
    tryit("rowstack skeleton", t_rowstack)
    tryit("leaf phase 16-prim", functools.partial(t_leafphase, 16))
    tryit("leaf phase 64-prim", functools.partial(t_leafphase, 64))
    tryit("row-gather race", t_rowgather)
