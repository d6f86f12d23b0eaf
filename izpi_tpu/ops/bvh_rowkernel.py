"""Per-row-stack Pallas BVH4 traversal — round-5 redesign of the dragon path.

The union-traversal kernel (ops.bvh_kernel) visits a node when ANY of a
tile's 1024 rays wants it; for incoherent bounce rays that saturates toward
the whole tree, and the multi-round treelet re-binning that fixes it spends
6x its own kernel time on XLA-side scheduling (argmin matrices + argsorts,
docs/PERF.md round 4). This kernel moves the divergence control INTO the
kernel at sublane granularity instead:

- Each (8, 128) ray tile holds 8 ROWS of 128 rays; every row runs its OWN
  exact stack traversal (SMEM stack per row) — 8 concurrent "warps" per
  program, 8x finer than tile-union, with NO treelets, NO re-binning rounds
  and ONE coherence sort per bounce on the XLA side.
- A node step pops one node per row; the 4-wide slab test runs vectorized
  across all 8 rows at once with per-row bounds broadcast from (8, 1) lane
  slices of the gathered node rows (measured 334 ns/step,
  scripts/experiments/r5_mosaic_probe.py).
- Leaf pops enqueue their primitive-block id in a per-row SMEM queue; every
  K node steps the queue heads are drained in one batched leaf phase: 8
  HBM->VMEM block DMAs are issued, K more node steps cover the latency,
  then all 8 rows' blocks are tested simultaneously with per-row operands
  ((8,1) lane-slice broadcasts; ~21 ns/prim serving 8 rows, probe ibid).
  Rows with nothing pending simply re-test their previous (or the initial
  degenerate) block — idempotent by the strict t < t_best update.
- tMax shrink per lane narrows later slab tests exactly like the reference
  (internal/hitable/bvh4.go:130); the traversal itself is EXACT per row
  (full descent from the root, no unions beyond the 128-lane row), so
  results match brute force bit-for-bit in hit/idx given the same fp
  arithmetic — differential-tested in tests/test_bvh_rowkernel.py.

The per-goroutine analog is the reference's stack walk (bvh4.go:49-163);
the RayAABB4 SIMD kernel (bvh4_simd_*.go) maps onto the vectorized 4-wide
slab test, batched here over 8 independent rows x 128 lanes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from izpi_tpu.accel import bvh_build
from izpi_tpu.geometry import primitives as prim

TS = 8                  # rows per tile == f32 min sublane tile
KSTACK = 64             # per-row stack depth (validated at build)
QCAP = 8                # per-row pending-leaf queue
NODE_STEPS = 4          # node steps per drain (covers the 8 block DMAs)
# DMA destinations must be 8-sublane-aligned ref slices, so a per-row block
# is one (8, 128) VMEM chunk = 64 prims x 16 fields. The leaf test reads it
# through the (TS*8, 128) -> (TS, 1024) lane-collapse reshape (probed legal)
# so per-row operands are (TS, 1) static lane slices.
LEAF_SIZE = 64
T_EPS = 1e-30


class RowScene(NamedTuple):
    ntab: jax.Array      # (Nn, 128) f32 — lane-dense node rows (bounds SoA
                         #   in lanes 0..23, child[4] 24..27, count[4]
                         #   28..31 as exact f32) — same packing as
                         #   ops.bvh_kernel.KernelScene.
    pblocks: jax.Array   # (Nb*8, 128) f32 — one (8, 128) chunk per leaf
                         #   block: 64 prims x 16 fields (g0,g1,g2,g3,kind,
                         #   pad, blockid@prim0.14, has_non_tri@prim0.15)
    blockmap: jax.Array  # (Nb*64,) i32 — block slot -> prim index (-1 pad)
    leaf_size: int


def pack_scene(prims: prim.Prims, bvh: bvh_build.BVH4Arrays,
               leaf_size: int = LEAF_SIZE) -> RowScene:
    """Device tables from a built BVH over REORDERED primitives. Unlike
    ops.bvh_kernel.pack_scene the block is one contiguous (8, 128) chunk
    (the per-row DMA unit); padding rows are all-zero (degenerate
    Moller-Trumbore at KIND_TRIANGLE==0 -> guaranteed miss)."""
    assert leaf_size == LEAF_SIZE, "DMA alignment fixes the block at 64"
    g0 = np.asarray(prims.g0, np.float32)
    g1 = np.asarray(prims.g1, np.float32)
    g2 = np.asarray(prims.g2, np.float32)
    g3 = np.asarray(prims.g3, np.float32)
    kind = np.asarray(prims.kind, np.float32)

    child = np.array(bvh.child, np.int32)
    count = np.array(bvh.count, np.int32)
    leaf_nodes, leaf_slots = np.nonzero(count > 0)
    n_blocks = max(len(leaf_nodes), 1)

    rows = np.zeros((n_blocks, leaf_size, 16), np.float32)
    blockmap = np.full((n_blocks * leaf_size,), -1, np.int32)
    for b, (ni, s) in enumerate(zip(leaf_nodes, leaf_slots)):
        start, cnt = int(child[ni, s]), int(count[ni, s])
        sl = slice(start, start + cnt)
        rows[b, :cnt, 0:3] = g0[sl]
        rows[b, :cnt, 3:6] = g1[sl]
        rows[b, :cnt, 6:9] = g2[sl]
        rows[b, :cnt, 9:12] = g3[sl]
        rows[b, :cnt, 12] = kind[sl]
        rows[b, 0, 14] = float(b)
        # INVERTED flag (has_non_triangle): the initial all-zero resident
        # block then reads as triangle-only, matching its degenerate-MT
        # never-hit semantics.
        if not np.all(kind[sl] == float(prim.KIND_TRIANGLE)):
            rows[b, 0, 15] = 1.0
        blockmap[b * leaf_size: b * leaf_size + cnt] = np.arange(
            start, start + cnt)
        child[ni, s] = b

    n_nodes = child.shape[0]
    assert n_nodes < (1 << 24) and n_blocks < (1 << 24)
    ntab = np.zeros((n_nodes, 128), np.float32)
    ntab[:, :24] = bvh.bounds
    ntab[:, 24:28] = child.astype(np.float32)
    ntab[:, 28:32] = count.astype(np.float32)
    return RowScene(
        ntab=jnp.asarray(ntab),
        pblocks=jnp.asarray(rows.reshape(n_blocks * 8, 128)),
        blockmap=jnp.asarray(blockmap),
        leaf_size=leaf_size,
    )


def _row_kernel(limits_ref,                   # SMEM (1, 2): t_min, t_max
                ntab_hbm, ptab_hbm,           # ANY (HBM)
                ox, oy, oz, dx, dy, dz, tm, tcap,   # VMEM (TS,128)
                t_out, idx_out, stat_out,     # VMEM (TS,128)
                stacks, queue,                # SMEM (TS, KSTACK+1 / QCAP+1)
                pblk, sems,                   # VMEM (TS*8, 128), DMA (TS,)
                t_ref, i_ref,                 # VMEM (TS,128)
                ntab_ref, nsem,               # VMEM (Nn,128), DMA
                *, n_rays: int, tile: int, leaf_size: int, n_nodes: int):
    g = pl.program_id(0)
    t_min = limits_ref[0, 0]
    t_max = limits_ref[0, 1]

    # Node table HBM->VMEM once per launch (grid is sequential on one core;
    # scratch persists across steps — same trick as ops.bvh_kernel).
    @pl.when(g == 0)
    def _():
        cb = pltpu.make_async_copy(ntab_hbm, ntab_ref, nsem)
        cb.start()
        cb.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, (TS, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TS, 128), 1)
    slot = g * tile + row * 128 + col
    valid = slot < n_rays

    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    time = tm[:]
    big = jnp.float32(3.0e38)
    inv = tuple(1.0 / jnp.where(dc == 0.0, T_EPS, dc) for dc in d)

    t_ref[:] = jnp.where(valid,
                         jnp.minimum(jnp.minimum(t_max, big), tcap[:]),
                         t_min)
    i_ref[:] = jnp.full((TS, 128), -1, jnp.int32)

    # Initial pblk: all-zero degenerate triangles (has_non_tri flag 0, so
    # they ride the tri fast path; drains with nothing pending re-test the
    # resident block and the strict t < t_best update makes that a no-op).
    pblk[:] = jnp.zeros((TS * 8, 128), jnp.float32)
    for r in range(TS):
        stacks[r, 0] = 0

    def leaf_dma(r, block):
        # One (8, 128) chunk per block: DMA ref slices must be 8-sublane
        # aligned (Mosaic rejects 1-sublane memref slices).
        return pltpu.make_async_copy(
            ptab_hbm.at[pl.ds(block * 8, 8), :],
            pblk.at[pl.ds(r * 8, 8), :], sems.at[r])

    def _leaf_test(tri_only: bool):
        """Test every row's resident block; per-row operands come from
        (TS, 1) lane slices of pblk broadcast across the 128 lanes."""
        t_best = t_ref[:]
        idx_best = i_ref[:]
        # (TS*8, 128) -> (TS, 1024) lane-collapse: row r's lanes are its
        # block's 64x16 fields in prim-major order.
        pb = pblk[:].reshape(TS, 8 * 128)
        base = pb[:, 14:15].astype(jnp.int32) * leaf_size

        for k in range(leaf_size):
            def f(c, k=k):
                return pb[:, k * 16 + c: k * 16 + c + 1]

            g0 = (f(0), f(1), f(2))
            g1 = (f(3), f(4), f(5))
            g2 = (f(6), f(7), f(8))
            # --- triangle: Moller-Trumbore (triangle.go:193-231) ---
            hx = d[1] * g2[2] - d[2] * g2[1]
            hy = d[2] * g2[0] - d[0] * g2[2]
            hz = d[0] * g2[1] - d[1] * g2[0]
            a = g1[0] * hx + g1[1] * hy + g1[2] * hz
            parallel = jnp.abs(a) < prim.MT_EPS
            fin = 1.0 / jnp.where(parallel, 1.0, a)
            sx, sy, sz = o[0] - g0[0], o[1] - g0[1], o[2] - g0[2]
            u = fin * (sx * hx + sy * hy + sz * hz)
            qx = sy * g1[2] - sz * g1[1]
            qy = sz * g1[0] - sx * g1[2]
            qz = sx * g1[1] - sy * g1[0]
            v = fin * (d[0] * qx + d[1] * qy + d[2] * qz)
            t_tri = fin * (g2[0] * qx + g2[1] * qy + g2[2] * qz)
            eps = prim.MT_EPS
            ok_tri = ((~parallel)
                      & (u >= -eps) & (u <= 1.0 + eps)
                      & (v >= -eps) & (u + v <= 1.0 + eps))
            if tri_only:
                t_k, ok_k = t_tri, ok_tri
            else:
                g3 = (f(9), f(10), f(11))
                kind = f(12)
                # --- rect (xyrect.go family) ---
                denom = d[0] * g3[0] + d[1] * g3[1] + d[2] * g3[2]
                degen = denom == 0.0
                t_rect = ((g0[0] - o[0]) * g3[0] + (g0[1] - o[1]) * g3[1]
                          + (g0[2] - o[2]) * g3[2]) / jnp.where(
                              degen, 1.0, denom)
                px = o[0] + t_rect * d[0] - g0[0]
                py = o[1] + t_rect * d[1] - g0[1]
                pz = o[2] + t_rect * d[2] - g0[2]
                ee1 = g1[0] * g1[0] + g1[1] * g1[1] + g1[2] * g1[2]
                ee2 = g2[0] * g2[0] + g2[1] * g2[1] + g2[2] * g2[2]
                ru = (px * g1[0] + py * g1[1] + pz * g1[2]) / jnp.where(
                    ee1 == 0.0, 1.0, ee1)
                rv = (px * g2[0] + py * g2[1] + pz * g2[2]) / jnp.where(
                    ee2 == 0.0, 1.0, ee2)
                ok_rect = ((~degen) & (ru >= 0.0) & (ru <= 1.0)
                           & (rv >= 0.0) & (rv <= 1.0))
                # --- sphere w/ moving center (sphere.go:70-127) ---
                radius = g2[0]
                st0, st1 = g2[1], g2[2]
                sden = st1 - st0
                frac = jnp.where(sden == 0.0, 0.0,
                                 (time - st0) / jnp.where(sden == 0.0,
                                                          1.0, sden))
                cx = g0[0] + frac * (g1[0] - g0[0])
                cy = g0[1] + frac * (g1[1] - g0[1])
                cz = g0[2] + frac * (g1[2] - g0[2])
                ocx, ocy, ocz = o[0] - cx, o[1] - cy, o[2] - cz
                qa = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                qb = ocx * d[0] + ocy * d[1] + ocz * d[2]
                qc = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
                disc = qb * qb - qa * qc
                has = disc > 0.0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                qa_safe = jnp.where(qa == 0.0, 1.0, qa)
                t_near = (-qb - sq) / qa_safe
                t_far = (-qb + sq) / qa_safe
                near_ok = has & (t_near < t_best) & (t_near > t_min)
                far_ok = has & (t_far < t_best) & (t_far > t_min) & ~near_ok
                t_sph = jnp.where(near_ok, t_near, t_far)
                ok_sph = near_ok | far_ok

                is_tri = kind == float(prim.KIND_TRIANGLE)
                is_rect = kind == float(prim.KIND_RECT)
                is_sph = kind == float(prim.KIND_SPHERE)
                t_k = jnp.where(is_tri, t_tri,
                                jnp.where(is_rect, t_rect, t_sph))
                ok_k = ((is_tri & ok_tri) | (is_rect & ok_rect)
                        | (is_sph & ok_sph))
            better = ok_k & (t_k > t_min) & (t_k < t_best)
            t_best = jnp.where(better, t_k, t_best)
            idx_best = jnp.where(better, base + k, idx_best)
        t_ref[:] = t_best
        i_ref[:] = idx_best

    def node_step(sps, qts, qhs):
        """One per-row pop + vectorized 4-wide slab + scalar pushes."""
        nrows = []
        cans = []
        for r in range(TS):
            can = (sps[r] > 0) & ((qts[r] - qhs[r]) < QCAP)
            cans.append(can)
            node = stacks[r, jnp.maximum(sps[r] - 1, 0)]
            node = jnp.clip(node, 0, n_nodes - 1)
            nrows.append(ntab_ref[pl.ds(node, 1), :])
        nb = jnp.concatenate(nrows, axis=0)        # (TS, 128)

        t_best = t_ref[:]
        hits = []
        for s in range(4):
            tn = jnp.full((TS, 128), t_min, jnp.float32)
            tf = t_best
            for ax in range(3):
                lo = nb[:, ax * 4 + s: ax * 4 + s + 1]
                hi = nb[:, 12 + ax * 4 + s: 12 + ax * 4 + s + 1]
                t0 = (lo - o[ax]) * inv[ax]
                t1 = (hi - o[ax]) * inv[ax]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            hits.append(tf > tn)
        anyv = jnp.concatenate(
            [jnp.max(jnp.where(h, 1.0, 0.0), axis=1, keepdims=True)
             for h in hits], axis=1)               # (TS, 4)

        new_sps, new_qts = [], []
        for r in range(TS):
            can = cans[r]
            sp_r = sps[r] - can.astype(jnp.int32)
            qt_r = qts[r]
            for s in range(4):
                any_s = can & (anyv[r, s] > 0.0)
                cnt = nb[r, 28 + s].astype(jnp.int32)
                child = nb[r, 24 + s].astype(jnp.int32)
                is_leaf = any_s & (cnt > 0)
                is_int = any_s & (cnt == 0)
                # conditional SMEM writes via dead-slot indices
                qpos = jnp.where(is_leaf, qt_r % QCAP, QCAP)
                queue[r, qpos] = child
                qt_r = qt_r + is_leaf.astype(jnp.int32)
                spos = jnp.where(is_int, jnp.minimum(sp_r, KSTACK - 1),
                                 KSTACK)
                stacks[r, spos] = child
                sp_r = sp_r + is_int.astype(jnp.int32)
            new_sps.append(sp_r)
            new_qts.append(qt_r)
        return tuple(new_sps), tuple(new_qts)

    def body(carry):
        sps = carry[0:TS]
        qts = carry[TS:2 * TS]
        qhs = carry[2 * TS:3 * TS]
        iters = carry[3 * TS]

        # Drain-issue: start one block DMA per pending row.
        pends = []
        for r in range(TS):
            pend = qts[r] > qhs[r]
            pends.append(pend)

            @pl.when(pend)
            def _(r=r):
                block = queue[r, qhs[r] % QCAP]
                leaf_dma(r, block).start()

        # Cover the DMA latency with node steps.
        for _ in range(NODE_STEPS):
            sps, qts = node_step(sps, qts, qhs)

        any_pend = pends[0]
        for r in range(1, TS):
            any_pend = any_pend | pends[r]

        @pl.when(any_pend)
        def _():
            for r in range(TS):
                @pl.when(pends[r])
                def _(r=r):
                    leaf_dma(r, queue[r, qhs[r] % QCAP]).wait()
            # inverted flag: lane 15 of each block's first prim row
            all_tri = jnp.max(pblk[:].reshape(TS, 8 * 128)[:, 15]) < 0.5

            @pl.when(all_tri)
            def _():
                _leaf_test(True)

            @pl.when(~all_tri)
            def _():
                _leaf_test(False)

        new_qhs = tuple(qhs[r] + pends[r].astype(jnp.int32)
                        for r in range(TS))
        return sps + qts + new_qhs + (iters + 1,)

    def cond(carry):
        sps = carry[0:TS]
        qts = carry[TS:2 * TS]
        qhs = carry[2 * TS:3 * TS]
        alive = (sps[0] > 0) | (qts[0] > qhs[0])
        for r in range(1, TS):
            alive = alive | (sps[r] > 0) | (qts[r] > qhs[r])
        return alive

    init = (tuple(jnp.int32(1) for _ in range(TS))
            + tuple(jnp.int32(0) for _ in range(2 * TS))
            + (jnp.int32(0),))
    final = jax.lax.while_loop(cond, body, init)

    t_out[:] = t_ref[:]
    idx_out[:] = i_ref[:]
    # stats: lane 0 = outer-body iterations, lane 1 = total leaf serves
    # (sum of final queue heads) — cheap, always on.
    qh_sum = final[2 * TS]
    for r in range(1, TS):
        qh_sum = qh_sum + final[2 * TS + r]
    li = jax.lax.broadcasted_iota(jnp.int32, (TS, 128), 1)
    stat_out[:] = jnp.where(
        li == 0, final[3 * TS], jnp.where(li == 1, qh_sum, 0))


def build_traverse_fn(rs: RowScene, n_rays: int,
                      interpret: bool | None = None):
    """Returns fn(o, d, time, t_min, t_max, tcap=None) ->
    (t (N,), block-slot idx (N,) i32)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tile = TS * 128
    n_grid = -(-n_rays // tile)
    n_pad = n_grid * tile
    n_nodes = int(rs.ntab.shape[0])

    nodes_bytes = rs.ntab.size * 4
    vmem_limit = min(nodes_bytes + (16 << 20), 110 << 20)

    ray_spec = pl.BlockSpec((TS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_row_kernel, n_rays=n_rays, tile=tile,
                          leaf_size=rs.leaf_size, n_nodes=n_nodes),
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # ntab (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # pblocks (HBM)
        ] + [ray_spec] * 8,
        out_specs=[ray_spec, ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_grid * TS, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_grid * TS, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_grid * TS, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((TS, KSTACK + 1), jnp.int32),
            pltpu.SMEM((TS, QCAP + 1), jnp.int32),
            pltpu.VMEM((TS * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((TS,)),
            pltpu.VMEM((TS, 128), jnp.float32),
            pltpu.VMEM((TS, 128), jnp.int32),
            pltpu.VMEM(tuple(rs.ntab.shape), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )

    def plane(x):
        return jnp.pad(x, (0, n_pad - n_rays)).reshape(n_grid * TS, 128)

    def run(o, d, time, t_min, t_max, tcap=None, with_stats=False):
        limits = jnp.stack(
            [jnp.asarray(t_min, jnp.float32).reshape(()),
             jnp.minimum(jnp.asarray(t_max, jnp.float32).reshape(()),
                         prim.T_MAX)]).reshape(1, 2)
        if tcap is None:
            tcap_p = jnp.full((n_grid * TS, 128), prim.T_MAX, jnp.float32)
        else:
            tcap_p = plane(jnp.asarray(tcap, jnp.float32))
        args = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
                plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
                plane(time), tcap_p]
        t, idx, stats = call(limits, rs.ntab, rs.pblocks, *args)
        t = t.reshape(-1)[:n_rays]
        idx = idx.reshape(-1)[:n_rays]
        if with_stats:
            return t, idx, stats.reshape(n_grid, TS, 128)[:, 0, :2]
        return t, idx

    return run


def sort_keys(o, d, lo, hi):
    """Coherence key for per-row traversal: 12-bit ORIGIN Morton leading
    (the origin picks the subtree a row descends), 12-bit direction Morton
    below (groups a row's rays into similar frusta)."""
    from izpi_tpu.ops.bvh_kernel import _morton4

    span = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(((o - lo[None, :]) / span[None, :] * 16.0)
                    .astype(jnp.int32), 0, 15)
    m_o = _morton4(cell[:, 0], cell[:, 1], cell[:, 2])
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    dc = jnp.clip(((dn + 1.0) * 8.0).astype(jnp.int32), 0, 15)
    m_d = _morton4(dc[:, 0], dc[:, 1], dc[:, 2])
    return (m_o << 12) | m_d


class RowBVHIntersector:
    """IntersectFn backed by the per-row-stack kernel.

    XLA side per call: ONE coherence argsort + ONE packed row gather of the
    ray fields (index-count-bound gathers make a (N, 8) row gather ~6x
    cheaper than per-field gathers, scripts/experiments/r5_mosaic_probe.py)
    + ONE packed (N, 2) scatter of the results back to ray order.
    """

    def __init__(self, cs, rs: RowScene, scene_lo, scene_hi,
                 sort: bool = True, interpret: bool | None = None):
        self.cs = cs
        self.rs = rs
        self.lo = jnp.asarray(scene_lo, jnp.float32)
        self.hi = jnp.asarray(scene_hi, jnp.float32)
        self.sort = sort
        self.interpret = interpret
        self._fns = {}

    def _fn(self, n):
        fn = self._fns.get(n)
        if fn is None:
            fn = build_traverse_fn(self.rs, n, interpret=self.interpret)
            self._fns[n] = fn
        return fn

    def __call__(self, o, d, time, t_min, t_max):
        n = o.shape[0]
        fn = self._fn(n)
        if self.sort and n >= 2048:
            keys = sort_keys(o, d, self.lo, self.hi)
            order = jnp.argsort(keys)
            packed = jnp.concatenate(
                [o, d, time[:, None],
                 jnp.zeros((n, 1), jnp.float32)], axis=1)[order]
            o_s = packed[:, 0:3]
            d_s = packed[:, 3:6]
            tm_s = packed[:, 6]
            t_s, idx_s = fn(o_s, d_s, tm_s, t_min, t_max)
            # packed (t, idx-as-f32) row scatter back to ray order; block
            # slot ids stay < 2^24 so the f32 round trip is exact.
            res = jnp.zeros((n, 2), jnp.float32).at[order].set(
                jnp.stack([t_s, idx_s.astype(jnp.float32)], axis=1))
            t = res[:, 0]
            idx = res[:, 1].astype(jnp.int32)
        else:
            t, idx = fn(o, d, time, t_min, t_max)
        idx = jnp.where(idx >= 0, self.rs.blockmap[jnp.maximum(idx, 0)], -1)
        hit = idx >= 0
        return prim.finalize_hit(self.cs.prims, o, d, time, t, idx, hit)


def attach(cs, seed: int = 1, sort: bool = True,
           interpret: bool | None = None, leaf_size: int = LEAF_SIZE):
    """Build a leaf-`leaf_size` SAH BVH4, reorder the scene's primitives,
    and return (cs_reordered, RowBVHIntersector)."""
    from izpi_tpu.scene import compiler as compiler_mod

    host_prims = compiler_mod.host_prims_for(cs.prims)
    if host_prims is None:
        host_prims = prim.Prims(*jax.device_get(list(cs.prims)))
    arrays = bvh_build.build_bvh4(host_prims, seed, leaf_size=leaf_size,
                                  method="sah")
    errors = bvh_build.validate(arrays, host_prims.count,
                                stack_depth=KSTACK)
    if errors:
        raise AssertionError(f"BVH4 validation failed: {errors[:5]}")
    idx = np.asarray(arrays.prim_order)
    host_reordered = prim.Prims(*[np.asarray(f)[idx] for f in host_prims])
    rs = pack_scene(host_reordered, arrays, leaf_size)
    bb_min, bb_max = bvh_build.prim_bounds(host_reordered)
    cs2 = cs._replace(prims=prim.Prims(
        *[jnp.asarray(f) for f in host_reordered]))
    inter = RowBVHIntersector(cs2, rs, bb_min.min(axis=0), bb_max.max(axis=0),
                              sort=sort, interpret=interpret)
    return cs2, inter
