"""Pallas BVH4 traversal kernel — the device-side answer to the reference's
hottest code path (internal/hitable/bvh4.go:49-163 stack traversal +
bvh4_simd_amd64.go:27-110 RayAABB4 SIMD 4-wide slab test).

TPU-first design (NOT a port of the per-ray recursive traversal):

- Each grid program owns a TILE of TS×128 rays that traverse TOGETHER with
  ONE shared stack in SMEM: a pop loads one BVH4 node, the 4-wide slab test
  runs vectorized across every lane of the tile (the RayAABB4 kernel batched
  over 1024 rays instead of 1), and a child is visited iff ANY lane hits it.
  This replaces divergent per-ray stacks — which a lockstep vector machine
  cannot express profitably — with speculative union traversal, and recovers
  coherence by sorting rays (octant + origin Morton code) before the kernel.
- The node table (bounds 24×f32 + child/count 8×i32 per node, the same SoA
  layout as bvh4.go:23-39 built by accel.bvh_build) lives VMEM-resident for
  the kernel's whole lifetime: node loads are on-chip dynamic row slices, not
  HBM gathers.
- Leaves are CONTIGUOUS runs of `leaf_size` primitives (the build reorders
  primitives, bvh4.go:586-590); a leaf visit DMAs one (leaf_size, 16)-f32
  primitive block HBM→VMEM — a dense contiguous copy, the memory access
  pattern TPUs are actually good at — and tests every lane against every
  primitive in the block. Testing lanes whose slab test missed is free
  correctness-wise (the per-lane t-window rejects them) and keeps the VPU
  fully occupied.
- t_best/idx_best live in VMEM scratch and shrink monotonically, narrowing
  later slab tests exactly like the reference's tMax shrink (bvh4.go:130).

The kernel returns (t, prim_idx) per ray; shading attributes are gathered on
the XLA side by geometry.primitives.finalize_hit, so the kernel composes with
the wavefront pool as a drop-in IntersectFn. Differential-tested against
intersect_brute and the jnp traversal (tests/test_bvh_kernel.py).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from izpi_tpu.accel import bvh_build
from izpi_tpu.geometry import primitives as prim

TS = 8                 # sublanes per ray tile → 8×128 = 1024 rays/program
# Max traversal roots a tile can start with. 64 makes overflow (a tile
# whose rays' pending treelets exceed it, forcing a full-tree majority
# walk at ~2 ms/tile vs ~0.1 ms confined) essentially never happen; the
# cost is 64 unrolled scalar pushes at kernel start and SMEM stack slots.
MULTI_K = 64
# Shared-stack depth: 64 for the descent (validated at build) + MULTI_K-1
# parked sibling roots a multi-root start can leave beneath the descent.
KSTACK = 64 + MULTI_K
KERNEL_LEAF = 16       # primitives per leaf block (one DMA)


def _block_rows() -> int:
    """128-lane rows per leaf block: KERNEL_LEAF prims × 16 f32."""
    return KERNEL_LEAF * 16 // 128
T_EPS = 1e-30


class KernelScene(NamedTuple):
    ntab: jax.Array      # (Nn, 128) f32 — one LANE-DENSE row per node:
                         #   lanes 0..23 slab bounds SoA, 24..27 child[4]
                         #   (leaf: block id) and 28..31 count[4], both
                         #   stored as exact f32 (values < 2^24). The row is
                         #   a full 128-lane vector so the one-shot
                         #   HBM→VMEM load is a contiguous DMA — a (Nn, 24)
                         #   layout DMAs 96 B per row and costs ~30 ms per
                         #   launch at dragon scale (measured).
    pblocks: jax.Array   # (Nb*2, 128) f32 — one (2,128) block per leaf:
                         #   16 prims × 16 floats (g0,g1,g2,g3,kind,pad³)
    blockmap: jax.Array  # (Nb*16,) i32 — block slot → prim index (-1 = pad)


def pack_scene(prims: prim.Prims, bvh: bvh_build.BVH4Arrays) -> KernelScene:
    """Device tables from a built BVH over REORDERED primitives.

    Every leaf gets its own 16-prim block so the kernel's leaf fetch is a
    (2, 128) lane-aligned DMA at a static shape — Mosaic cannot slice
    sub-128 lane widths out of HBM. Blocks are padded with KIND_NONE rows
    (never hit); `blockmap` recovers real primitive indices afterwards."""
    g0 = np.asarray(prims.g0, np.float32)
    g1 = np.asarray(prims.g1, np.float32)
    g2 = np.asarray(prims.g2, np.float32)
    g3 = np.asarray(prims.g3, np.float32)
    kind = np.asarray(prims.kind, np.float32)

    child = np.array(bvh.child, np.int32)
    count = np.array(bvh.count, np.int32)
    leaf_mask = count > 0
    leaf_nodes, leaf_slots = np.nonzero(leaf_mask)
    n_blocks = max(len(leaf_nodes), 1)

    rows = np.zeros((n_blocks, KERNEL_LEAF, 16), np.float32)
    rows[:, :, 12] = float(prim.KIND_NONE)
    blockmap = np.full((n_blocks * KERNEL_LEAF,), -1, np.int32)
    for b, (ni, s) in enumerate(zip(leaf_nodes, leaf_slots)):
        start, cnt = int(child[ni, s]), int(count[ni, s])
        sl = slice(start, start + cnt)
        rows[b, :cnt, 0:3] = g0[sl]
        rows[b, :cnt, 3:6] = g1[sl]
        rows[b, :cnt, 6:9] = g2[sl]
        rows[b, :cnt, 9:12] = g3[sl]
        rows[b, :cnt, 12] = kind[sl]
        # Block-level triangle-only flag (prim 0, field 15): selects the
        # cheap Möller–Trumbore-only leaf test in the kernel.
        if np.all(kind[sl] == float(prim.KIND_TRIANGLE)):
            rows[b, 0, 15] = 1.0
        blockmap[b * KERNEL_LEAF: b * KERNEL_LEAF + cnt] = np.arange(
            start, start + cnt)
        child[ni, s] = b  # leaf child now indexes its block

    n_nodes = child.shape[0]
    assert n_nodes < (1 << 24) and n_blocks < (1 << 24), \
        "node/block ids must stay exactly representable in f32"
    ntab = np.zeros((n_nodes, 128), np.float32)
    ntab[:, :24] = bvh.bounds
    ntab[:, 24:28] = child.astype(np.float32)
    ntab[:, 28:32] = count.astype(np.float32)
    return KernelScene(
        ntab=jnp.asarray(ntab),
        pblocks=jnp.asarray(rows.reshape(n_blocks * _block_rows(), 128)),
        blockmap=jnp.asarray(blockmap),
    )


def _traverse_kernel(limits_ref,             # SMEM (1,2) f32: t_min, t_max
                     start_ref,              # SMEM (n_grid,) i32: stack roots
                     ntab_hbm,               # ANY (HBM) packed node table
                     ptab_ref,               # ANY (HBM) primitive table
                     ox, oy, oz, dx, dy, dz, tm,  # VMEM (TS,128) ray planes
                     tcap,                   # VMEM (TS,128) per-ray t cap
                     t_out, idx_out,         # VMEM (TS,128) outputs
                     stack_ref, t_ref, i_ref, pblk, sems,
                     ntab_ref, nsems,
                     *, n_rays: int, tile: int):
    g = pl.program_id(0)
    t_min = limits_ref[0, 0]
    t_max = limits_ref[0, 1]

    # The packed (Nn, 128) node table loads HBM→VMEM ONCE per launch: the
    # TPU grid is sequential on one core and scratch persists across steps.
    # Both the per-step input copies Pallas would insert for a VMEM input
    # spec AND a one-shot strided DMA of a (Nn, 24) layout measured ~30-40ms
    # of FIXED cost per launch at dragon scale — 3× the actual traversal
    # work; the lane-dense row makes this a single contiguous ~19 MB DMA.
    @pl.when(g == 0)
    def _():
        cb = pltpu.make_async_copy(ntab_hbm, ntab_ref, nsems.at[0])
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

    # Dead (padding) lanes get an empty t-window so they never hit and never
    # force node visits. tcap carries a prior pass's per-ray best t (the
    # two-pass treelet scheme); a full pass sends +inf.
    t_ref[:] = jnp.where(valid,
                         jnp.minimum(jnp.minimum(t_max, big), tcap[:]),
                         t_min)
    i_ref[:] = jnp.full((TS, 128), -1, jnp.int32)

    # Multi-root start: push every valid (>= 0) root for this tile. A
    # re-binned tile passes one subtree root; the exact cleanup pass pushes
    # the union of its rays' remaining treelet roots so stragglers never
    # force a full-tree walk. Invalid slots write a dead 0 that a later
    # valid push overwrites (sp only advances on valid roots).
    sp0 = jnp.int32(0)
    for k in range(MULTI_K):
        v = start_ref[g, k]
        ok_k = v >= 0
        stack_ref[jnp.minimum(sp0, KSTACK - 1)] = jnp.where(ok_k, v, 0)
        sp0 = sp0 + ok_k.astype(jnp.int32)

    br = _block_rows()

    def leaf_dma(block, buf):
        return pltpu.make_async_copy(
            ptab_ref.at[pl.ds(block * br, br), :],
            pblk.at[buf], sems.at[buf])

    def _tri_only_test(buf, base):
        """All-triangle leaf block: Möller–Trumbore only — the common case
        for meshes, ~3× cheaper than the generic mixed-kind test. KIND_NONE
        padding rows are all-zero, which makes MT degenerate (a == 0 →
        parallel → miss), so no extra masking is needed."""
        t_best = t_ref[:]
        idx_best = i_ref[:]

        def fld(k, c):
            flat = k * 16 + c
            return pblk[buf, flat // 128, flat % 128]

        for k in range(KERNEL_LEAF):
            g0 = (fld(k, 0), fld(k, 1), fld(k, 2))
            g1 = (fld(k, 3), fld(k, 4), fld(k, 5))
            g2 = (fld(k, 6), fld(k, 7), fld(k, 8))
            hx = d[1] * g2[2] - d[2] * g2[1]
            hy = d[2] * g2[0] - d[0] * g2[2]
            hz = d[0] * g2[1] - d[1] * g2[0]
            a = g1[0] * hx + g1[1] * hy + g1[2] * hz
            parallel = jnp.abs(a) < prim.MT_EPS
            f = 1.0 / jnp.where(parallel, 1.0, a)
            sx, sy, sz = o[0] - g0[0], o[1] - g0[1], o[2] - g0[2]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * g1[2] - sz * g1[1]
            qy = sz * g1[0] - sx * g1[2]
            qz = sx * g1[1] - sy * g1[0]
            v = f * (d[0] * qx + d[1] * qy + d[2] * qz)
            t_k = f * (g2[0] * qx + g2[1] * qy + g2[2] * qz)
            eps = prim.MT_EPS
            ok_k = ((~parallel)
                    & (u >= -eps) & (u <= 1.0 + eps)
                    & (v >= -eps) & (u + v <= 1.0 + eps))
            better = ok_k & (t_k > t_min) & (t_k < t_best)
            t_best = jnp.where(better, t_k, t_best)
            idx_best = jnp.where(better, base + k, idx_best)
        t_ref[:] = t_best
        i_ref[:] = idx_best

    def _generic_test(buf, base):
        """Mixed-kind leaf block: triangle/rect/sphere tagged tests.
        Rows are real (reordered) primitives or KIND_NONE padding, so
        testing beyond the leaf's own count is correctness-neutral — the
        per-lane [t_min, t_best) window is the only guard that matters."""
        t_best = t_ref[:]
        idx_best = i_ref[:]

        def fld(k, c):
            flat = k * 16 + c
            return pblk[buf, flat // 128, flat % 128]

        for k in range(KERNEL_LEAF):
            g0 = (fld(k, 0), fld(k, 1), fld(k, 2))
            g1 = (fld(k, 3), fld(k, 4), fld(k, 5))
            g2 = (fld(k, 6), fld(k, 7), fld(k, 8))
            g3 = (fld(k, 9), fld(k, 10), fld(k, 11))
            kind = fld(k, 12)

            # --- triangle: Möller–Trumbore (triangle.go:193-231) ---
            hx = d[1] * g2[2] - d[2] * g2[1]
            hy = d[2] * g2[0] - d[0] * g2[2]
            hz = d[0] * g2[1] - d[1] * g2[0]
            a = g1[0] * hx + g1[1] * hy + g1[2] * hz
            parallel = jnp.abs(a) < prim.MT_EPS
            f = 1.0 / jnp.where(parallel, 1.0, a)
            sx, sy, sz = o[0] - g0[0], o[1] - g0[1], o[2] - g0[2]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * g1[2] - sz * g1[1]
            qy = sz * g1[0] - sx * g1[2]
            qz = sx * g1[1] - sy * g1[0]
            v = f * (d[0] * qx + d[1] * qy + d[2] * qz)
            t_tri = f * (g2[0] * qx + g2[1] * qy + g2[2] * qz)
            eps = prim.MT_EPS
            ok_tri = ((~parallel)
                      & (u >= -eps) & (u <= 1.0 + eps)
                      & (v >= -eps) & (u + v <= 1.0 + eps))

            # --- rect: plane + parametric inside (xyrect.go family) ---
            denom = d[0] * g3[0] + d[1] * g3[1] + d[2] * g3[2]
            degen = denom == 0.0
            t_rect = ((g0[0] - o[0]) * g3[0] + (g0[1] - o[1]) * g3[1]
                      + (g0[2] - o[2]) * g3[2]) / jnp.where(degen, 1.0, denom)
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

            # --- sphere: quadratic w/ moving center (sphere.go:70-127) ---
            radius = g2[0]
            st0, st1 = g2[1], g2[2]
            sden = st1 - st0
            frac = jnp.where(sden == 0.0, 0.0,
                             (time - st0) / jnp.where(sden == 0.0, 1.0, sden))
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
            # reference root selection vs the CURRENT per-lane window
            near_ok = has & (t_near < t_best) & (t_near > t_min)
            far_ok = has & (t_far < t_best) & (t_far > t_min) & ~near_ok
            t_sph = jnp.where(near_ok, t_near, t_far)
            ok_sph = near_ok | far_ok

            is_tri = kind == float(prim.KIND_TRIANGLE)
            is_rect = kind == float(prim.KIND_RECT)
            is_sph = kind == float(prim.KIND_SPHERE)
            t_k = jnp.where(is_tri, t_tri, jnp.where(is_rect, t_rect, t_sph))
            ok_k = ((is_tri & ok_tri) | (is_rect & ok_rect)
                    | (is_sph & ok_sph))
            better = ok_k & (t_k > t_min) & (t_k < t_best)
            t_best = jnp.where(better, t_k, t_best)
            idx_best = jnp.where(better, base + k, idx_best)
        t_ref[:] = t_best
        i_ref[:] = idx_best

    def prim_block_test(buf, base):
        tri_only = pblk[buf, 0, 15] > 0.5

        @pl.when(tri_only)
        def _():
            _tri_only_test(buf, base)

        @pl.when(~tri_only)
        def _():
            _generic_test(buf, base)

    def body(sp):
        node = stack_ref[sp - 1]
        sp = sp - 1
        brow = ntab_ref[pl.ds(node, 1), :]
        t_best = t_ref[:]
        big32 = jnp.float32(3.0e38)

        # 4-wide slab test, vectorized over the whole tile (the RayAABB4
        # kernel of bvh4_simd_*.go batched over TS×128 rays). tn_min — the
        # nearest entry distance over the tile — drives near-first ordering.
        anyhits = []
        tnmins = []
        for s in range(4):
            tn = jnp.full((TS, 128), t_min, jnp.float32)
            tf = t_best
            for ax in range(3):
                lo = brow[0, ax * 4 + s]
                hi = brow[0, 12 + ax * 4 + s]
                t0 = (lo - o[ax]) * inv[ax]
                t1 = (hi - o[ax]) * inv[ax]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            hit_s = tf > tn
            anyhits.append(jnp.max(jnp.where(hit_s, 1, 0)) > 0)
            tnmins.append(jnp.min(jnp.where(hit_s, tn, big32)))

        # child[4] and count[4] ride lanes 24..31 of the node row as exact
        # f32; scalar casts recover the ints.
        childs = [brow[0, 24 + s].astype(jnp.int32) for s in range(4)]
        cnts = [brow[0, 28 + s].astype(jnp.int32) for s in range(4)]

        # Leaf slots: kick off all DMAs, then test (overlap copy with test).
        leaf_flags = []
        for s in range(4):
            is_leaf = anyhits[s] & (cnts[s] > 0)
            leaf_flags.append(is_leaf)

            @pl.when(is_leaf)
            def _(s=s):
                leaf_dma(childs[s], s).start()

        for s in range(4):
            @pl.when(leaf_flags[s])
            def _(s=s):
                leaf_dma(childs[s], s).wait()
                prim_block_test(s, childs[s] * KERNEL_LEAF)

        # Internal slots: push NEAR-FIRST (farthest pushed first so the
        # nearest child pops next — the union analog of the reference's
        # visit-first-hit-child-immediately, bvh4.go:103-121). A 4-element
        # sorting network orders (tn, child, push) tuples descending by tn.
        items = []
        for s in range(4):
            push = anyhits[s] & (cnts[s] == 0)
            items.append((tnmins[s], childs[s], push.astype(jnp.int32)))

        def cmp_exchange(a, b):
            swap = items[a][0] < items[b][0]

            def pick(x, y):
                return jnp.where(swap, y, x)

            ia, ib = items[a], items[b]
            items[a] = (pick(ia[0], ib[0]), pick(ia[1], ib[1]),
                        pick(ia[2], ib[2]))
            items[b] = (pick(ib[0], ia[0]), pick(ib[1], ia[1]),
                        pick(ib[2], ia[2]))

        for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
            cmp_exchange(a, b)

        # Writes at (sp + off) only touch dead slots; off advances only on
        # a real push, so a later push overwrites a non-push's dead write.
        # A non-push's dead write can land one PAST the final live top
        # (sp + pushes), so clamp to the last slot: with validate() capping
        # worst-case occupancy at KSTACK-1 (attach passes stack_depth=
        # KSTACK-1), the clamped index never clobbers a live entry.
        off = jnp.int32(0)
        for s in range(4):
            _tn, child, push = items[s]
            stack_ref[jnp.minimum(sp + off, KSTACK - 1)] = jnp.where(
                push != 0, child, 0)
            off = off + push
        return sp + off

    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    t_out[:] = t_ref[:]
    idx_out[:] = jnp.where(i_ref[:] >= 0, i_ref[:], -1)


def build_traverse_fn(ks: KernelScene, n_rays: int,
                      interpret: bool | None = None):
    """Returns fn(o, d, time, t_min, t_max) -> (t (N,), idx (N,) i32).
    N == n_rays (static); o, d: (N, 3)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # f32 VMEM tiling is (8, 128): a smaller sublane count sends Mosaic down
    # a pathological compile path rather than erroring.
    assert TS >= 8, f"TS={TS} below the f32 (8,128) min tile"
    tile = TS * 128
    n_grid = -(-n_rays // tile)
    n_pad = n_grid * tile

    # The packed node table lives in VMEM scratch (one contiguous DMA per
    # launch, see kernel): Nn×128×4 B — ~19 MB at dragon scale (36.8k
    # nodes). Scenes past ~200k nodes (~5M tris at leaf 16) would exceed
    # the chip's VMEM and need a 4-nodes-per-row packing.
    nodes_bytes = ks.ntab.size * 4
    vmem_limit = min(nodes_bytes + (16 << 20), 110 << 20)

    ray_spec = pl.BlockSpec((TS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_traverse_kernel, n_rays=n_rays, tile=tile),
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            # per-program stack roots, whole array in SMEM, indexed by
            # program_id (two-pass treelet priming; 0 = root) — per-program
            # SMEM blocks fail the TPU block-shape rules
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # The node table stays in HBM and is DMA'd to scratch at step 0:
            # a VMEM input spec re-copies it EVERY grid step (~40 ms/launch
            # fixed cost at dragon scale).
            pl.BlockSpec(memory_space=pltpu.HBM),    # ntab
            # The prim table must stay in HBM: leaf blocks are DMA'd on
            # demand, and a VMEM placement would impose 128-lane tiling on
            # the (·, 16) rows (Mosaic slice-alignment failure) — besides
            # not fitting for dragon-scale scenes.
            pl.BlockSpec(memory_space=pltpu.HBM),    # ptable
        ] + [ray_spec] * 8,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_grid * TS, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_grid * TS, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((KSTACK,), jnp.int32),
            pltpu.VMEM((TS, 128), jnp.float32),
            pltpu.VMEM((TS, 128), jnp.int32),
            pltpu.VMEM((4, _block_rows(), 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM(tuple(ks.ntab.shape), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )

    def plane(x):
        return jnp.pad(x, (0, n_pad - n_rays)).reshape(n_grid * TS, 128)

    def run(o, d, time, t_min, t_max, starts=None, tcap=None,
            raw_idx: bool = False):
        """starts: None (root), (n_grid,) single roots, or (n_grid, K<=
        MULTI_K) multi-roots padded with -1."""
        limits = jnp.stack(
            [jnp.asarray(t_min, jnp.float32).reshape(()),
             jnp.minimum(jnp.asarray(t_max, jnp.float32).reshape(()),
                         prim.T_MAX)]).reshape(1, 2)
        if starts is None:
            starts = jnp.zeros((n_grid,), jnp.int32)
        starts = jnp.asarray(starts, jnp.int32)
        if starts.ndim == 1:
            starts = starts.reshape(n_grid, 1)
        k = starts.shape[1]
        assert k <= MULTI_K, (k, MULTI_K)
        starts = jnp.pad(starts, ((0, 0), (0, MULTI_K - k)),
                         constant_values=-1)
        if tcap is None:
            tcap_p = jnp.full((n_grid * TS, 128), prim.T_MAX, jnp.float32)
        else:
            tcap_p = plane(jnp.asarray(tcap, jnp.float32))
        args = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
                plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
                plane(time), tcap_p]
        t, idx = call(limits, starts, ks.ntab, ks.pblocks, *args)
        t = t.reshape(-1)[:n_rays]
        idx = idx.reshape(-1)[:n_rays]
        if raw_idx:
            return t, idx
        # Block slot → primitive index (padding slots never win a hit).
        idx = jnp.where(idx >= 0, ks.blockmap[jnp.maximum(idx, 0)], -1)
        return t, idx

    return run


# --------------------------------------------------------------------------
# Ray sorting: union traversal thrives on coherence. Key = 4-bit-per-axis
# Morton of the origin inside the scene AABB interleaved with 4-bit-per-axis
# Morton of the unit direction — origin alone degenerates for camera rays
# (one shared origin → scanline-strip tiles with wide frusta); direction
# alone degenerates for diffuse bounces. Below the treelet id (top key when
# present), DIRECTION bits lead: key = (m_d << 12) | m_o.
# --------------------------------------------------------------------------


def _morton4(x, y, z):
    """Interleave 3×4-bit ints (0..15) into a 12-bit Morton code
    (bit b of an axis lands at 3b + axis)."""
    def spread3(v):
        return ((v & 1) | ((v & 2) << 2) | ((v & 4) << 4) | ((v & 8) << 6))
    return spread3(x) | (spread3(y) << 1) | (spread3(z) << 2)


def treelet_entries(o, d, treelets):
    """Per-ray conservative entry distance into every top-level treelet box
    — (N, T) f32, +inf where the ray misses the box. max(tn, 0) lower-bounds
    any hit t inside the box (origin-inside boxes give 0), which makes
    "entry >= best_t ⇒ skip" exact in the re-binned traversal."""
    t_lo = treelets[None, :, 0:3]          # (1, T, 3)
    t_hi = treelets[None, :, 3:6]
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)[:, None, :]
    t0 = (t_lo - o[:, None, :]) * inv
    t1 = (t_hi - o[:, None, :]) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tf > jnp.maximum(tn, 0.0))
    return jnp.where(hit, jnp.maximum(tn, 0.0), jnp.float32(jnp.inf))


def treelet_ids(o, d, treelets):
    """Id of the nearest top-level treelet per ray (T = miss-everything)."""
    entry = treelet_entries(o, d, treelets)
    tl = jnp.argmin(entry, axis=1).astype(jnp.int32)
    none = ~jnp.any(jnp.isfinite(entry), axis=1)
    return jnp.where(none, treelets.shape[0], tl)


def sort_keys(o, d, lo, hi, treelets=None, tl=None):
    """Coherence sort key. Primary: the id of the NEAREST top-level treelet
    (union traversal of a tile whose rays all want the same subtree only
    visits that subtree — the single biggest lever for incoherent bounce
    rays); secondary: direction then origin Morton codes."""
    span = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(((o - lo[None, :]) / span[None, :] * 16.0)
                    .astype(jnp.int32), 0, 15)
    m_o = _morton4(cell[:, 0], cell[:, 1], cell[:, 2])
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    dc = jnp.clip(((dn + 1.0) * 8.0).astype(jnp.int32), 0, 15)
    m_d = _morton4(dc[:, 0], dc[:, 1], dc[:, 2])
    key = (m_d << 12) | m_o
    if treelets is not None and treelets.shape[0] > 1:
        if tl is None:
            tl = treelet_ids(o, d, treelets)
        key = (tl << 24) | key
    return key


def extract_treelets(bvh: bvh_build.BVH4Arrays, target: int = 48):
    """Top-of-tree frontier (~`target` nodes): BFS from the root, repeatedly
    expanding the internal slot whose SUBTREE has the most nodes — the
    quantity a re-binned tile actually pays for (union traversal cost of the
    subtree). Volume-based expansion looked reasonable but is exactly wrong
    for dragon-in-a-box scenes: the near-empty wall slots have enormous
    boxes while the 871k-triangle dragon hides in one small-volume slot, so
    the "treelets" degenerate to {walls…, whole-dragon} and confinement
    buys nothing. Returns (boxes (T, 6) f32 [lo, hi] rows for sort_keys,
    nodes (T,) i32 — the subtree root to start a confined traversal at —
    and the arrays, EXTENDED with one synthetic single-slot node per
    frontier LEAF slot: starting a confined traversal at a leaf slot's
    owning node would re-traverse the owner's whole subtree (for a leaf
    directly on the root, the entire tree), so each such slot gets its own
    node whose slot 0 is that leaf and whose other slots are the builder's
    always-miss empties. Synthetic nodes are unreachable from the root, so
    full-tree traversals are unaffected; pack_scene gives their leaf slot a
    duplicate primitive block, which is correctness-neutral (same t wins)."""
    bounds = np.asarray(bvh.bounds)
    child = np.asarray(bvh.child)
    count = np.asarray(bvh.count)
    n_nodes = child.shape[0]

    # Subtree node counts, children-first (the build guarantees child > ni).
    size = np.ones(n_nodes, np.int64)
    for ni in range(n_nodes - 1, -1, -1):
        for s in range(4):
            if count[ni, s] == 0:
                size[ni] += size[child[ni, s]]

    def slot_box(ni, s):
        lo = [bounds[ni, ax * 4 + s] for ax in range(3)]
        hi = [bounds[ni, 12 + ax * 4 + s] for ax in range(3)]
        return lo + hi

    def slot_size(ni, s):
        return size[child[ni, s]] if count[ni, s] == 0 else 0

    # frontier entries: (node, slot) child slots of expanded nodes
    frontier = [(0, s) for s in range(4) if count[0, s] != -1]
    while len(frontier) < target:
        best = None
        for i, (ni, s) in enumerate(frontier):
            sz = slot_size(ni, s)
            if sz <= 0:
                continue
            if best is None or sz > best[0]:
                best = (sz, i)
        if best is None:
            break
        _, i = best
        ni, s = frontier.pop(i)
        ch = child[ni, s]
        frontier.extend((ch, s2) for s2 in range(4) if count[ch, s2] != -1)
    if not frontier:
        return (np.zeros((1, 6), np.float32), np.zeros((1,), np.int32), bvh)

    f32max = np.float32(np.finfo(np.float32).max)
    boxes, nodes = [], []
    ext_bounds, ext_child, ext_count = [], [], []
    for ni, s in frontier:
        boxes.append(slot_box(ni, s))
        if count[ni, s] == 0:
            nodes.append(child[ni, s])
            continue
        # synthetic node: slot 0 = this leaf, slots 1-3 always-miss empty
        b = np.concatenate([np.full(12, f32max, np.float32),
                            np.full(12, -f32max, np.float32)])
        for ax in range(3):
            b[ax * 4] = bounds[ni, ax * 4 + s]
            b[12 + ax * 4] = bounds[ni, 12 + ax * 4 + s]
        ext_bounds.append(b)
        ext_child.append([child[ni, s], -1, -1, -1])
        ext_count.append([count[ni, s], -1, -1, -1])
        nodes.append(n_nodes + len(ext_bounds) - 1)
    if ext_bounds:
        bvh = bvh_build.BVH4Arrays(
            bounds=np.concatenate(
                [bounds, np.stack(ext_bounds)]).astype(np.float32),
            child=np.concatenate(
                [child, np.asarray(ext_child, np.int32)]),
            count=np.concatenate(
                [count, np.asarray(ext_count, np.int32)]),
            prim_order=bvh.prim_order,
        )
    return (np.asarray(boxes, np.float32), np.asarray(nodes, np.int32), bvh)


def build_supers(boxes, nodes, group: int = 16):
    """Two-level treelet hierarchy for the itinerary scheduler: treelets
    are Morton-ordered by center and grouped `group`-at-a-time into supers.
    Returns (boxes_padded (S*group, 6), nodes_padded (S*group,),
    super_boxes (S, 6), subtable (S, group*6)) with always-miss pad boxes
    (lo=+fmax, hi=-fmax -> entry inf, never scheduled)."""
    boxes = np.asarray(boxes, np.float32)
    nodes = np.asarray(nodes, np.int32)
    t = boxes.shape[0]
    cent = (boxes[:, 0:3] + boxes[:, 3:6]) * 0.5
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-9)
    cell = np.clip(((cent - lo) / span * 32).astype(np.int64), 0, 31)

    def spread(v):
        v = (v | (v << 10)) & 0x30000FF
        v = (v | (v << 4)) & 0x30C30C3
        return (v | (v << 2)) & 0x9249249

    code = (spread(cell[:, 0]) | (spread(cell[:, 1]) << 1)
            | (spread(cell[:, 2]) << 2))
    order = np.argsort(code, kind="stable")
    boxes = boxes[order]
    nodes = nodes[order]

    s = -(-t // group)
    pad = s * group - t
    # Pad sentinel must stay FINITE in bf16: the sub-box table rides an MXU
    # matmul whose bf16 passes turn float32-max into inf, and 0*inf = NaN
    # poisons the whole one-hot contraction (measured: 94% NaN rows on the
    # chip). 1e30 is bf16-exact huge and still always-miss (lo > hi).
    bigf = np.float32(1e30)
    if pad:
        miss = np.concatenate([np.full((pad, 3), bigf, np.float32),
                               np.full((pad, 3), -bigf, np.float32)],
                              axis=1)
        boxes = np.concatenate([boxes, miss])
        nodes = np.concatenate([nodes, np.zeros(pad, np.int32)])
    groups = boxes.reshape(s, group, 6)
    real = groups[:, :, 0] < bigf       # (s, group) pad detector
    glo = np.where(real[..., None], groups[:, :, 0:3], bigf)
    ghi = np.where(real[..., None], groups[:, :, 3:6], -bigf)
    super_boxes = np.concatenate([glo.min(axis=1), ghi.max(axis=1)], axis=1)
    subtable = groups.reshape(s, group * 6)
    return boxes, nodes, super_boxes.astype(np.float32), subtable


class BVHKernelIntersector:
    """IntersectFn backed by the Pallas traversal kernel.

    Rays are sorted by coherence key, traversed, and the hits unsorted;
    shading attributes come from finalize_hit on the XLA side. The traverse
    fn is cached per ray-batch size (shapes are static under jit).
    """

    def __init__(self, cs, ks: KernelScene, scene_lo, scene_hi,
                 sort: bool = True, interpret: bool | None = None,
                 treelets=None, treelet_nodes=None, two_pass: bool = False,
                 rebin: bool = False, rounds: int = 2,
                 super_boxes=None, subtable=None, itin: bool = False):
        self.cs = cs
        self.ks = ks
        self.lo = jnp.asarray(scene_lo, jnp.float32)
        self.hi = jnp.asarray(scene_hi, jnp.float32)
        self.sort = sort
        self.interpret = interpret
        self.treelets = (jnp.asarray(treelets, jnp.float32)
                         if treelets is not None else None)
        # treelet id T ("missed everything") starts at the root.
        self.treelet_nodes = (
            jnp.concatenate([jnp.asarray(treelet_nodes, jnp.int32),
                             jnp.zeros(1, jnp.int32)])
            if treelet_nodes is not None else None)
        self.two_pass = two_pass
        self.rebin = rebin
        self.rounds = rounds
        self.super_boxes = (jnp.asarray(super_boxes, jnp.float32)
                            if super_boxes is not None else None)
        self.subtable = (jnp.asarray(subtable, jnp.float32)
                         if subtable is not None else None)
        self.itin = itin
        self._fns = {}

    def _fn(self, n):
        fn = self._fns.get(n)
        if fn is None:
            fn = build_traverse_fn(self.ks, n, interpret=self.interpret)
            self._fns[n] = fn
        return fn

    def _itinerary_traverse(self, fn, o, d, time, t_min, t_max, n):
        """Round-5 scheduler (v5): precomputed per-ray candidate itineraries
        over a 2-level treelet hierarchy + exact root-walk cleanup.

        The v2 re-binning scheme spent 6:1 on its own bookkeeping: a masked
        argmin over an (n, T) matrix EVERY round (~33 ms at T=512) plus
        per-round per-field ray gathers. The round-5 primitive measurements
        (scripts/experiments/r5_*: argsort at 262k is ~0.06 ms — round 3's
        "9 ms argsort" was its GATHERS — while every row gather/scatter is
        ~5 ms, index-count bound) dictate this shape:

        - ONCE per traversal: entry distances to S=T/16 super-boxes (O(nS)
          slab math), the top-2 supers per ray, their sub-boxes fetched via
          ONE-HOT MATMULS on the MXU (a (n,S)@(S,96) dot replaces an n-row
          gather — the gather costs 5 ms, the matmul ~0.1), per-sub entries,
          and the rounds+1 nearest candidates via a packed
          (entry-bits | treelet-id) sort along 32.
        - Per ROUND r: the candidate is just column r (no argmin); one
          argsort (free) + ONE packed row gather moves rays, results and
          remaining candidates together; tiles push the DISTINCT treelet
          ids of their (sorted) rays as multi-roots — read off key
          boundaries, no (n, T) masks.
        - Exactness: candidates are sorted by a CONSERVATIVE entry bound
          (mantissa low bits truncated toward zero), so "entry >= best_t"
          skips are safe; a ray is residual iff the (rounds+1)-th candidate
          entry, the 3rd-nearest super entry, or a tile root-overflow says
          an unserved treelet could still beat best_t — residuals take an
          exact root-walk cleanup pass with per-lane t-caps.

        Reference semantics preserved: tMax-shrink traversal
        (bvh4.go:49-163) via the per-lane t-cap windows."""
        tile = TS * 128
        n_grid = -(-n // tile)
        n_pad = n_grid * tile
        S = self.super_boxes.shape[0]
        G = 16
        Tp = S * G
        rounds = self.rounds
        assert Tp < 2048, "candidate keys pack the treelet id into 11 bits"
        u32 = jnp.uint32

        # ---- schedule once ----
        e_sup = treelet_entries(o, d, self.super_boxes)        # (n, S)
        iota_s = jnp.arange(S, dtype=jnp.int32)[None, :]
        a1 = jnp.argmin(e_sup, axis=1).astype(jnp.int32)
        masked = jnp.where(iota_s == a1[:, None], jnp.inf, e_sup)
        a2 = jnp.argmin(masked, axis=1).astype(jnp.int32)
        sup3_min = jnp.min(
            jnp.where(iota_s == a2[:, None], jnp.inf, masked), axis=1)

        inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)

        def sub_entries(a):
            onehot = (iota_s == a[:, None]).astype(jnp.float32)
            # HIGHEST: the default bf16 passes would round the f32 box
            # coordinates, breaking the conservative-entry guarantee the
            # skip/residual logic is built on (and the pad sentinel must be
            # bf16-finite, see build_supers).
            flat = jnp.dot(onehot, self.subtable,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)  # (n, G*6)
            b = flat.reshape(n, G, 6)
            t0 = (b[..., 0:3] - o[:, None, :]) * inv[:, None, :]
            t1 = (b[..., 3:6] - o[:, None, :]) * inv[:, None, :]
            tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hit = tf > jnp.maximum(tn, 0.0)
            return jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)

        iota_g = jnp.arange(G, dtype=jnp.int32)[None, :]
        e32 = jnp.concatenate([sub_entries(a1), sub_entries(a2)], axis=1)
        ids32 = jnp.concatenate(
            [a1[:, None] * G + iota_g, a2[:, None] * G + iota_g], axis=1)
        # entries are >= 0 (or +inf), so their bit patterns order correctly
        # as u32; the low 11 mantissa bits carry the treelet id. Decoded
        # entries round DOWN -> conservative for both skip and residual.
        # Candidate columns: `rounds` served one-per-round (pure tiles),
        # then K_EXTRA more served together in ONE union-cleanup pass (the
        # tile pushes the union of its rays' remaining candidate ids), and
        # one final probe column for the residual test. Without the union
        # pass, corridor rays (entering several treelet boxes but hitting
        # nothing) leak to the root-walk with UNPRUNED t-caps and drag
        # whole tiles through near-full-tree unions (~2.9 ms/tile,
        # measured: bounce 579 ms vs v2's 254 before this pass existed).
        K_EXTRA = 5
        n_cand = rounds + K_EXTRA + 1
        ebits = jax.lax.bitcast_convert_type(e32, u32)
        cand = jnp.sort((ebits & jnp.uint32(~jnp.uint32(0x7FF)))
                        | ids32.astype(u32), axis=1)[:, :n_cand]

        f32bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        bits32 = lambda x: jax.lax.bitcast_convert_type(x, u32)

        # ---- packed ray rows: ONE gather per reorder moves everything ----
        # cols 0:3 o | 3:6 d | 6 tm | 7 best_t | 8 best_raw | 9 sup3 |
        # 10 residual | 11 gid | 12:12+n_cand candidate keys (bitcast)
        packed = jnp.concatenate([
            o, d, time[:, None],
            jnp.full((n, 1), prim.T_MAX, jnp.float32),
            jnp.full((n, 1), -1.0, jnp.float32),
            sup3_min[:, None],
            jnp.zeros((n, 1), jnp.float32),
            jnp.arange(n, dtype=jnp.float32)[:, None],
            f32bits(cand),
        ], axis=1)

        def unpack(pk):
            return (pk[:, 0:3], pk[:, 3:6], pk[:, 6], pk[:, 7],
                    pk[:, 8].astype(jnp.int32))

        def col_ent_id(pk, c):
            keyu = bits32(pk[:, 12 + c])
            ent = f32bits(keyu & jnp.uint32(~jnp.uint32(0x7FF)))
            cid = (keyu & jnp.uint32(0x7FF)).astype(jnp.int32)
            return ent, cid

        def distinct_roots(km):
            """Per-tile distinct treelet ids (ascending rows) -> multi-root
            starts + overflow flags. km: (n_grid, W) with dead = Tp."""
            srt = jnp.sort(km.astype(u32), axis=1)
            changed = jnp.concatenate(
                [jnp.ones((n_grid, 1), bool), srt[:, 1:] != srt[:, :-1]],
                axis=1) & (srt < Tp)
            vals = jnp.where(changed, srt, big)
            sv = jnp.sort(vals, axis=1)[:, :MULTI_K]
            starts = jnp.where(
                sv < big,
                self.treelet_nodes[jnp.minimum(sv.astype(jnp.int32), Tp)],
                -1)
            over = jnp.sum(changed, axis=1) > MULTI_K
            return starts, over

        def flag_overflow(pk, over):
            ray_tile = jnp.minimum(
                jnp.arange(n, dtype=jnp.int32) // tile, n_grid - 1)
            return pk.at[:, 10].set(
                jnp.maximum(pk[:, 10], over[ray_tile].astype(jnp.float32)))

        def pending_supers(pk):
            """(n, S) bool: supers that could still beat best_t. a1/a2 are
            excluded only when the candidate columns fully covered them
            (probe column entry >= best_t); recomputed exactly from the
            carried o/d — identical to the schedule-time values."""
            o_c, d_c = pk[:, 0:3], pk[:, 3:6]
            best_t = pk[:, 7]
            e_s = treelet_entries(o_c, d_c, self.super_boxes)
            b1 = jnp.argmin(e_s, axis=1).astype(jnp.int32)
            b2 = jnp.argmin(
                jnp.where(iota_s == b1[:, None], jnp.inf, e_s),
                axis=1).astype(jnp.int32)
            ent_next, _ = col_ent_id(pk, rounds + K_EXTRA)
            is_top2 = (iota_s == b1[:, None]) | (iota_s == b2[:, None])
            covered = is_top2 & (ent_next >= best_t)[:, None]
            return (e_s < best_t[:, None]) & ~covered

        big = jnp.uint32(0xFFFFFFFF)
        sup_cap = MULTI_K // G          # supers served per tile per sweep
        # IZPI_ITIN_PASSES: run only the first k passes (timing ablation —
        # results are then INEXACT; never set in production).
        n_passes = int(os.environ.get("IZPI_ITIN_PASSES", rounds + 3))
        for r in range(n_passes):
            o_c, d_c, tm_c, best_t, best_raw = unpack(packed)
            phase = ("round" if r < rounds
                     else "union" if r == rounds
                     else "sweep" if r == rounds + 1 else "root")
            if phase == "round":
                ent_r, id_r = col_ent_id(packed, r)
                pending = (ent_r < best_t) & (id_r < Tp)
                tkey = jnp.where(pending, id_r, Tp)
            elif phase == "union":
                ents_ids = [col_ent_id(packed, rounds + k)
                            for k in range(K_EXTRA)]
                pendings = [(e < best_t) & (i < Tp) for e, i in ents_ids]
                pending = pendings[0]
                for pd in pendings[1:]:
                    pending = pending | pd
                # coherence key: the first still-pending candidate id
                tkey = jnp.full((n,), Tp, jnp.int32)
                for (e, i), pd in zip(reversed(ents_ids),
                                      reversed(pendings)):
                    tkey = jnp.where(pd, i, tkey)
            elif phase == "sweep":
                # Serve every remaining super: each tile pushes the union
                # of its rays' pending supers' 16 sub-roots — a blind
                # root-walk here measured 496 ms (miss/graze rays carry
                # unpruned caps and drag tiles through the whole tree);
                # confined super service costs one more sorted pass.
                pend_sup = pending_supers(packed)
                pending = jnp.any(pend_sup, axis=1)
                first_sup = jnp.argmax(pend_sup, axis=1).astype(jnp.int32)
                tkey = jnp.where(pending, first_sup, S)
            else:
                # absolute fallback: only rays in sweep-overflowed tiles
                residual = packed[:, 10] > 0.0
                pending = residual
                tkey = jnp.where(residual, 0, 1).astype(jnp.int32)
            morton = sort_keys(o_c, d_c, self.lo, self.hi)
            order = jnp.argsort((tkey.astype(u32) << 20)
                                | (morton.astype(u32) >> 4))
            packed = packed[order]
            o_c, d_c, tm_c, best_t, best_raw = unpack(packed)
            pending = pending[order]

            if phase == "round":
                tkey_s = tkey[order]
                km = jnp.pad(tkey_s, (0, n_pad - n),
                             constant_values=Tp).reshape(n_grid, tile)
                starts, over = distinct_roots(km)
                packed = flag_overflow(packed, over)
            elif phase == "union":
                cols = []
                for k in range(K_EXTRA):
                    e, i = col_ent_id(packed, rounds + k)
                    pd = (e < best_t) & (i < Tp)
                    cols.append(jnp.where(pd, i, Tp))
                km = jnp.pad(jnp.stack(cols, axis=1).reshape(-1),
                             (0, (n_pad - n) * K_EXTRA),
                             constant_values=Tp).reshape(
                                 n_grid, tile * K_EXTRA)
                starts, over = distinct_roots(km)
                packed = flag_overflow(packed, over)
            elif phase == "sweep":
                pend_sup = pending_supers(packed)            # (n, S)
                padded = jnp.pad(pend_sup, ((0, n_pad - n), (0, 0)))
                tile_sup = padded.reshape(n_grid, tile, S).any(axis=1)
                svals = jnp.where(tile_sup, iota_s.astype(u32), big)
                ssel = jnp.sort(svals, axis=1)[:, :sup_cap]  # (n_grid, 4)
                sub_ids = (ssel[:, :, None].astype(jnp.int32) * G
                           + jnp.arange(G, dtype=jnp.int32)[None, None, :]
                           ).reshape(n_grid, sup_cap * G)
                starts = jnp.where(
                    jnp.repeat(ssel < big, G, axis=1),
                    self.treelet_nodes[jnp.clip(sub_ids, 0, Tp)], -1)
                over = jnp.sum(tile_sup, axis=1) > sup_cap
                packed = flag_overflow(packed, over)
            else:
                starts = None

            tcap = jnp.where(pending, best_t, t_min)
            t_r, i_r = fn(o_c, d_c, tm_c, t_min, t_max,
                          starts=starts, tcap=tcap, raw_idx=True)
            improved = (i_r >= 0) & (t_r < best_t)
            packed = packed.at[:, 7].set(
                jnp.where(improved, t_r, best_t))
            packed = packed.at[:, 8].set(
                jnp.where(improved, i_r.astype(jnp.float32), packed[:, 8]))

        gid = packed[:, 11].astype(jnp.int32)
        res = jnp.zeros((n, 2), jnp.float32).at[gid].set(packed[:, 7:9])
        best_t = res[:, 0]
        best_raw = res[:, 1].astype(jnp.int32)
        idx = jnp.where(best_raw >= 0,
                        self.ks.blockmap[jnp.maximum(best_raw, 0)], -1)
        return best_t, idx

    def _rebin_traverse(self, fn, o, d, time, t_min, t_max, n):
        """Multi-round treelet-re-binned traversal — the incoherent-ray fast
        path. Union traversal saturates toward the whole tree when one
        1024-lane tile wants rays everywhere (docs/PERF.md); instead, rays
        are BINNED: every round RE-SORTS rays by the id of their nearest
        still-useful treelet (per-ray itinerary = treelets ordered by entry
        distance, pruned by the running best t) and every tile traverses
        ONLY its rays' treelet roots. A ray finishes when its next treelet's
        conservative entry distance is >= its best hit t (exact: entry
        lower-bounds every t in the subtree).

        The PER-ROUND re-sort is the round-4 fix: with one up-front sort,
        rays' SECOND treelets are scattered across the stale order, so
        rounds 2+ pushed huge multi-root unions and measured at near
        full-root cost (734 ms vs 31 ms for a confined pass at 262k rays,
        scripts/experiments/dragon_phase_r4.py). Re-sorting keys done rays
        to T (sorted last — their tiles push no roots and launch as no-ops),
        so every round runs under round-1 conditions: pure tiles, one root
        each, cost proportional to the drained pool. The final cleanup pass
        re-sorts too and pushes each tile's union of ALL remaining treelets
        (exact; overflow falls back to a full-root walk).

        The per-goroutine analog it answers is the reference's exact
        per-ray stack walk (bvh4.go:49-163)."""
        tile = TS * 128
        n_grid = -(-n // tile)
        T = self.treelets.shape[0]
        assert T < 2048, "sort key packs the treelet id into 11 bits"
        entry = treelet_entries(o, d, self.treelets)          # (n, T)
        morton = sort_keys(o, d, self.lo, self.hi)            # 24-bit key
        todo = jnp.isfinite(entry)
        best_t = jnp.full((n,), prim.T_MAX, jnp.float32)
        best_raw = jnp.full((n,), -1, jnp.int32)

        mids = jnp.minimum(
            jnp.arange(n_grid, dtype=jnp.int32) * tile + tile // 2, n - 1)
        ray_tile_s = jnp.arange(n, dtype=jnp.int32) // tile   # sorted space
        jcol = jnp.arange(T, dtype=jnp.int32)[None, :]
        # Ray fields packed once: row gathers are index-count bound (~5 ms
        # per gather at 262k regardless of width, docs/PERF.md round 5), so
        # the per-round reorder moves o/d/time/tcap with ONE gather instead
        # of four.
        ray_pack = jnp.concatenate(
            [o, d, time[:, None], jnp.zeros((n, 1), jnp.float32)], axis=1)

        def step(todo, best_t, best_raw, remaining_union: bool):
            """One re-sorted confined pass. All carries live in GLOBAL ray
            order; sorting is internal to the pass."""
            masked = jnp.where(todo & (entry < best_t[:, None]), entry,
                               jnp.inf)
            cur_entry = jnp.min(masked, axis=1)
            pending = jnp.isfinite(cur_entry)
            key = jnp.where(pending, jnp.argmin(masked, axis=1)
                            .astype(jnp.int32), T)
            # Done rays carry key T → they sort to the tail and their tiles
            # launch with empty start sets. Morton below the treelet id
            # keeps intra-tile coherence for the leaf tests.
            order = jnp.argsort((key << 20) | (morton >> 4))
            tcap = jnp.where(pending, best_t, t_min)
            pk = jnp.concatenate(
                [ray_pack[:, :7], tcap[:, None]], axis=1)[order]
            o_s, d_s, tm_s, tcap_s = pk[:, 0:3], pk[:, 3:6], pk[:, 6], \
                pk[:, 7]
            key_s = key[order]

            if remaining_union:
                want_s = jnp.isfinite(masked)[order]          # (n, T)
                tile_any = want_s.reshape(n_grid, tile, T).any(axis=1)
            else:
                tile_any = (jnp.zeros((n_grid, T + 1), bool)
                            .at[ray_tile_s, key_s].set(True))[:, :T]
            k_roots = min(MULTI_K, T)
            topk = jnp.sort(jnp.where(tile_any, jcol, T),
                            axis=1)[:, :k_roots]
            starts = jnp.where(topk < T, self.treelet_nodes[topk], -1)
            over = tile_any.sum(axis=1) > k_roots
            tile_tl = key_s[mids]
            if remaining_union:
                # Overflow in the CLEANUP pass must stay exact: there is no
                # later pass to catch dropped treelets, so fall back to a
                # full-tree root walk, which serves every treelet.
                fallback = jnp.concatenate(
                    [jnp.zeros((n_grid, 1), jnp.int32),
                     jnp.full((n_grid, k_roots - 1), -1, jnp.int32)], axis=1)
                served_over = jnp.ones((n_grid, T), bool)
            else:
                # Mid-round overflow (rare after a fresh sort: only treelet
                # boundary tiles push >1 root): traverse only the
                # tile-middle majority treelet; stragglers stay pending. A
                # tile whose middle ray is not pending (tile_tl == T) gets
                # a no-op start — treelet_nodes[T] is the root, and a full
                # root walk that serves NOTHING is pure waste.
                fallback = jnp.concatenate(
                    [jnp.where(tile_tl < T,
                               self.treelet_nodes[jnp.minimum(tile_tl, T - 1)],
                               -1)[:, None],
                     jnp.full((n_grid, k_roots - 1), -1, jnp.int32)], axis=1)
                served_over = jcol == tile_tl[:, None]
            starts = jnp.where(over[:, None], fallback, starts)
            served = jnp.where(over[:, None], served_over,
                               tile_any)                      # (n_grid, T)
            t_r, i_r = fn(o_s, d_s, tm_s, t_min, t_max,
                          starts=starts, tcap=tcap_s, raw_idx=True)
            # packed scatter-unsort back to global (one index pass)
            res = jnp.zeros((n, 2), jnp.float32).at[order].set(
                jnp.stack([t_r, i_r.astype(jnp.float32)], axis=1))
            t_g = res[:, 0]
            i_g = res[:, 1].astype(jnp.int32)
            improved = (i_g >= 0) & (t_g < best_t)
            best_t = jnp.where(improved, t_g, best_t)
            best_raw = jnp.where(improved, i_g, best_raw)
            # ray's tile in THIS round's order, recovered without a second
            # sort: inv[order[i]] = i.
            inv = jnp.zeros(n, jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))
            served_ray = served[inv // tile] & pending[:, None]
            todo = todo & ~served_ray
            return todo, best_t, best_raw

        for _ in range(self.rounds):
            todo, best_t, best_raw = step(todo, best_t, best_raw, False)
        # Exact cleanup: whatever the rounds left (multi-treelet stragglers).
        todo, best_t, best_raw = step(todo, best_t, best_raw, True)

        idx = jnp.where(best_raw >= 0,
                        self.ks.blockmap[jnp.maximum(best_raw, 0)], -1)
        return best_t, idx

    def __call__(self, o, d, time, t_min, t_max):
        n = o.shape[0]
        fn = self._fn(n)
        if (self.itin and n >= 2048 and self.super_boxes is not None):
            t, idx = self._itinerary_traverse(fn, o, d, time, t_min, t_max,
                                              n)
            hit = idx >= 0
            return prim.finalize_hit(self.cs.prims, o, d, time, t, idx, hit)
        if (self.rebin and n >= 2048 and self.treelets is not None
                and self.treelets.shape[0] > 1):
            t, idx = self._rebin_traverse(fn, o, d, time, t_min, t_max, n)
            hit = idx >= 0
            return prim.finalize_hit(self.cs.prims, o, d, time, t, idx, hit)
        if self.sort and n >= 2048:
            tl = (treelet_ids(o, d, self.treelets)
                  if self.treelets is not None and self.treelets.shape[0] > 1
                  else None)
            keys = sort_keys(o, d, self.lo, self.hi, self.treelets, tl=tl)
            order = jnp.argsort(keys)
            o_s, d_s, tm_s = o[order], d[order], time[order]
            if self.two_pass and tl is not None:
                # Pass 1 primes each ray's t from its tile's own treelet
                # subtree (tiles are treelet-sorted, so the tile-middle
                # ray's treelet is the majority's); pass 2 traverses from
                # the root with those per-ray caps — the slab test then
                # prunes everything farther than the primed hit. Any pass-1
                # hit is a genuine intersection, so the cap is always
                # conservative and pass 2 restores exactness.
                tile = TS * 128
                n_grid = -(-n // tile)
                mids = jnp.minimum(
                    jnp.arange(n_grid, dtype=jnp.int32) * tile + tile // 2,
                    n - 1)
                tl_sorted = tl[order]
                starts = self.treelet_nodes[tl_sorted[mids]]
                t1, i1 = fn(o_s, d_s, tm_s, t_min, t_max, starts=starts,
                            raw_idx=True)
                t2, i2 = fn(o_s, d_s, tm_s, t_min, t_max, tcap=t1,
                            raw_idx=True)
                idx_raw = jnp.where(i2 >= 0, i2, i1)
                t = jnp.where(i2 >= 0, t2, t1)
                idx = jnp.where(
                    idx_raw >= 0,
                    self.ks.blockmap[jnp.maximum(idx_raw, 0)], -1)
            else:
                t, idx = fn(o_s, d_s, tm_s, t_min, t_max)
            # scatter-unsort (cheaper than a second argsort)
            t = jnp.zeros_like(t).at[order].set(t)
            idx = jnp.zeros_like(idx).at[order].set(idx)
        else:
            t, idx = fn(o, d, time, t_min, t_max)
        hit = idx >= 0
        return prim.finalize_hit(self.cs.prims, o, d, time, t, idx, hit)


# Trees with at least this many nodes default to the re-binned traversal:
# below it a single sorted union pass visits the whole (small) tree anyway
# and the extra sorts/launches are pure overhead.
REBIN_NODES = 4096


def attach(cs, seed: int = 1, sort: bool = True,
           interpret: bool | None = None, two_pass: bool = False,
           rebin: bool | None = None, rounds: int = 2,
           treelet_target: int = 512, sched: str | None = None):
    """Build a leaf-16 BVH4, reorder the scene's primitives, and return
    (cs_reordered, BVHKernelIntersector). Mirrors accel.traverse.attach but
    with the kernel's wide leaves. rebin=None auto-enables the multi-round
    treelet-re-binned traversal for dragon-class trees (>= REBIN_NODES)."""
    # Everything host-side (the build, reorder, bounds and packing are
    # numpy), one upload at the end. The compiler keeps a host mirror of the
    # prim SoA (compiler.host_prims_for) so no device→host fetch is needed
    # at all; the device_get fallback covers prims this process didn't
    # compile — per-array round trips through a tunneled device cost
    # minutes at dragon scale.
    from izpi_tpu.scene import compiler as compiler_mod

    host_prims = compiler_mod.host_prims_for(cs.prims)
    if host_prims is None:
        host_prims = prim.Prims(*jax.device_get(list(cs.prims)))
    arrays = bvh_build.build_bvh4(host_prims, seed, leaf_size=KERNEL_LEAF,
                                  method="sah")
    # KSTACK - MULTI_K: the descent shares the stack with up to MULTI_K-1
    # parked multi-start roots, and the dead-slot write clamps to KSTACK-1.
    errors = bvh_build.validate(arrays, host_prims.count,
                                stack_depth=KSTACK - MULTI_K)
    if errors:
        raise AssertionError(f"BVH4 validation failed: {errors[:5]}")
    if rebin is None:
        rebin = arrays.child.shape[0] >= REBIN_NODES
    # Treelet extraction may EXTEND the node table (synthetic nodes for
    # frontier leaf slots), so it runs before pack_scene. Validation ran on
    # the unextended tree — synthetic nodes deliberately double-cover prims.
    boxes, nodes, arrays = extract_treelets(arrays, target=treelet_target)
    # Scheduler choice for dragon-class trees: "itin" (round-5 precomputed
    # itineraries over the 2-level hierarchy, the default) or "v2" (the
    # round-4 masked-argmin re-binning, kept for A/B).
    # Default v2: the itinerary scheduler wins standalone (168 vs 254 ms
    # at 262k synthetic bounce rays) but measured SLOWER inside the
    # production pool while-loop (dragon e2e 0.131 vs 0.234 Mrays/s) — an
    # in-loop degradation not yet attributed; see docs/PERF.md round 5.
    if sched is None:
        sched = os.environ.get("IZPI_DRAGON_SCHED", "v2")
    itin = rebin and sched == "itin" and boxes.shape[0] > 16
    super_boxes = subtable = None
    if itin:
        boxes, nodes, super_boxes, subtable = build_supers(boxes, nodes)
    idx = np.asarray(arrays.prim_order)
    host_reordered = prim.Prims(*[np.asarray(f)[idx] for f in host_prims])
    ks = pack_scene(host_reordered, arrays)
    bb_min, bb_max = bvh_build.prim_bounds(host_reordered)
    cs2 = cs._replace(prims=prim.Prims(
        *[jnp.asarray(f) for f in host_reordered]))
    inter = BVHKernelIntersector(
        cs2, ks, bb_min.min(axis=0), bb_max.max(axis=0),
        sort=sort, interpret=interpret,
        treelets=boxes, treelet_nodes=nodes, two_pass=two_pass,
        rebin=rebin and not itin, rounds=rounds,
        super_boxes=super_boxes, subtable=subtable, itin=itin)
    return cs2, inter
