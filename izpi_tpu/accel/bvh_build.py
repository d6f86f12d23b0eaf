"""Host-side BVH4 construction.

Mirrors the reference's build pipeline (internal/hitable/bvh4.go:517-792):
binary median-split BVH with a seeded random split axis and leaf size ≤ 4,
collapsed two levels at a time into 4-wide nodes, primitives reordered so
every leaf is one contiguous run, and float32 bounds rounded conservatively
outward (nextafter, bvh4.go:494-514). The output is the flat SoA node layout
the device traversal consumes:

  bounds: (Nn, 24) f32 — [minx×4, miny×4, minz×4, maxx×4, maxy×4, maxz×4]
          (the 96-byte SoA node of bvh4.go:23-39)
  child:  (Nn, 4) i32 — internal: child node index; leaf: first-primitive
          index into the REORDERED primitive arrays; empty: -1
  count:  (Nn, 4) i32 — 0: internal, >0: leaf primitive count, -1: empty

Conservative bounds never change hit results (only culling quality), so the
per-primitive AABB padding follows the reference loosely: triangles use the
relative epsilon of triangle.go:100-113; rects/spheres a small absolute pad.

If the native builder (izpi_tpu.accel.native) is available it does the
recursion in C++; the numpy path below is the always-available fallback and
the correctness oracle for it.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np

from izpi_tpu.geometry import primitives as prim

LEAF_SIZE = 4

# LCG matching fastrandom defaults (fastrandom.go:7-11) for seeded split-axis
# choice like the reference's injected randomFunc (bvh4_test.go:57).
_LCG_M = 4294967296
_LCG_A = 1664525
_LCG_C = 1013904223


class _LCG:
    def __init__(self, seed: int = 1):
        self.state = seed % _LCG_M

    def float64(self) -> float:
        self.state = (_LCG_A * self.state + _LCG_C) % _LCG_M
        return self.state / _LCG_M


class BVH4Arrays(NamedTuple):
    bounds: np.ndarray      # (Nn, 24) f32
    child: np.ndarray       # (Nn, 4) i32
    count: np.ndarray       # (Nn, 4) i32
    prim_order: np.ndarray  # (P,) i32 — new_prims[i] = old_prims[prim_order[i]]


def prim_bounds(prims) -> Tuple[np.ndarray, np.ndarray]:
    """Per-primitive conservative AABBs from the compiled SoA, on host.
    Returns (bb_min (P,3), bb_max (P,3)) float64."""
    kind = np.asarray(prims.kind)
    g0 = np.asarray(prims.g0, np.float64)
    g1 = np.asarray(prims.g1, np.float64)
    g2 = np.asarray(prims.g2, np.float64)

    p_count = kind.shape[0]
    bb_min = np.zeros((p_count, 3))
    bb_max = np.zeros((p_count, 3))

    tri = kind == prim.KIND_TRIANGLE
    if tri.any():
        v0 = g0[tri]
        v1 = v0 + g1[tri]
        v2 = v0 + g2[tri]
        mn = np.minimum(np.minimum(v0, v1), v2)
        mx = np.maximum(np.maximum(v0, v1), v2)
        # triangle.go:100-113: ε = max(maxDim·1e-4, 1e-6)
        max_dim = (mx - mn).max(axis=1, keepdims=True)
        eps = np.maximum(max_dim * 1e-4, 1e-6)
        bb_min[tri] = mn - eps
        bb_max[tri] = mx + eps

    rect = kind == prim.KIND_RECT
    if rect.any():
        p0 = g0[rect]
        corners = np.stack([p0, p0 + g1[rect], p0 + g2[rect],
                            p0 + g1[rect] + g2[rect]], axis=1)
        bb_min[rect] = corners.min(axis=1) - 1e-3
        bb_max[rect] = corners.max(axis=1) + 1e-3

    sph = kind == prim.KIND_SPHERE
    if sph.any():
        r = g2[sph][:, 0:1]
        c0, c1 = g0[sph], g1[sph]
        bb_min[sph] = np.minimum(c0, c1) - r
        bb_max[sph] = np.maximum(c0, c1) + r

    return bb_min, bb_max


@dataclasses.dataclass
class _BinNode:
    bb_min: np.ndarray
    bb_max: np.ndarray
    start: int = -1     # leaf: first index into the ordered prim list
    count: int = 0      # leaf: number of prims (0 → internal)
    left: int = -1
    right: int = -1


def _build_binary(bb_min, bb_max, seed: int, leaf_size: int = LEAF_SIZE):
    """Binary median-split BVH over primitive indices (bvh4.go:596-652):
    random split axis, sort segment by centroid, split at the median,
    leaves hold ≤ leaf_size primitives. Iterative with an explicit stack."""
    p_count = bb_min.shape[0]
    centroids = (bb_min + bb_max) * 0.5
    order = np.arange(p_count, dtype=np.int64)
    rng = _LCG(seed)
    nodes: list[_BinNode] = []

    def seg_bounds(lo, hi):
        idx = order[lo:hi]
        return bb_min[idx].min(axis=0), bb_max[idx].max(axis=0)

    # (node_idx, lo, hi) work stack; children filled after creation.
    root = _BinNode(*seg_bounds(0, p_count))
    nodes.append(root)
    stack = [(0, 0, p_count)]
    while stack:
        ni, lo, hi = stack.pop()
        n = hi - lo
        if n <= leaf_size:
            nodes[ni].start = lo
            nodes[ni].count = n
            continue
        axis = int(rng.float64() * 3.0) % 3
        seg = order[lo:hi]
        key = centroids[seg, axis]
        sort_idx = np.argsort(key, kind="stable")
        order[lo:hi] = seg[sort_idx]
        mid = lo + n // 2
        li = len(nodes)
        nodes.append(_BinNode(*seg_bounds(lo, mid)))
        ri = len(nodes)
        nodes.append(_BinNode(*seg_bounds(mid, hi)))
        nodes[ni].left = li
        nodes[ni].right = ri
        stack.append((li, lo, mid))
        stack.append((ri, mid, hi))
    return nodes, order


def _build_binary_sah(bb_min, bb_max, leaf_size: int = LEAF_SIZE,
                      n_bins: int = 16):
    """Binned-SAH binary BVH (deterministic, no RNG) — the quality build for
    the Pallas traversal kernel. The reference's median/random-axis build
    (kept in _build_binary for topology parity) produces ~2-3× more node
    visits per ray; since the traversal RESULT is tree-independent, the
    kernel is free to use the better tree.

    Split choice: for each axis, `n_bins` equal centroid bins; cost =
    SA_L·N_L + SA_R·N_R; best (axis, bin) wins, centroid-median fallback
    when binning degenerates. Splitting continues while n > leaf_size.
    """
    p_count = bb_min.shape[0]
    centroids = (bb_min + bb_max) * 0.5
    order = np.arange(p_count, dtype=np.int64)
    nodes: list[_BinNode] = []

    def seg_bounds(lo, hi):
        idx = order[lo:hi]
        return bb_min[idx].min(axis=0), bb_max[idx].max(axis=0)

    def half_area(lo3, hi3):
        d = np.maximum(hi3 - lo3, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    nodes.append(_BinNode(*seg_bounds(0, p_count)))
    stack = [(0, 0, p_count)]
    while stack:
        ni, lo, hi = stack.pop()
        n = hi - lo
        if n <= leaf_size:
            nodes[ni].start = lo
            nodes[ni].count = n
            continue
        seg = order[lo:hi]
        cen = centroids[seg]
        cmin = cen.min(axis=0)
        cmax = cen.max(axis=0)
        best = None  # (cost, axis, bin_edge_value)
        for axis in range(3):
            extent = cmax[axis] - cmin[axis]
            if extent <= 0.0:
                continue
            scale = n_bins / extent
            bins = np.minimum(((cen[:, axis] - cmin[axis]) * scale)
                              .astype(np.int64), n_bins - 1)
            counts = np.bincount(bins, minlength=n_bins)
            # per-bin bounds, then prefix/suffix sweeps
            b_lo = np.full((n_bins, 3), np.inf)
            b_hi = np.full((n_bins, 3), -np.inf)
            for b in range(n_bins):
                m = bins == b
                if counts[b]:
                    b_lo[b] = bb_min[seg[m]].min(axis=0)
                    b_hi[b] = bb_max[seg[m]].max(axis=0)
            l_lo = np.minimum.accumulate(b_lo, axis=0)
            l_hi = np.maximum.accumulate(b_hi, axis=0)
            r_lo = np.minimum.accumulate(b_lo[::-1], axis=0)[::-1]
            r_hi = np.maximum.accumulate(b_hi[::-1], axis=0)[::-1]
            n_l = np.cumsum(counts)
            for b in range(n_bins - 1):
                nl, nr = n_l[b], n - n_l[b]
                if nl == 0 or nr == 0:
                    continue
                cost = (half_area(l_lo[b], l_hi[b]) * nl
                        + half_area(r_lo[b + 1], r_hi[b + 1]) * nr)
                if best is None or cost < best[0]:
                    edge = cmin[axis] + (b + 1) / scale
                    best = (cost, axis, edge, nl)
        mid = None
        if best is not None:
            _, axis, edge, _nl = best
            left_mask = centroids[seg, axis] < edge
            nl = int(left_mask.sum())
            if 0 < nl < n:
                # stable partition keeps determinism across builders
                order[lo:hi] = np.concatenate([seg[left_mask],
                                               seg[~left_mask]])
                mid = lo + nl
        if mid is None:
            # degenerate binning: median split on the widest centroid axis
            axis = int(np.argmax(cmax - cmin))
            sort_idx = np.argsort(cen[:, axis], kind="stable")
            order[lo:hi] = seg[sort_idx]
            mid = lo + n // 2
        li = len(nodes)
        nodes.append(_BinNode(*seg_bounds(lo, mid)))
        ri = len(nodes)
        nodes.append(_BinNode(*seg_bounds(mid, hi)))
        nodes[ni].left = li
        nodes[ni].right = ri
        stack.append((li, lo, mid))
        stack.append((ri, mid, hi))
    return nodes, order


def _conservative_f32(bb_min, bb_max):
    """Round f64 bounds outward to f32 (bvh4.go:494-514)."""
    lo = bb_min.astype(np.float32)
    hi = bb_max.astype(np.float32)
    lo = np.where(lo.astype(np.float64) > bb_min,
                  np.nextafter(lo, np.float32(-np.inf)), lo)
    hi = np.where(hi.astype(np.float64) < bb_max,
                  np.nextafter(hi, np.float32(np.inf)), hi)
    return lo, hi


def build_bvh4(prims, seed: int = 1, leaf_size: int = LEAF_SIZE,
               method: str = "median") -> BVH4Arrays:
    """Build the flat BVH4 from a compiled primitive SoA (host arrays).
    method: "median" (reference-parity random-axis median split) or "sah"
    (binned SAH — higher quality, used by the Pallas traversal kernel)."""
    bb_min, bb_max = prim_bounds(prims)
    return build_bvh4_from_bounds(bb_min, bb_max, seed, leaf_size=leaf_size,
                                  method=method)


def build_bvh4_from_bounds(bb_min, bb_max, seed: int = 1,
                           use_native: Optional[bool] = None,
                           leaf_size: int = LEAF_SIZE,
                           method: str = "median") -> BVH4Arrays:
    if use_native is None:
        use_native = True
    if use_native:
        from izpi_tpu.accel import native

        result = native.build(np.ascontiguousarray(bb_min),
                              np.ascontiguousarray(bb_max), seed,
                              leaf_size=leaf_size, method=method)
        if result is not None:
            bounds, child, count, order = result
            return BVH4Arrays(bounds=bounds, child=child, count=count,
                              prim_order=order)
    if method == "sah":
        nodes, order = _build_binary_sah(bb_min, bb_max, leaf_size=leaf_size)
    else:
        nodes, order = _build_binary(bb_min, bb_max, seed,
                                     leaf_size=leaf_size)

    # Collapse: each BVH4 node's slots are the binary node's grandchildren
    # (bvh4.go:714-792 collectChildren). A binary child that is a leaf (or
    # has leaf children) occupies a slot directly.
    out_bounds: list[np.ndarray] = []
    out_child: list[list[int]] = []
    out_count: list[list[int]] = []

    def collect_slots(bi: int) -> list[int]:
        """Grandchildren of binary node bi (or fewer if shallow)."""
        node = nodes[bi]
        if node.count > 0:
            return [bi]
        slots = []
        for ci in (node.left, node.right):
            c = nodes[ci]
            if c.count > 0:
                slots.append(ci)
            else:
                slots.extend([c.left, c.right])
        return slots

    # BFS emitting wide nodes.
    emitted: dict[int, int] = {}
    queue = [0]
    emitted[0] = 0
    out_bounds.append(np.zeros(24, np.float32))
    out_child.append([-1] * 4)
    out_count.append([-1] * 4)

    qi = 0
    while qi < len(queue):
        bi = queue[qi]
        wi = emitted[bi]
        qi += 1
        slots = collect_slots(bi)
        assert 1 <= len(slots) <= 4
        bmin = np.full((4, 3), np.float32(np.finfo(np.float32).max))
        bmax = np.full((4, 3), np.float32(-np.finfo(np.float32).max))
        for s, sbi in enumerate(slots):
            snode = nodes[sbi]
            lo, hi = _conservative_f32(snode.bb_min, snode.bb_max)
            bmin[s] = lo
            bmax[s] = hi
            if snode.count > 0:
                out_child[wi][s] = snode.start
                out_count[wi][s] = snode.count
            else:
                nwi = len(out_bounds)
                emitted[sbi] = nwi
                out_bounds.append(np.zeros(24, np.float32))
                out_child.append([-1] * 4)
                out_count.append([-1] * 4)
                queue.append(sbi)
                out_child[wi][s] = nwi
                out_count[wi][s] = 0
        # Empty slots keep always-miss degenerate boxes (bvh4.go:728-734).
        out_bounds[wi] = np.concatenate(
            [bmin[:, 0], bmin[:, 1], bmin[:, 2],
             bmax[:, 0], bmax[:, 1], bmax[:, 2]]
        ).astype(np.float32)

    return BVH4Arrays(
        bounds=np.stack(out_bounds),
        child=np.asarray(out_child, np.int32),
        count=np.asarray(out_count, np.int32),
        prim_order=order.astype(np.int32),
    )


def max_stack_occupancy(bvh: BVH4Arrays) -> int:
    """Worst-case traversal stack occupancy (entries simultaneously live)
    for the pop-one / push-all-hit-internal-children traversal of
    accel.traverse. Visiting a child while r of its siblings are still
    stacked costs r + occupancy(child); the adversarial pop order visits
    the deepest child with the most siblings remaining, so
    g(n) = max(k, max_i ((k-1-i) + g_desc[i])) with g_desc the children's
    occupancies sorted descending and k the internal-child count. The
    result bounds what the device can ever need."""
    n_nodes = bvh.child.shape[0]
    g = np.zeros(n_nodes, np.int64)
    # Children always have larger node indices than their parent (the build
    # emits BFS order), so a reverse sweep is a valid post-order.
    for ni in range(n_nodes - 1, -1, -1):
        kids = [int(bvh.child[ni, s]) for s in range(4)
                if bvh.count[ni, s] == 0]
        if not kids:
            g[ni] = 1
            continue
        desc = sorted((int(g[c]) for c in kids), reverse=True)
        k = len(desc)
        g[ni] = max(k, max((k - 1 - i) + gi for i, gi in enumerate(desc)))
    return int(g[0]) if n_nodes else 0


def validate(bvh: BVH4Arrays, p_count: int,
             stack_depth: Optional[int] = None) -> list:
    """Structural integrity check mirroring BVH4.validate (bvh4.go:399-466):
    every primitive covered exactly once by the leaves, child indices sane,
    and (when stack_depth is given) the worst-case traversal stack fits —
    a pathological tree raises at build instead of silently losing hits."""
    errors = []
    covered = np.zeros(p_count, np.int32)
    n_nodes = bvh.child.shape[0]
    for ni in range(n_nodes):
        for s in range(4):
            cnt = bvh.count[ni, s]
            ch = bvh.child[ni, s]
            if cnt == -1:
                continue
            if cnt == 0:
                if not (ni < ch < n_nodes):
                    errors.append(f"node {ni} slot {s}: bad child {ch}")
            else:
                if ch < 0 or ch + cnt > p_count:
                    errors.append(f"node {ni} slot {s}: bad leaf run {ch}+{cnt}")
                else:
                    covered[ch: ch + cnt] += 1
    bad = np.nonzero(covered != 1)[0]
    if bad.size:
        errors.append(f"{bad.size} prims not covered exactly once")
    if stack_depth is not None and not errors:
        occ = max_stack_occupancy(bvh)
        if occ > stack_depth:
            errors.append(
                f"worst-case traversal stack {occ} exceeds device stack "
                f"depth {stack_depth}")
    return errors
