"""Round-4 dragon instrumentation (VERDICT item 1): itinerary-length and
tile-purity histograms for the treelet re-binning scheme, at several treelet
granularities, for camera rays AND realistic diffuse bounce rays.

Pure XLA stats — no Pallas compile — so a T sweep is cheap. Decides the
round-4 traversal redesign. Findings land in docs/PERF.md."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from izpi_tpu import camera as camera_mod
from izpi_tpu.accel import bvh_build
from izpi_tpu.geometry import primitives as prim
from izpi_tpu.ops import bvh_kernel
from izpi_tpu.scene.compiler import compile_scene, host_prims_for
from izpi_tpu.scene.library.extracted import (
    cornell_box_pbr_stanford_dragon_spectral)

n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 871_414
scene = cornell_box_pbr_stanford_dragon_spectral(aspect=1.0, n_tris=n_tris)
cs, meta = compile_scene(scene)
host_prims = host_prims_for(cs.prims)
t0 = time.time()
arrays = bvh_build.build_bvh4(host_prims, 1, leaf_size=bvh_kernel.KERNEL_LEAF,
                              method="sah")
print(f"build {time.time()-t0:.1f}s nodes={arrays.child.shape[0]}", flush=True)

N = 1 << 18
rs = np.random.RandomState(0)
s = jnp.asarray(rs.rand(N), jnp.float32)
t = jnp.asarray(rs.rand(N), jnp.float32)
u3 = jnp.asarray(rs.rand(N, 3), jnp.float32)
o_c, d_c, tm = camera_mod.get_rays(cs.camera, s, t, u3)

# realistic bounce rays: brute hit points from a camera subset + cosine-ish
# random directions. Use the mxu/brute intersector on a subset to stay cheap.
from izpi_tpu.geometry.primitives import intersect_brute  # noqa: E402
sub = 4096
rec = intersect_brute(cs.prims, o_c[:sub], d_c[:sub], tm[:sub], 1e-3,
                      prim.T_MAX)
rec = jax.device_get(rec)
ids = np.nonzero(np.asarray(rec.hit))[0]
p = np.asarray(rec.p)[ids]
nrm = np.asarray(rec.normal)[ids]
pick = rs.randint(0, len(ids), N)
w = rs.randn(N, 3)
w /= np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-9)
# flip into the hemisphere of the surface normal (diffuse-like)
flip = (w * nrm[pick]).sum(1) < 0
w[flip] = -w[flip]
o_b = jnp.asarray(p[pick] + nrm[pick] * 1e-3, jnp.float32)
d_b = jnp.asarray(w, jnp.float32)

tile = bvh_kernel.TS * 128
n_grid = N // tile

for target in (48, 128, 256, 512, 1024):
    boxes, nodes, _arr2 = bvh_kernel.extract_treelets(arrays, target=target)
    T = boxes.shape[0]
    boxes_j = jnp.asarray(boxes)

    # treelet sizes in prims
    count = np.asarray(arrays.count)
    child = np.asarray(arrays.child)
    nprims = np.zeros(child.shape[0] + len(nodes), np.int64)
    # subtree prim counts children-first
    base = np.zeros(child.shape[0], np.int64)
    for ni in range(child.shape[0] - 1, -1, -1):
        tot = 0
        for sl in range(4):
            if count[ni, sl] > 0:
                tot += count[ni, sl]
            elif count[ni, sl] == 0:
                tot += base[child[ni, sl]]
        base[ni] = tot
    tl_sizes = []
    for nd in nodes:
        tl_sizes.append(int(base[nd]) if nd < child.shape[0] else -1)
    tl_sizes = np.asarray([x for x in tl_sizes if x >= 0])

    for label, o, d in (("camera", o_c, d_c), ("bounce", o_b, d_b)):
        entry = bvh_kernel.treelet_entries(o, d, boxes_j)
        itin = jnp.isfinite(entry).sum(axis=1)
        # nearest-treelet binning + morton sort (same key as _rebin_traverse)
        morton = bvh_kernel.sort_keys(o, d,
                                      jnp.asarray(arrays.bounds[0, 0:12:4]),
                                      jnp.asarray(arrays.bounds[0, 12::4]))
        tl0 = jnp.argmin(entry, axis=1).astype(jnp.int32)
        key0 = jnp.where(jnp.any(jnp.isfinite(entry), axis=1), tl0, T)
        order = jnp.argsort((key0 << 20) | (morton >> 4))
        key_s = key0[order].reshape(n_grid, tile)
        distinct = jax.vmap(lambda k: jnp.unique(k, size=64,
                                                 fill_value=-1))(key_s)
        n_distinct = (distinct >= 0).sum(axis=1)
        itin_np = np.asarray(itin)
        nd_np = np.asarray(n_distinct)
        print(f"T={T:5d} ({label}): itinerary mean={itin_np.mean():6.2f} "
              f"p50={np.percentile(itin_np, 50):5.0f} "
              f"p90={np.percentile(itin_np, 90):5.0f} "
              f"p99={np.percentile(itin_np, 99):5.0f} max={itin_np.max():5d} "
              f"| tile-distinct mean={nd_np.mean():5.2f} "
              f"p90={np.percentile(nd_np, 90):4.0f} max={nd_np.max():4d}",
              flush=True)
    print(f"T={T:5d} treelet prims: mean={tl_sizes.mean():8.0f} "
          f"p90={np.percentile(tl_sizes, 90):8.0f} max={tl_sizes.max():8d} "
          f"count_real={len(tl_sizes)}", flush=True)
