"""AOV samplers: albedo, normal, wireframe.

Reference: internal/sampler/albedo.go, normal.go, wireframe.go — single
first-hit queries, batched here. Wireframe reproduces the HitEdge protocol
(hitable/*.go HitEdge + segment.Belongs, segment/segment.go:13-31): a hit
whose point lies within angular tolerance 0.005 of a primitive edge paints
ink, any other hit (or miss) paints paper.
"""

from __future__ import annotations

import jax.numpy as jnp

from izpi_tpu.core import vecmath as vm
from izpi_tpu.geometry import primitives as prim
from izpi_tpu.integrator import path as path_mod
from izpi_tpu.materials import tables as mt


def _segment_belongs(a, b, c):
    """Point c near segment ab (segment.go:13-31): |unit(ab)×unit(ac)| < .005
    and the projection of ac onto ab within [0, |ab|²]."""
    ab = b - a
    ac = c - a
    cr = vm.cross(vm.normalize(ab), vm.normalize(ac))
    colinear = vm.length(cr) < 0.005
    kac = vm.dot(ab, ac)
    kab = vm.dot(ab, ab)
    return colinear & (kac >= 0) & (kac <= kab)


def sample_albedo(cs, meta, intersect, o, d, time):
    """First-hit albedo (albedo.go:31-36). Dielectrics report (1,1,1)
    (dielectric.go:224); misses are black."""
    rec = intersect(o, d, time, path_mod.T_MIN, prim.T_MAX)
    mat = path_mod._gather_mat(cs, rec.mat_id)
    albedo = path_mod._eval_tex(cs, meta, mat["tex_albedo"],
                                rec.u, rec.v, rec.p)
    albedo = jnp.where((mat["kind"] == mt.MAT_DIELECTRIC)[:, None],
                       1.0, albedo)
    return jnp.where(rec.hit[:, None], albedo, 0.0)


def sample_normal(cs, meta, intersect, o, d, time):
    """First-hit record normal (normal.go:28-33); includes the PBR triangle
    normal-map step the reference applies inside triangle.Hit."""
    rec = intersect(o, d, time, path_mod.T_MIN, prim.T_MAX)
    n = rec.normal
    if meta.has_pbr:
        mat = path_mod._gather_mat(cs, rec.mat_id)
        nm_rgb = path_mod._eval_tex(cs, meta, mat["tex_normal"],
                                    rec.u, rec.v, rec.p)
        rec_n, _pbr_n, _is_pbr = path_mod._pbr_normals(cs, meta, mat, rec, d,
                                                       nm_rgb)
        n = rec_n
    return jnp.where(rec.hit[:, None], n, 0.0)


def sample_wireframe(cs, meta, intersect, o, d, time, ink, paper):
    """Edge AOV (wireframe.go:34-40 + per-hitable HitEdge)."""
    rec = intersect(o, d, time, path_mod.T_MIN, prim.T_MAX)
    pidx = jnp.maximum(rec.prim_idx, 0)
    kind = cs.prims.kind[pidx]
    g0 = cs.prims.g0[pidx]
    g1 = cs.prims.g1[pidx]
    g2 = cs.prims.g2[pidx]
    c = rec.p

    # Triangle edges (triangle.go HitEdge): v0-v1, v1-v2, v2-v0.
    v0 = g0
    v1 = g0 + g1
    v2 = g0 + g2
    tri_edge = (
        _segment_belongs(v0, v1, c)
        | _segment_belongs(v1, v2, c)
        | _segment_belongs(v2, v0, c)
    )

    # Rect edges (xzrect.go HitEdge): the 4 perimeter segments.
    r00 = g0
    r10 = g0 + g1
    r11 = g0 + g1 + g2
    r01 = g0 + g2
    rect_edge = (
        _segment_belongs(r00, r10, c)
        | _segment_belongs(r10, r11, c)
        | _segment_belongs(r11, r01, c)
        | _segment_belongs(r01, r00, c)
    )

    # Sphere silhouette (sphere.go HitEdge): angle between (p-o) and
    # (p-center) within π/2 + 0.1.
    center = prim.sphere_center(g0, g1, g2[:, 1], g2[:, 2], time)
    a = rec.p - o
    b = rec.p - center
    denom = vm.length(a) * vm.length(b)
    cosang = vm.dot(a, b) / jnp.where(denom == 0.0, 1.0, denom)
    theta = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    sph_edge = jnp.abs(theta) <= (jnp.pi / 2.0 + 0.1)

    edge = jnp.where(
        kind == prim.KIND_TRIANGLE, tri_edge,
        jnp.where(kind == prim.KIND_RECT, rect_edge, sph_edge),
    )
    ink_v = jnp.asarray(ink, jnp.float32)
    paper_v = jnp.asarray(paper, jnp.float32)
    return jnp.where((rec.hit & edge)[:, None], ink_v[None, :],
                     paper_v[None, :])
