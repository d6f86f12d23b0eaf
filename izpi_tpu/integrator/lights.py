"""Light-list sampling and PDF evaluation (the NEE half of the mixture PDF).

Reference semantics being reproduced (see internal/pdf/hitable.go +
internal/hitable/hitable_slice.go:98-115):

- The light list's members are the scene's emitter hitables at their original
  granularity (one rect/sphere/triangle per member, transport.go:67-72) —
  including dielectrics, whose IsEmitter()==true hack (dielectric.go:215) puts
  glass in the list so caustic paths get importance-sampled.
- PDFValue(o, v) = mean over members of the member's own PDF, each of which
  re-intersects that member's geometry (xzrect.go:106-116, triangle.go:266,
  sphere.go:129-137). NaNs from inside-sphere origins propagate, as in Go.
- Random(o) picks a member uniformly, then samples it: rects uniformly by
  area (xzrect.go:118), triangles with the reference's non-uniform
  double-lerp (triangle.go:317 — a quirk we keep for parity), spheres with
  cone sampling (sphere.go:139).
- Translate/RotateY wrappers delegate PDFValue/Random to the *untransformed*
  inner hitable (translate.go:58-64, rotate_y.go:150-156) — a reference bug
  kept bug-for-bug: the compiler records untransformed geometry for wrapped
  lights.
- Box emitters have PDFValue 0 and Random (1,0,0) (box.go:57-63).

Member kinds: 0 RECT (parallelogram), 1 TRIANGLE, 2 SPHERE, 3 NULL.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from izpi_tpu.core import onb as onb_mod
from izpi_tpu.core import sampling
from izpi_tpu.core import vecmath as vm
from izpi_tpu.geometry import primitives as prim

LIGHT_RECT = 0
LIGHT_TRIANGLE = 1
LIGHT_SPHERE = 2
LIGHT_NULL = 3


class Lights(NamedTuple):
    kind: jax.Array    # (L,) int32
    l0: jax.Array      # (L, 3) rect corner / tri v0 / sphere center0
    l1: jax.Array      # (L, 3) rect e1 / tri v1
    l2: jax.Array      # (L, 3) rect e2 / tri v2
    normal: jax.Array  # (L, 3) rect/tri unit normal
    area: jax.Array    # (L,)
    radius: jax.Array  # (L,) sphere radius

    @property
    def count(self) -> int:
        return self.kind.shape[0]


def pdf_value(lights: Lights, o, v):
    """Mean member PDF for directions v from origins o.

    o, v: (N, 3); returns (N,). Dense (N, L) evaluation — L is the number of
    emitter members, small in every reference scene."""
    n_l = lights.count
    ob = o[:, None, :]
    vb = v[:, None, :]
    kind = lights.kind[None, :]

    # Rect member: hit test then t²|v|² / (cos·area) with
    # cos = |dot(v, n)|/|v| (xzrect.go:106-116).
    t_r, ok_r, _, _ = prim.rect_t(
        ob, vb, lights.l0[None], lights.l1[None], lights.l2[None],
        lights.normal[None], 1e-3, prim.T_MAX,
    )
    v_len2 = vm.squared_length(vb)
    v_len = jnp.sqrt(v_len2)
    cos_r = jnp.abs(vm.dot(vb, lights.normal[None])) / v_len
    pdf_rect = jnp.where(
        ok_r, t_r * t_r * v_len2 / (cos_r * lights.area[None]), 0.0
    )

    # Triangle member: same formula with the triangle's area
    # (triangle.go:266-276). Note Möller–Trumbore ε tolerances apply.
    e1 = lights.l1 - lights.l0
    e2 = lights.l2 - lights.l0
    t_t, ok_t, _, _ = prim.triangle_t(
        ob, vb, lights.l0[None], e1[None], e2[None], 1e-3, prim.T_MAX
    )
    cos_t = jnp.abs(vm.dot(vb, lights.normal[None])) / v_len
    pdf_tri = jnp.where(
        ok_t, t_t * t_t * v_len2 / (cos_t * lights.area[None]), 0.0
    )

    # Sphere member: solid-angle cone (sphere.go:129-137). Deliberate
    # deviation: the reference's unclamped sqrt yields NaN for origins
    # INSIDE the sphere (math.Sqrt of a negative) — common under glass
    # spheres, which sit in the light list via the dielectric IsEmitter
    # quirk — and a single NaN pdf poisons the whole spectral canvas (the
    # RGB path hides it behind the per-sample DeNAN). Clamping to 0 gives
    # the full-hemisphere pdf 1/2π for interior origins and equals the
    # reference everywhere the reference is finite.
    _, ok_s, _ = prim.sphere_t(
        ob, vb, lights.l0[None], lights.radius[None], 1e-3, prim.T_MAX
    )
    dist2 = vm.squared_length(lights.l0[None] - ob)
    cos_theta_max = jnp.sqrt(jnp.maximum(
        1.0 - lights.radius[None] ** 2 / dist2, 0.0
    ))
    solid_angle = 2.0 * jnp.pi * (1.0 - cos_theta_max)
    pdf_sph = jnp.where(ok_s, 1.0 / solid_angle, 0.0)

    per = jnp.where(
        kind == LIGHT_RECT, pdf_rect,
        jnp.where(kind == LIGHT_TRIANGLE, pdf_tri,
                  jnp.where(kind == LIGHT_SPHERE, pdf_sph, 0.0)),
    )
    return jnp.sum(per, axis=1) / n_l


def sample(lights: Lights, o, uniforms):
    """Sample a direction toward the light list from each origin.

    o: (N, 3); uniforms: (N, 4) — u0 picks the member
    (hitable_slice.go:108), u1..u3 sample it. Returns (N, 3) directions
    (unnormalized where the reference's are: rect/tri return point-origin)."""
    n_l = lights.count
    u0 = uniforms[:, 0]
    idx = jnp.minimum((u0 * n_l).astype(jnp.int32), n_l - 1)

    # One packed-row gather instead of five per-field gathers (gather
    # latency serializes in the bounce chain, docs/PERF.md); the (L, 11)
    # pack is loop-invariant and hoisted by XLA.
    packed = jnp.concatenate([
        lights.kind.astype(jnp.float32)[:, None], lights.l0, lights.l1,
        lights.l2, lights.radius[:, None]], axis=1)
    row = packed[idx]
    kind = row[:, 0].astype(jnp.int32)
    l0 = row[:, 1:4]
    l1 = row[:, 4:7]
    l2 = row[:, 7:10]
    radius = row[:, 10]

    u1 = uniforms[:, 1]
    u2 = uniforms[:, 2]
    u3 = uniforms[:, 3]

    # Rect: uniform point on the parallelogram (xzrect.go:118-126).
    rect_point = l0 + u1[:, None] * l1 + u2[:, None] * l2
    rect_dir = rect_point - o

    # Triangle: the reference's lerp-lerp sampling (triangle.go:317-326):
    # p = lerp(lerp(v0,v1,t1), lerp(v0,v2,t2), t3). Non-uniform — kept.
    p01 = l0 + u1[:, None] * (l1 - l0)
    p02 = l0 + u2[:, None] * (l2 - l0)
    tri_point = p01 + u3[:, None] * (p02 - p01)
    tri_dir = tri_point - o

    # Sphere: cone sample about the center direction (sphere.go:139-145).
    to_center = l0 - o
    dist2 = vm.squared_length(to_center)
    bu, bv, bw = onb_mod.build_from_w(to_center)
    local = sampling.random_to_sphere(radius, dist2, u1, u2)
    sph_dir = onb_mod.local(bu, bv, bw, local)

    out = jnp.where(
        (kind == LIGHT_RECT)[:, None], rect_dir,
        jnp.where((kind == LIGHT_TRIANGLE)[:, None], tri_dir,
                  jnp.where((kind == LIGHT_SPHERE)[:, None], sph_dir,
                            jnp.array([1.0, 0.0, 0.0], dtype=o.dtype))),
    )
    return out
