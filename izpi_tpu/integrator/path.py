"""Wavefront path tracer — the RGB "colour" integrator.

This is the reference's recursive NEE estimator (internal/sampler/colour.go:33-65)
inverted into a masked lockstep `lax.while_loop` over bounce depth: a ray
batch carries (origin, direction, time, throughput, radiance, active), and
each iteration performs one fused pass: intersect → shade/emit → sample the
0.5/0.5 light/material mixture PDF (pdf/mixture.go) → update throughput.

Estimator identity with the reference (colour.go:44-57):
    L = Σ_k T_k·emitted_k (+ T·background on miss, + T·(0,0,1) at depth cap)
    T_{k+1} = T_k · attenuation · ScatteringPDF / pdfValue   (diffuse)
    T_{k+1} = T_k · attenuation                              (specular)
Division by a zero pdf produces Inf/NaN that the caller's DeNAN zeroes,
exactly like the Go chain (vec3.DeNAN at render/rgb.go:36).

Quirks preserved for converged-image parity:
- depth-cap sentinel {Z:1} (colour.go:34-36),
- book cosine sampling with its 2·sqrt(r2) factor (vec3.go:119),
- one-sided lights keyed on the *record* normal (diffuselight.go:49-63),
- isotropic's ScatteringPDF()==0 (isotropic.go:54) — participating-media
  phase contributes nothing beyond emission in RGB mode, as in Go,
- unnormalized scattered directions (colour.go:50).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import TYPE_CHECKING, Callable, Tuple

import jax
import jax.numpy as jnp

from izpi_tpu.core import rng, sampling
from izpi_tpu.core import vecmath as vm
from izpi_tpu.geometry import primitives as prim
from izpi_tpu.integrator import lights as lights_mod
from izpi_tpu.materials import tables as mt
from izpi_tpu.texture import tables as tex_tables

if TYPE_CHECKING:  # avoid a circular import with scene.compiler
    from izpi_tpu.scene.compiler import CompiledScene, SceneMeta

T_MIN = 1e-3  # world-hit epsilon (colour.go:40)


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static integrator configuration (the renderer-level knobs the
    reference passes into render.New, renderer.go:73)."""

    max_depth: int = 50
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    exact_book_cosine: bool = True


IntersectFn = Callable[..., prim.Hit]


def make_brute_intersector(cs: "CompiledScene") -> IntersectFn:
    def intersect(o, d, time, t_min, t_max):
        return prim.intersect_brute(cs.prims, o, d, time, t_min, t_max)

    return intersect


def _gather_mat(cs, mat_id):
    safe = jnp.maximum(mat_id, 0)
    m = cs.materials
    return {
        "kind": m.kind[safe],
        "tex_albedo": m.tex_albedo[safe],
        "fuzz": m.fuzz[safe],
        "ref_idx": m.ref_idx[safe],
        "absorption": m.absorption[safe],
        "has_absorption": m.has_absorption[safe],
    }


def _dielectric_scatter(o_dir, normal, ref_idx, u_reflect):
    """Schlick-probabilistic reflect/refract (dielectric.go:66-102).
    Works on the RAW (unnormalized) incoming direction like the reference.
    Returns (new_dir, is_reflected)."""
    reflected = vm.reflect(o_dir, normal)
    d_dot_n = vm.dot(o_dir, normal)
    exiting = d_dot_n > 0.0
    outward = jnp.where(exiting[..., None], -normal, normal)
    ni_over_nt = jnp.where(exiting, ref_idx, 1.0 / ref_idx)
    dlen = vm.length(o_dir)
    cosine = jnp.where(
        exiting, ref_idx * d_dot_n / dlen, -d_dot_n / dlen
    )
    refracted, can_refract = vm.refract(o_dir, outward, ni_over_nt)
    reflect_prob = jnp.where(can_refract, vm.schlick(cosine, ref_idx), 1.0)
    is_reflected = u_reflect < reflect_prob
    new_dir = jnp.where(is_reflected[..., None], reflected, refracted)
    return new_dir, is_reflected


def trace(
    cs: "CompiledScene",
    meta: "SceneMeta",
    settings: RenderSettings,
    intersect: IntersectFn,
    o, d, time, keys,
    differentiable: bool = False,
):
    """Trace a ray batch to completion.

    o, d: (N,3); time: (N,); keys: (N,2) per-path RNG keys.
    Returns (color (N,3) — NOT DeNAN'd, caller applies it per the reference's
    render/rgb.go:36 — and rays_traced: () int32 total Sample-call count).

    differentiable=True swaps the early-exit `while_loop` for a fixed-depth
    `lax.scan` with per-bounce rematerialization, making the radiance
    estimate reverse-mode differentiable w.r.t. material/texture/light
    parameters. Sampling decisions (directions, mixture pdf) are detached
    (stop_gradient) — the standard detached-sampling estimator: throughput
    factors carry the gradient, discrete choices and pdfs do not.
    """
    n = o.shape[0]
    bg = jnp.asarray(settings.background, jnp.float32)

    def cond(state):
        depth, *_rest, active, _nrays = state
        return (depth < settings.max_depth) & jnp.any(active)

    def body(state):
        depth, o, d, time, thru, rad, active, nrays = state

        rec = intersect(o, d, time, T_MIN, prim.T_MAX)
        nrays = nrays + jnp.sum(active.astype(jnp.int32))

        # Miss → background (colour.go:63).
        miss = active & ~rec.hit
        rad = rad + jnp.where(miss[:, None], thru * bg[None, :], 0.0)
        active = active & rec.hit

        mat = _gather_mat(cs, rec.mat_id)
        kind = mat["kind"]

        # Emission: one-sided diffuse light (diffuselight.go:49-63).
        emit_rgb = tex_tables.eval_rgb(
            cs.textures, mat["tex_albedo"], rec.u, rec.v, rec.p,
            has_checker=meta.has_checker, has_image=meta.has_image,
            has_noise=meta.has_noise,
        )
        facing = vm.dot(rec.normal, d) < 0.0
        is_light = kind == mt.MAT_DIFFUSE_LIGHT
        emitted = jnp.where((is_light & facing)[:, None], emit_rgb, 0.0)
        rad = rad + jnp.where(active[:, None], thru * emitted, 0.0)

        # Lights don't scatter (diffuselight.go:40) → terminate.
        active = active & ~is_light

        us = rng.bounce_uniforms(keys, depth, 12)

        is_metal = kind == mt.MAT_METAL
        is_diel = kind == mt.MAT_DIELECTRIC
        specular = is_metal | is_diel

        # ---- metal (metal.go:34-40): unit-direction mirror + fuzz ----
        refl_unit = vm.reflect(vm.normalize(d), rec.normal)
        fuzz_vec = sampling.random_in_unit_sphere(us[:, 0], us[:, 1], us[:, 2])
        d_metal = refl_unit + mat["fuzz"][:, None] * fuzz_vec

        # ---- dielectric ----
        d_diel, is_refl = _dielectric_scatter(
            d, rec.normal, mat["ref_idx"], us[:, 3]
        )
        diel_att = jnp.ones((n, 3), jnp.float32)
        if meta.has_absorbing_dielectric:
            # Beer–Lambert with exit re-trace (dielectric.go:118-153):
            # trace from p + 0.001·dir over [0, 1000]; |exit-p| clamped to
            # [0.1, 100]; miss → 10.
            start = rec.p + 1e-3 * d_diel
            exit_rec = intersect(start, d_diel, time, 0.0, 1000.0)
            path_len = vm.length(exit_rec.p - rec.p)
            path_len = jnp.clip(path_len, 0.1, 100.0)
            path_len = jnp.where(exit_rec.hit, path_len, 10.0)
            absorbed = jnp.exp(-mat["absorption"] * path_len[:, None])
            apply = mat["has_absorption"] & ~is_refl
            diel_att = jnp.where(apply[:, None], absorbed, diel_att)

        # ---- diffuse: mixture of light PDF and cosine PDF (colour.go:48-57) --
        choose_light = us[:, 4] < 0.5  # mixture.go:27
        d_light = lights_mod.sample(cs.lights, rec.p, us[:, 5:9])
        d_cos = sampling.cosine_pdf_generate(
            rec.normal, us[:, 9], us[:, 10], settings.exact_book_cosine
        )
        d_diff = jnp.where(choose_light[:, None], d_light, d_cos)
        if differentiable:
            d_diff = jax.lax.stop_gradient(d_diff)
        pdf_val = 0.5 * lights_mod.pdf_value(cs.lights, rec.p, d_diff) + \
            0.5 * sampling.cosine_pdf_value(rec.normal, d_diff)
        if differentiable:
            pdf_val = jax.lax.stop_gradient(pdf_val)

        albedo = emit_rgb  # same texture slot; one evaluation per bounce
        cos_out = vm.dot(rec.normal, vm.normalize(d_diff))
        spdf_lambert = jnp.maximum(cos_out, 0.0) / jnp.pi
        # Isotropic: ScatteringPDF()==0 (isotropic.go:54) — contributes 0.
        spdf = jnp.where(kind == mt.MAT_LAMBERT, spdf_lambert, 0.0)
        ratio = spdf / pdf_val
        if differentiable:
            # Forward mode keeps the reference's NaN/Inf-on-zero-pdf chain
            # (DeNAN'd at the sample level); in the differentiable estimator
            # a single Inf would poison every parameter gradient through the
            # multiply chain, so dead samples are zeroed instead.
            ratio = jnp.where(
                (pdf_val > 0.0) & jnp.isfinite(ratio), ratio, 0.0
            )
        diff_mult = albedo * ratio[:, None]

        # ---- combine ----
        d_new = jnp.where(
            is_metal[:, None], d_metal,
            jnp.where(is_diel[:, None], d_diel, d_diff),
        )
        metal_albedo = albedo  # metal albedo came through its constant texture
        mult = jnp.where(
            is_metal[:, None], metal_albedo,
            jnp.where(is_diel[:, None], diel_att, diff_mult),
        )

        thru = jnp.where(active[:, None], thru * mult, thru)
        o_new = jnp.where(active[:, None], rec.p, o)
        d_out = jnp.where(active[:, None], d_new, d)

        return (depth + 1, o_new, d_out, time, thru, rad, active, nrays)

    # Carry inits derived from ray inputs → correct varying-manual-axes type
    # under shard_map (see primitives.intersect_brute).
    zero3 = o * 0.0
    zero1 = time * 0.0
    state0 = (
        jnp.int32(0), o, d, time,
        zero3 + 1.0,                       # throughput
        zero3,                             # radiance
        ~zero1.astype(bool),               # active = all True
        jnp.sum(zero1).astype(jnp.int32),  # ray counter
    )
    if differentiable:
        # Fixed trip count (masking already handles dead rays); remat each
        # bounce so backward memory is O(1) in depth instead of O(depth).
        def scan_body(state, _):
            return body(state), None

        final, _ = jax.lax.scan(
            jax.checkpoint(scan_body), state0, None,
            length=settings.max_depth,
        )
        depth, o, d, time, thru, rad, active, nrays = final
    else:
        depth, o, d, time, thru, rad, active, nrays = jax.lax.while_loop(
            cond, body, state0
        )
    # Depth cap: the next Sample call would return {Z:1} (colour.go:34-36).
    sentinel = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    rad = rad + jnp.where(active[:, None], thru * sentinel[None, :], 0.0)
    return rad, nrays
