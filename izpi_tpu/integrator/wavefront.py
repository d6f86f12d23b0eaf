"""Persistent-pool wavefront integrator — the fast forward path (RGB and
spectral).

`path.trace` keeps the whole (pixel, sample) batch in lockstep until every
path dies, so late bounces run nearly-empty iterations (Cornell mean depth
≈5, max 50 → ~90% wasted lanes). This module instead keeps a fixed pool of N
path slots: each iteration advances every live path one bounce, scatters the
radiance of finished paths into the per-pixel accumulator, and refills the
freed slots with fresh camera samples from a global queue. Lane occupancy
stays ~100% until the tail — the TPU answer to izpi's work-stealing goroutine
pool (render/renderer.go:112-147), with the tile channel replaced by an
on-device sample counter.

RGB radiometry is identical to path.trace (same per-(pixel,sample) Threefry
streams, same estimator); only the scheduling and fp accumulation order
differ.

The spectral mode is the reference's single-wavelength transport
(internal/sampler/spectral.go + render/spectral.go:71-106): each sample
importance-samples λ by CIE-Y, carries scalar radiance, and deposits
radiance·(x̄,ȳ,z̄)(λ)/pdf(λ) into an XYZ accumulator. Reference quirks kept:
- depth cap and miss both return the background SPD at λ (spectral.go:48-52),
- metals terminate spectral paths with zero contribution (their
  SpectralScatter is the nonSpectral stub, material/non_spectral.go:18-21),
- isotropic's ScatteringPDF()==0 zeroes its indirect term,
- spectral deposits are NOT DeNAN'd (RenderPixelSpectral has no DeNAN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from izpi_tpu import camera as camera_mod
from izpi_tpu.core import rng, sampling
from izpi_tpu.core import vecmath as vm
from izpi_tpu.geometry import primitives as prim
from izpi_tpu.integrator import lights as lights_mod
from izpi_tpu.integrator import path as path_mod
from izpi_tpu.materials import spectral_eval
from izpi_tpu.materials import tables as mt
from izpi_tpu.spectral import cie
from izpi_tpu.texture import tables as tex_tables

LAMBDA_SALT = 0x7A3B


def _gather_mat_spectral(cs, mat_id):
    safe = jnp.maximum(mat_id, 0)
    m = cs.materials
    out = path_mod._gather_mat(cs, mat_id)
    out.update({
        "spec_albedo_id": m.spec_albedo_id[safe],
        "spec_albedo_gauss": m.spec_albedo_gauss[safe],
        "spec_ref_idx_id": m.spec_ref_idx_id[safe],
        "spec_absorb_id": m.spec_absorb_id[safe],
    })
    return out


def _bounce(cs, meta, settings, intersect, o, d, time, keys, depth, thru,
            rad, active):
    """Advance every live RGB path one bounce (per-ray depth)."""
    n = o.shape[0]
    bg = jnp.asarray(settings.background, jnp.float32)

    rec = intersect(o, d, time, path_mod.T_MIN, prim.T_MAX)
    nrays = jnp.sum(active.astype(jnp.int32))

    miss = active & ~rec.hit
    rad = rad + jnp.where(miss[:, None], thru * bg[None, :], 0.0)
    active = active & rec.hit

    mat = path_mod._gather_mat(cs, rec.mat_id)
    kind = mat["kind"]

    emit_rgb = tex_tables.eval_rgb(
        cs.textures, mat["tex_albedo"], rec.u, rec.v, rec.p,
        has_checker=meta.has_checker, has_image=meta.has_image,
        has_noise=meta.has_noise,
    )
    facing = vm.dot(rec.normal, d) < 0.0
    is_light = kind == mt.MAT_DIFFUSE_LIGHT
    emitted = jnp.where((is_light & facing)[:, None], emit_rgb, 0.0)
    rad = rad + jnp.where(active[:, None], thru * emitted, 0.0)
    active = active & ~is_light

    us = rng.bounce_uniforms_perray(keys, depth, 12)

    is_metal = kind == mt.MAT_METAL
    is_diel = kind == mt.MAT_DIELECTRIC

    refl_unit = vm.reflect(vm.normalize(d), rec.normal)
    fuzz_vec = sampling.random_in_unit_sphere(us[:, 0], us[:, 1], us[:, 2])
    d_metal = refl_unit + mat["fuzz"][:, None] * fuzz_vec

    d_diel, is_refl = path_mod._dielectric_scatter(
        d, rec.normal, mat["ref_idx"], us[:, 3]
    )
    diel_att = jnp.ones((n, 3), jnp.float32)
    if meta.has_absorbing_dielectric:
        start = rec.p + 1e-3 * d_diel
        exit_rec = intersect(start, d_diel, time, 0.0, 1000.0)
        path_len = vm.length(exit_rec.p - rec.p)
        path_len = jnp.clip(path_len, 0.1, 100.0)
        path_len = jnp.where(exit_rec.hit, path_len, 10.0)
        absorbed = jnp.exp(-mat["absorption"] * path_len[:, None])
        apply = mat["has_absorption"] & ~is_refl
        diel_att = jnp.where(apply[:, None], absorbed, diel_att)

    choose_light = us[:, 4] < 0.5
    d_light = lights_mod.sample(cs.lights, rec.p, us[:, 5:9])
    d_cos = sampling.cosine_pdf_generate(
        rec.normal, us[:, 9], us[:, 10], settings.exact_book_cosine
    )
    d_diff = jnp.where(choose_light[:, None], d_light, d_cos)
    pdf_val = 0.5 * lights_mod.pdf_value(cs.lights, rec.p, d_diff) + \
        0.5 * sampling.cosine_pdf_value(rec.normal, d_diff)

    cos_out = vm.dot(rec.normal, vm.normalize(d_diff))
    spdf = jnp.where(kind == mt.MAT_LAMBERT,
                     jnp.maximum(cos_out, 0.0) / jnp.pi, 0.0)
    diff_mult = emit_rgb * (spdf / pdf_val)[:, None]

    d_new = jnp.where(is_metal[:, None], d_metal,
                      jnp.where(is_diel[:, None], d_diel, d_diff))
    mult = jnp.where(is_metal[:, None], emit_rgb,
                     jnp.where(is_diel[:, None], diel_att, diff_mult))

    thru = jnp.where(active[:, None], thru * mult, thru)
    o = jnp.where(active[:, None], rec.p, o)
    d = jnp.where(active[:, None], d_new, d)
    return o, d, thru, rad, active, nrays


def _bounce_spectral(cs, meta, settings, intersect, o, d, time, lam, keys,
                     depth, thru, rad, active, bg_spd_id):
    """Advance every live spectral path one bounce. thru/rad are scalar (N,);
    lam is the per-path wavelength in nm (constant along the path — ray
    carries λ, sampler/spectral.go)."""
    from izpi_tpu.spectral import spd as spd_mod

    rec = intersect(o, d, time, path_mod.T_MIN, prim.T_MAX)
    nrays = jnp.sum(active.astype(jnp.int32))

    bg_val = spd_mod.device_spd_value(
        cs.spd_table, jnp.full_like(rec.mat_id, bg_spd_id), lam
    )
    miss = active & ~rec.hit
    rad = rad + jnp.where(miss, thru * bg_val, 0.0)
    active = active & rec.hit

    mat = _gather_mat_spectral(cs, rec.mat_id)
    kind = mat["kind"]

    rgb = tex_tables.eval_rgb(
        cs.textures, mat["tex_albedo"], rec.u, rec.v, rec.p,
        has_checker=meta.has_checker, has_image=meta.has_image,
        has_noise=meta.has_noise,
    )
    luma = spectral_eval.luminance(rgb)
    spec_val = spectral_eval.spectral_value(
        cs.spd_table, mat["spec_albedo_id"], mat["spec_albedo_gauss"],
        lam, luma,
    )

    facing = vm.dot(rec.normal, d) < 0.0
    is_light = kind == mt.MAT_DIFFUSE_LIGHT
    emitted = jnp.where(is_light & facing, spec_val, 0.0)
    rad = rad + jnp.where(active, thru * emitted, 0.0)

    # Terminators: lights don't scatter; metals' SpectralScatter is the
    # nonSpectral stub returning false (non_spectral.go:18-21).
    is_metal = kind == mt.MAT_METAL
    active = active & ~is_light & ~is_metal

    us = rng.bounce_uniforms_perray(keys, depth, 12)

    # Dielectric with η(λ) → dispersion (dielectric.go:186).
    eta = jnp.where(
        mat["spec_ref_idx_id"] >= 0,
        spd_mod.device_spd_value(
            cs.spd_table, jnp.maximum(mat["spec_ref_idx_id"], 0), lam),
        mat["ref_idx"],
    )
    is_diel = kind == mt.MAT_DIELECTRIC
    d_diel, is_refl = path_mod._dielectric_scatter(d, rec.normal, eta, us[:, 3])
    diel_att = jnp.ones_like(thru)
    if meta.has_absorbing_dielectric:
        # Spectral Beer–Lambert (dielectric.go:104-115, 190-199).
        start = rec.p + 1e-3 * d_diel
        exit_rec = intersect(start, d_diel, time, 0.0, 1000.0)
        path_len = vm.length(exit_rec.p - rec.p)
        path_len = jnp.clip(path_len, 0.1, 100.0)
        path_len = jnp.where(exit_rec.hit, path_len, 10.0)
        alpha = spd_mod.device_spd_value(
            cs.spd_table, jnp.maximum(mat["spec_absorb_id"], 0), lam)
        absorbed = jnp.exp(-alpha * path_len)
        apply = (mat["spec_absorb_id"] >= 0) & ~is_refl
        diel_att = jnp.where(apply, absorbed, diel_att)

    choose_light = us[:, 4] < 0.5
    d_light = lights_mod.sample(cs.lights, rec.p, us[:, 5:9])
    d_cos = sampling.cosine_pdf_generate(
        rec.normal, us[:, 9], us[:, 10], settings.exact_book_cosine
    )
    d_diff = jnp.where(choose_light[:, None], d_light, d_cos)
    pdf_val = 0.5 * lights_mod.pdf_value(cs.lights, rec.p, d_diff) + \
        0.5 * sampling.cosine_pdf_value(rec.normal, d_diff)

    cos_out = vm.dot(rec.normal, vm.normalize(d_diff))
    spdf = jnp.where(kind == mt.MAT_LAMBERT,
                     jnp.maximum(cos_out, 0.0) / jnp.pi, 0.0)
    diff_mult = spec_val * spdf / pdf_val

    d_new = jnp.where(is_diel[:, None], d_diel, d_diff)
    mult = jnp.where(is_diel, diel_att, diff_mult)

    thru = jnp.where(active, thru * mult, thru)
    o = jnp.where(active[:, None], rec.p, o)
    d = jnp.where(active[:, None], d_new, d)
    return o, d, thru, rad, active, nrays, bg_val


def trace_pool(cs, meta, settings, intersect, nx: int, ny: int, spp: int,
               base_key, pool_size: int, spectral: bool = False,
               bg_spd_id: int = 0):
    """Render nx×ny@spp with a persistent path pool.

    Returns (acc (nx*ny, 3) summed radiance — RGB, or CIE XYZ in spectral
    mode; divide by spp for the image — and the total ray count).
    """
    n_pix = nx * ny
    total = n_pix * spp
    n = pool_size

    def sample_to_ray(sample_ids, issued):
        sid = jnp.where(issued, sample_ids, 0)
        pix = sid % n_pix
        samp = sid // n_pix
        keys = rng.path_keys_perray(base_key, pix, samp)
        cam_u = rng.bounce_uniforms_perray(
            keys, jnp.zeros_like(pix), 5, salt=0x5EED
        )
        xs = (pix % nx).astype(jnp.float32)
        ys = (pix // nx).astype(jnp.float32)
        s = (xs + cam_u[:, 0]) / nx
        t = (ys + cam_u[:, 1]) / ny
        o, d, tme = camera_mod.get_rays(cs.camera, s, t, cam_u[:, 2:5])
        if spectral:
            u_lam = rng.bounce_uniforms_perray(
                keys, jnp.zeros_like(pix), 1, salt=LAMBDA_SALT)[:, 0]
            lam, lam_pdf = cie.sample_wavelength(u_lam)
        else:
            lam = jnp.zeros_like(s)
            lam_pdf = jnp.ones_like(s)
        return o, d, tme, keys, pix, lam, lam_pdf

    init_ids = jnp.arange(n, dtype=jnp.int32)
    issued0 = init_ids < total
    o0, d0, t0, keys0, pix0, lam0, lpdf0 = sample_to_ray(init_ids, issued0)

    rad0 = jnp.zeros(n, jnp.float32) if spectral else jnp.zeros((n, 3),
                                                                jnp.float32)
    thru0 = jnp.ones(n, jnp.float32) if spectral else jnp.ones((n, 3),
                                                               jnp.float32)
    state0 = dict(
        o=o0, d=d0, time=t0, keys=keys0, pix=pix0, lam=lam0, lam_pdf=lpdf0,
        depth=jnp.zeros(n, jnp.int32),
        thru=thru0, rad=rad0,
        active=issued0,
        next_sample=jnp.int32(min(n, total)),
        acc=jnp.zeros((n_pix, 3), jnp.float32),
        nrays=jnp.int32(0),
    )

    def cond(st):
        return jnp.any(st["active"])

    def body(st):
        if spectral:
            o, d, thru, rad, active, nrays, bg_val = _bounce_spectral(
                cs, meta, settings, intersect,
                st["o"], st["d"], st["time"], st["lam"], st["keys"],
                st["depth"], st["thru"], st["rad"], st["active"], bg_spd_id,
            )
        else:
            o, d, thru, rad, active, nrays = _bounce(
                cs, meta, settings, intersect,
                st["o"], st["d"], st["time"], st["keys"], st["depth"],
                st["thru"], st["rad"], st["active"],
            )
        depth = st["depth"] + 1
        capped = active & (depth >= settings.max_depth)
        if spectral:
            # Depth cap returns the background SPD at λ (spectral.go:48-52).
            rad = rad + jnp.where(capped, thru * bg_val, 0.0)
        else:
            sentinel = jnp.array([0.0, 0.0, 1.0], jnp.float32)
            rad = rad + jnp.where(capped[:, None], thru * sentinel[None, :],
                                  0.0)
        active = active & ~capped

        died = st["active"] & ~active
        if spectral:
            # Deposit radiance·(x̄,ȳ,z̄)(λ)/pdf(λ) — render/spectral.go:94-98.
            x, y, z = cie.get_cie_values(st["lam"])
            xyz = jnp.stack([x, y, z], axis=-1)
            contrib = xyz * (rad / st["lam_pdf"])[:, None]
        else:
            contrib = vm.de_nan(rad)
        acc = st["acc"].at[st["pix"]].add(
            jnp.where(died[:, None], contrib, 0.0)
        )

        free = ~active
        slot_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        new_ids = st["next_sample"] + slot_rank
        issue = free & (new_ids < total)
        o_n, d_n, t_n, k_n, pix_n, lam_n, lpdf_n = sample_to_ray(new_ids,
                                                                 issue)

        sel = issue[:, None]
        sel_r = issue if spectral else sel
        st_new = dict(
            o=jnp.where(sel, o_n, o),
            d=jnp.where(sel, d_n, d),
            time=jnp.where(issue, t_n, st["time"]),
            keys=jnp.where(sel, k_n, st["keys"]),
            pix=jnp.where(issue, pix_n, st["pix"]),
            lam=jnp.where(issue, lam_n, st["lam"]),
            lam_pdf=jnp.where(issue, lpdf_n, st["lam_pdf"]),
            depth=jnp.where(issue, 0, depth),
            thru=jnp.where(sel_r, 1.0, thru),
            rad=jnp.where(sel_r, 0.0, rad),
            active=active | issue,
            next_sample=st["next_sample"] + jnp.sum(issue.astype(jnp.int32)),
            acc=acc,
            nrays=st["nrays"] + nrays,
        )
        return st_new

    # Chunked while: the body is a fixpoint once every slot is inactive
    # (all updates are masked), so over-running up to LOOP_CHUNK-1
    # iterations after the queue drains is harmless. See core.loops.
    from izpi_tpu.core.loops import chunked_while

    final = chunked_while(cond, body, state0, chunk=64)
    return final["acc"], final["nrays"]
