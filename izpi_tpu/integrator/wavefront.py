"""Persistent-pool wavefront scheduler (RGB and spectral).

The bounce kernels live in izpi_tpu.integrator.path (shared with the
lockstep oracle and the differentiable scan). This module only schedules:
a fixed pool of N path slots; each iteration advances every live path one
bounce, scatters the radiance of finished paths into the per-pixel
accumulator, and refills freed slots with fresh camera samples from a global
queue — the TPU answer to izpi's work-stealing goroutine pool
(render/renderer.go:112-147), with the tile channel replaced by an on-device
sample counter. Lane occupancy stays ~100% until the tail.

Spectral mode follows render/spectral.go:71-106: λ importance-sampled by
CIE-Y per sample, scalar radiance transport, XYZ deposit
radiance·(x̄,ȳ,z̄)(λ)/pdf(λ). Deposits ARE DeNAN'd — a deliberate deviation:
the reference's spectral path lacks the RGB path's per-sample DeNAN and
NaNs its canvas on degenerate pdfs (see path.bounce_spectral).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from izpi_tpu import camera as camera_mod
from izpi_tpu.core import rng
from izpi_tpu.core import vecmath as vm
from izpi_tpu.core.loops import chunked_while, guarded_fori
from izpi_tpu.integrator import path as path_mod
from izpi_tpu.spectral import cie

LAMBDA_SALT = 0x7A3B
# Iteration-bound ceiling for the all-static guarded fori scheduler: below
# this the whole pool loop compiles to a fixed trip count with ZERO dynamic
# while syncs (~60 ms each on this backend).
# ceil(total·max_depth/pool)+max_depth bounds the true count (every non-tail
# iteration runs all slots; the tail is ≤ max_depth deep). The bound is
# pessimistic by the avg-depth/max-depth ratio, and each skipped 8-iteration
# guard chunk still costs one lax.cond state copy (core.loops), so past this
# ceiling an adaptive chunked while wins.
MAX_STATIC_ITERS = 256


def trace_pool(cs, meta, settings, intersect, nx: int, ny: int, spp: int,
               base_key, pool_size: int, spectral: bool = False,
               bg_spd_id: int = 0, sample_offset: int = 0):
    """Render nx×ny@spp with a persistent path pool.

    Returns (acc (nx*ny, 3) summed radiance — RGB, or CIE XYZ in spectral
    mode; divide by spp for the image — and the total ray count). Samples
    are keyed (pixel, sample+sample_offset) exactly like the lockstep
    renderer, so the estimate matches it up to fp accumulation order;
    sample_offset lets callers render in resumable chunks (checkpointing).
    """
    n_pix = nx * ny
    total = n_pix * spp
    n = pool_size

    def sample_to_ray(sample_ids, issued):
        sid = jnp.where(issued, sample_ids, 0)
        pix = sid % n_pix
        samp = sid // n_pix + sample_offset
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

    # Carry inits derived from the ray arrays so every carry has the
    # varying-manual-axes type under shard_map (sample_offset is
    # device-varying in the distributed pool; a plain-constant carry would
    # fail the while_loop carry type check — see primitives.intersect_brute).
    zf = t0 * 0.0          # (n,) varying zero
    zs = jnp.sum(zf)       # ()  varying zero
    rad0 = zf if spectral else zf[:, None] + jnp.zeros(3, jnp.float32)
    thru0 = rad0 + 1.0
    state0 = dict(
        o=o0, d=d0, time=t0, keys=keys0,
        pix=pix0 + zf.astype(jnp.int32), lam=lam0, lam_pdf=lpdf0,
        depth=zf.astype(jnp.int32),
        thru=thru0, rad=rad0,
        active=issued0 & (zf == 0.0),
        next_sample=jnp.int32(min(n, total)) + zs.astype(jnp.int32),
        acc=jnp.zeros((n_pix, 3), jnp.float32) + zs,
        nrays=zs.astype(jnp.int32),
    )

    def cond(st):
        return jnp.any(st["active"])

    def body(st):
        if spectral:
            o, d, thru, rad, active, nrays, bg_val = path_mod.bounce_spectral(
                cs, meta, settings, intersect,
                st["o"], st["d"], st["time"], st["lam"], st["keys"],
                st["depth"], st["thru"], st["rad"], st["active"], bg_spd_id,
            )
        else:
            o, d, thru, rad, active, nrays = path_mod.bounce_rgb(
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
            x, y, z = cie.get_cie_values(st["lam"])
            xyz = jnp.stack([x, y, z], axis=-1)
            # pdf(λ)=0 only when u drew exactly 0 and landed on CIE_Y[0]=0
            # — a measure-zero event the reference divides into Inf
            # (render/spectral.go:95); zeroing it keeps the estimator
            # unbiased and the canvas finite for firefly rejection. The
            # final de_nan mirrors the RGB path's per-sample DeNAN
            # (render/rgb.go:36) which the reference's spectral path lacks
            # — its canvas NaNs on the quirks documented in
            # path.bounce_spectral; ours must not.
            w = jnp.where(st["lam_pdf"] > 0.0, rad / st["lam_pdf"], 0.0)
            contrib = vm.de_nan(xyz * w[:, None])
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
        return dict(
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

    # The body is a fixpoint once every slot is inactive (all updates are
    # masked), so over-running iterations after the queue drains is
    # harmless — and with chunk-granular lax.cond guards, cheap. When the
    # static iteration bound is tolerable, the whole loop is a fixed-trip
    # fori with zero dynamic-predicate syncs (~60 ms each on this backend,
    # the dominant cost of short renders); otherwise a guarded chunked
    # while with the chunk sized so typical renders (avg depth ≈ 2×
    # generations heuristic) finish in ONE outer while iteration.
    bound = -(-total * settings.max_depth // n) + settings.max_depth
    if bound <= MAX_STATIC_ITERS:
        final = guarded_fori(bound, cond, body, state0)
    else:
        generations = -(-total // n)
        chunk = max(16, min(256, 2 * generations, bound))
        final = chunked_while(cond, body, state0, chunk=chunk, guard=True)
    return final["acc"], final["nrays"]
