"""Batched 3-vector math over (..., 3) arrays.

The analog of the reference's internal/vec3/vec3.go + internal/mat3, but SoA:
every function maps over arbitrary leading batch dims. Pure jnp — XLA fuses
these into surrounding kernels; there is nothing to hand-schedule here.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def dot(a, b):
    """Batched dot product. Reference: vec3.Dot (vec3.go:113)."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    """Batched cross product. Reference: vec3.Cross (vec3.go:118)."""
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(squared_length(v))


def squared_length(v):
    return jnp.sum(v * v, axis=-1)


def normalize(v):
    """UnitVector. Division by the length like the reference (vec3.go:131);
    no epsilon guard — NaN propagation is handled by de_nan at the sample
    level exactly as the reference does."""
    return v / length(v)[..., None]


def safe_normalize(v):
    return v / jnp.maximum(length(v), EPS)[..., None]


def de_nan(v):
    """Replace NaN/±Inf components with 0. Reference: vec3.DeNAN (vec3.go:141)."""
    return jnp.where(jnp.isfinite(v), v, 0.0)


def lerp(v0, v1, t):
    """Reference: vec3.Lerp (vec3.go:252)."""
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(v0) - 1 else t
    return (1.0 - t) * v0 + t * v1


def reflect(v, n):
    """Mirror reflection. Reference: material.reflect (material/material.go:20)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(v, n, ni_over_nt):
    """Snell refraction with total-internal-reflection flag.

    Reference: material.refract (material/material.go:25). Returns
    (refracted_dir, ok_mask); refracted_dir is garbage where ok is False.
    """
    uv = normalize(v)
    dt = dot(uv, n)
    discriminant = 1.0 - ni_over_nt * ni_over_nt * (1.0 - dt * dt)
    ok = discriminant > 0
    safe_disc = jnp.maximum(discriminant, 0.0)
    refracted = (
        ni_over_nt[..., None] * (uv - n * dt[..., None])
        - n * jnp.sqrt(safe_disc)[..., None]
    )
    return refracted, ok


def schlick(cosine, ref_idx):
    """Schlick Fresnel approximation. Reference: material.schlick
    (material/material.go:39)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(1.0 - cosine, 5.0)


def where(mask, a, b):
    """Select vectors by a (...,)-shaped mask."""
    return jnp.where(mask[..., None], a, b)
