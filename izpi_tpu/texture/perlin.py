"""Classic gradient Perlin noise + turbulence, batched.

Reference: internal/perlin/perlin.go — permutation tables and random unit-ish
gradient vectors built once per scene (there: package-level rand; here: a
seeded numpy build at compile time), trilinear Hermite interpolation, and
`Turb` as the sum of 7 octaves of |noise|.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PerlinTables(NamedTuple):
    ranvec: jax.Array  # (256, 3) f32 unit vectors
    perm_x: jax.Array  # (256,) int32
    perm_y: jax.Array  # (256,) int32
    perm_z: jax.Array  # (256,) int32


def build_tables(seed: int = 0) -> PerlinTables:
    rng = np.random.RandomState(seed)
    # Reference generates vectors with components in [-1,1) then normalizes
    # (perlin.go perlinGenerate).
    v = 2.0 * rng.rand(256, 3) - 1.0
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    perms = []
    for _ in range(3):
        p = np.arange(256)
        rng.shuffle(p)
        perms.append(p.astype(np.int32))
    return PerlinTables(
        ranvec=jnp.asarray(v, jnp.float32),
        perm_x=jnp.asarray(perms[0]),
        perm_y=jnp.asarray(perms[1]),
        perm_z=jnp.asarray(perms[2]),
    )


def noise(tables: PerlinTables, p):
    """Gradient noise at points p (..., 3) -> (...,) in [-1, 1]."""
    u = p[..., 0] - jnp.floor(p[..., 0])
    v = p[..., 1] - jnp.floor(p[..., 1])
    w = p[..., 2] - jnp.floor(p[..., 2])
    i = jnp.floor(p[..., 0]).astype(jnp.int32)
    j = jnp.floor(p[..., 1]).astype(jnp.int32)
    k = jnp.floor(p[..., 2]).astype(jnp.int32)

    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)

    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                idx = (
                    tables.perm_x[(i + di) & 255]
                    ^ tables.perm_y[(j + dj) & 255]
                    ^ tables.perm_z[(k + dk) & 255]
                )
                g = tables.ranvec[idx]
                weight = jnp.stack([u - di, v - dj, w - dk], axis=-1)
                dot = jnp.sum(g * weight, axis=-1)
                acc = acc + (
                    (di * uu + (1 - di) * (1.0 - uu))
                    * (dj * vv + (1 - dj) * (1.0 - vv))
                    * (dk * ww + (1 - dk) * (1.0 - ww))
                    * dot
                )
    return acc


def turb(tables: PerlinTables, p, depth: int = 7):
    """Turbulence: |Σ 0.5^i · noise(2^i p)| — the abs is applied to the SUM,
    matching the reference (perlin.go:50-64)."""
    acc = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        acc = acc + weight * noise(tables, q)
        weight *= 0.5
        q = q * 2.0
    return jnp.abs(acc)
