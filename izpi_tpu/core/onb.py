"""Orthonormal basis from a normal, batched.

Reference: internal/onb/onb.go `BuildFromW` (onb.go:38) — the branch
`|w.x| > 0.9 ? (0,1,0) : (1,0,0)` becomes a vectorized select.
"""

from __future__ import annotations

import jax.numpy as jnp

from izpi_tpu.core import vecmath as vm


def build_from_w(n):
    """Return (u, v, w) basis arrays, each shaped like n.

    w = normalize(n); v = normalize(w × a); u = w × v, with
    a = (0,1,0) if |w.x| > 0.9 else (1,0,0)  (onb.go:41-46).
    """
    w = vm.normalize(n)
    a = jnp.where(
        (jnp.abs(w[..., 0]) > 0.9)[..., None],
        jnp.array([0.0, 1.0, 0.0], dtype=w.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=w.dtype),
    )
    v = vm.normalize(vm.cross(w, a))
    u = vm.cross(w, v)
    return u, v, w


def local(u, v, w, a):
    """a.x*u + a.y*v + a.z*w  (onb.go:63)."""
    return (
        a[..., 0:1] * u + a[..., 1:2] * v + a[..., 2:3] * w
    )
