"""Render checkpoint/resume.

The reference has no checkpointing — a crashed render restarts from zero
(SURVEY.md §5). Here the whole render state is the per-pixel accumulator
plus the completed-sample count, so checkpointing is one npz per interval;
resume validates a config fingerprint and continues at the next sample (the
per-(pixel, sample) RNG keying makes the result identical to an
uninterrupted render up to fp accumulation order).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Optional, Tuple

import numpy as np


def config_fingerprint(nx: int, ny: int, spp: int, seed: int,
                       meta, settings) -> str:
    payload = repr((nx, ny, spp, seed, meta.n_prims, meta.n_materials,
                    meta.n_lights, meta.spectral, settings)).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def save(path: str, acc: np.ndarray, samples_done: int, rays: int,
         fingerprint: str) -> None:
    tmp = path + ".tmp.npz"
    np.savez(tmp, acc=acc, samples_done=samples_done, rays=rays,
             fingerprint=np.frombuffer(fingerprint.encode(), np.uint8))
    os.replace(tmp, path)


def load(path: str, fingerprint: str
         ) -> Optional[Tuple[np.ndarray, int, int]]:
    """Returns (acc, samples_done, rays) or None if absent/mismatched."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        fp = z["fingerprint"].tobytes().decode()
        if fp != fingerprint:
            return None
        return z["acc"].copy(), int(z["samples_done"]), int(z["rays"])
