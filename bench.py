"""Benchmark: Cornell box (BASELINE config #1) on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the driver's aggregate target of 1 Grays/s on
a v5e-8 (BASELINE.md), i.e. 125 Mrays/s per chip — the reference publishes no
throughput numbers and no Go toolchain exists in this image to measure its
binary (BASELINE.md: "the Go binary itself is the measurement baseline").
"""

from __future__ import annotations

import json
import sys
import time

PER_CHIP_TARGET_MRAYS = 125.0


def main():
    from izpi_tpu.integrator import path as path_mod
    from izpi_tpu.render import renderer
    from izpi_tpu.scene.library.cornell import cornell_box

    nx = ny = 256
    spp = 64
    settings = path_mod.RenderSettings(max_depth=50)
    scene = cornell_box(aspect=nx / ny)
    ctx = renderer.RenderContext(scene)

    # Warmup with the exact timed configuration (spp is a static arg of the
    # jitted pool — a different spp would recompile inside the timed run).
    renderer.render(None, nx, ny, spp, settings=settings, seed=0, context=ctx)
    res = renderer.render(None, nx, ny, spp, settings=settings, seed=0,
                          context=ctx)

    value = res.mrays_per_sec
    print(json.dumps({
        "metric": "cornell_256x256_64spp_mrays_per_sec",
        "value": round(value, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(value / PER_CHIP_TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
