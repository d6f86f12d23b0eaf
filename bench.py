"""Benchmark: the five BASELINE config scenes on the current device.

Prints one JSON line per scene, then ONE aggregate line (the driver parses
the LAST line): {"metric", "value", "unit", "vs_baseline"}. The aggregate is
the geometric mean of the five Mrays/s numbers.

vs_baseline is measured against the driver's aggregate target of 1 Grays/s
on a v5e-8 (BASELINE.md), i.e. 125 Mrays/s per chip — the reference publishes
no throughput numbers and no Go toolchain exists in this image to measure its
binary (BASELINE.md: "the Go binary itself is the measurement baseline").

Engines exercised per config:
  cornell          — RGB Pallas megakernel (ops.megakernel)
  spectral_pyramid — spectral Pallas megakernel (ops.megakernel_spectral)
  shirley          — RGB megakernel at the 560-prim unroll budget
  dragon           — wavefront pool + Pallas BVH4 traversal (ops.bvh_kernel)
  pbr_ibl          — wavefront pool (PBR + image textures)
"""

from __future__ import annotations

import json
import math
import sys

PER_CHIP_TARGET_MRAYS = 125.0

# (name, scene constructor name, nx, ny, spp, max_depth, sampler, background)
# spp values are production-scale (the reference default is 1000 spp): a
# single megakernel launch costs one ~0.1 s host↔device round trip through
# the tunneled chip, so sub-second workloads measure dispatch latency, not
# the renderer (Cornell: 175 Mrays/s at 64 spp vs 713 at 1024 spp).
CONFIGS = [
    ("cornell", "cornell_box", 256, 256, 1024, 50, "colour", (0, 0, 0)),
    ("spectral_pyramid", "cornell_box_pyramid_spectral",
     500, 500, 256, 50, "spectral", (0, 0, 0)),
    # the Shirley scene has no emitters; the book's sky gradient is the
    # renderer background flag in izpi (black by default)
    ("shirley", "random_scene", 256, 256, 128, 50, "colour",
     (0.7, 0.8, 1.0)),
    ("dragon", "cornell_box_pbr_stanford_dragon_spectral",
     256, 256, 8, 16, "colour", (0, 0, 0)),
    # 128²@32 traces only ~0.7M rays (avg depth 1.3 under the IBL dome) —
    # pure dispatch latency; production scale makes the number a measurement.
    ("pbr_ibl", "pbr_ibl", 256, 256, 256, 16, "colour", (0, 0, 0)),
]


def run_config(name, scene_name, nx, ny, spp, depth, sampler, background):
    from izpi_tpu.integrator import path as path_mod
    from izpi_tpu.render import renderer
    from izpi_tpu.scene.library import get_scene

    import os
    import statistics

    scene = get_scene(scene_name, aspect=nx / ny)
    settings = path_mod.RenderSettings(max_depth=depth,
                                       background=tuple(background))
    ctx = renderer.RenderContext(scene)
    kwargs = dict(settings=settings, seed=0, context=ctx,
                  sampler_type=sampler)
    renderer.render(None, nx, ny, spp, **kwargs)  # warmup/compile
    # Single-shot numbers through the tunneled chip carry ~±8% spread
    # (docs/PERF.md cornell repeats); IZPI_BENCH_REPEATS>1 reports the
    # median. Default 1 keeps the driver's wall-clock budget.
    reps = max(1, int(os.environ.get("IZPI_BENCH_REPEATS", "1")))
    vals = []
    for _ in range(reps):
        res = renderer.render(None, nx, ny, spp, **kwargs)
        vals.append(res.mrays_per_sec)
    # Surface procedural stand-ins IN the parsed record, not just stderr:
    # a BENCH line for a placeholder scene must say so itself.
    placeholder = bool(ctx.meta.placeholder_assets)
    return statistics.median(vals), placeholder


def main():
    import os
    import time

    only = sys.argv[1:] or None
    # Wall-clock budget: skip remaining configs (noting which) rather than
    # get killed mid-run without the aggregate line.
    budget = float(os.environ.get("IZPI_BENCH_BUDGET_SEC", "3000"))
    t_start = time.time()
    results = {}
    for name, scene_name, nx, ny, spp, depth, sampler, bg in CONFIGS:
        if only and name not in only:
            continue
        if time.time() - t_start > budget:
            print(json.dumps({"metric": f"{name}_mrays_per_sec",
                              "skipped": "bench budget exhausted"}),
                  flush=True)
            continue
        try:
            m, placeholder = run_config(name, scene_name, nx, ny, spp, depth,
                                        sampler, bg)
        except Exception as exc:  # noqa: BLE001 — emit the failure, keep going
            print(json.dumps({"metric": f"{name}_mrays_per_sec",
                              "error": f"{type(exc).__name__}: {exc}"[:200]}),
                  flush=True)
            continue
        results[name] = m
        rec = {
            "metric": f"{name}_mrays_per_sec",
            "value": round(m, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(m / PER_CHIP_TARGET_MRAYS, 4),
        }
        if placeholder:
            rec["placeholder"] = True
        print(json.dumps(rec), flush=True)

    if results:
        geo = math.exp(sum(math.log(max(v, 1e-9)) for v in results.values())
                       / len(results))
        print(json.dumps({
            "metric": f"baseline_{len(results)}_scene_geomean_mrays_per_sec",
            "value": round(geo, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(geo / PER_CHIP_TARGET_MRAYS, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
