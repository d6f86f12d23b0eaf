"""Checkpoint/resume tests (capability beyond the reference)."""

import numpy as np

from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.cornell import cornell_box


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    s = path_mod.RenderSettings(max_depth=4)
    ckpt = str(tmp_path / "r.ckpt")
    full = renderer.render(cornell_box(), 12, 12, 8, settings=s, seed=7)
    # Chunked with checkpointing...
    a = renderer.render(cornell_box(), 12, 12, 8, settings=s, seed=7,
                        checkpoint_path=ckpt, checkpoint_interval=3)
    np.testing.assert_allclose(full.image, a.image, atol=2e-5)
    assert full.rays_traced == a.rays_traced
    # ...and resume from a partial checkpoint: rewrite one with fewer samples
    from izpi_tpu.render import checkpoint as ck
    from izpi_tpu.scene.compiler import compile_scene

    cs, meta = compile_scene(cornell_box())
    fp = ck.config_fingerprint(12, 12, 8, 7, meta, s)
    partial = ck.load(ckpt, fp)
    assert partial is not None
    acc, done, rays = partial
    assert done == 8
    # Corrupt fingerprint → treated as absent.
    assert ck.load(ckpt, "deadbeef") is None


def test_resume_continues_from_partial(tmp_path):
    s = path_mod.RenderSettings(max_depth=4)
    ckpt = str(tmp_path / "p.ckpt")
    # Render only the first 4 samples by "interrupting": run spp=4 with
    # interval 2 writing into the checkpoint, then rerun at spp=8 with the
    # matching fingerprint... fingerprints include spp, so emulate a crash
    # by rendering spp=8 / interval 2 and truncating the checkpoint to the
    # 4-sample state.
    from izpi_tpu.render import checkpoint as ck
    from izpi_tpu.scene.compiler import compile_scene

    full = renderer.render(cornell_box(), 12, 12, 8, settings=s, seed=9,
                           checkpoint_path=ckpt, checkpoint_interval=2)
    cs, meta = compile_scene(cornell_box())
    fp = ck.config_fingerprint(12, 12, 8, 9, meta, s)

    # Simulate crash at sample 4: halve the state (requires replay) — here
    # simply re-render with interval 4 and capture the midpoint checkpoint.
    ckpt2 = str(tmp_path / "q.ckpt")
    import izpi_tpu.render.checkpoint as ckpt_mod
    orig_save = ckpt_mod.save
    states = {}

    def spy_save(path, acc, done, rays, f):
        states[done] = (acc.copy(), done, rays)
        orig_save(path, acc, done, rays, f)

    ckpt_mod.save = spy_save
    try:
        renderer.render(cornell_box(), 12, 12, 8, settings=s, seed=9,
                        checkpoint_path=ckpt2, checkpoint_interval=4)
    finally:
        ckpt_mod.save = orig_save
    acc4, done4, rays4 = states[4]
    ck.save(ckpt2, acc4, 4, rays4, fp)

    resumed = renderer.render(cornell_box(), 12, 12, 8, settings=s, seed=9,
                              checkpoint_path=ckpt2, checkpoint_interval=4)
    np.testing.assert_allclose(resumed.image, full.image, atol=2e-5)
