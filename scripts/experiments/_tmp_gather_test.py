"""Does Mosaic lower per-lane dynamic gathers from VMEM? Try variants."""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TAB = 4096  # table rows
S = 8


def try_variant(name, kernel, tab_shape):
    try:
        tab = jnp.asarray(np.random.RandomState(0).rand(*tab_shape),
                          jnp.float32)
        idx = jnp.asarray(
            np.random.RandomState(1).randint(0, N_TAB, (S, 128)), jnp.int32)
        call = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        )
        f = jax.jit(lambda t, i: call(t, i))
        out = jax.block_until_ready(f(tab, idx))
        # verify + time
        want = np.asarray(tab).reshape(-1)[np.asarray(idx).reshape(-1)] \
            if tab_shape == (N_TAB * 128 // 128, 128) else None
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(tab, idx)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: OK {dt*1e6:.0f} us  sample={np.asarray(out)[0, :3]}",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


# V1: jnp.take on a loaded flat array (flattened (N_TAB*128,) as (R,128))
def k1(tab_ref, idx_ref, out_ref):
    flat = tab_ref[:].reshape(-1)
    out_ref[:] = jnp.take(flat, idx_ref[:], axis=0)
try_variant("take(flat VMEM value)", k1, (N_TAB, 128))


# V2: fancy indexing on loaded 1-lane column
def k2(tab_ref, idx_ref, out_ref):
    col = tab_ref[:, 0]
    out_ref[:] = col[idx_ref[:]]
try_variant("col[idx] (sublane gather)", k2, (N_TAB, 128))


# V3: take_along_axis within lanes: table (S,128), idx in 0..127 per lane
def k3(tab_ref, idx_ref, out_ref):
    t = tab_ref[0:S, :]
    out_ref[:] = jnp.take_along_axis(t, idx_ref[:] % 128, axis=1)
try_variant("take_along_axis lane", k3, (N_TAB, 128))
