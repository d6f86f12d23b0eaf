"""More Mosaic gather variants: 2D fancy indexing + axis-0 take_along."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TAB = 4096


def try_variant(name, kernel, tab_shape, S=8, check=None):
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
        ok = ""
        if check is not None:
            want = check(np.asarray(tab), np.asarray(idx))
            ok = "BITOK" if np.allclose(np.asarray(out), want) else "WRONG!"
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(tab, idx)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: OK {dt*1e6:.0f} us {ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


# V4: full 2D fancy indexing tab[r, l]
def k4(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]
    r = idx_ref[:] // 128
    l = idx_ref[:] % 128
    out_ref[:] = t[r, l]
try_variant("tab[r,l] 2D fancy", k4, (N_TAB // 128, 128),
            check=lambda t, i: t[(i // 128) % 32, i % 128])


# V4b: same but r in full range
def k4b(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]
    out_ref[:] = t[idx_ref[:] % N_TAB // 128 + 0, idx_ref[:] % 128]
try_variant("tab[r,l] big table", k4b, (N_TAB, 128))


# V5: take_along_axis axis=0 (row gather per lane)
def k5(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]
    out_ref[:] = jnp.take_along_axis(t, idx_ref[:] % t.shape[0], axis=0)
try_variant("take_along_axis axis=0", k5, (N_TAB, 128),
            check=lambda t, i: np.take_along_axis(
                t, i % t.shape[0], axis=0))


# V6: both steps: lane permute then row within-lane gather
def k6(tab_ref, idx_ref, out_ref):
    t = tab_ref[:]
    r = idx_ref[:] % t.shape[0]
    l = idx_ref[:] % 128
    rows = jnp.take_along_axis(t, r, axis=0)       # (S,128): tab[r[s,j], j]
    out_ref[:] = jnp.take_along_axis(rows, l, axis=1)
try_variant("axis0 then axis1 chained", k6, (N_TAB, 128))
