"""How expensive is the per-round sort really, and which form is cheapest?
262k elements, 30-bit int32 keys (the rebin sort shape)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18
ITERS = 20
rs = np.random.RandomState(0)
keys0 = jnp.asarray(rs.randint(0, 1 << 30, N), jnp.int32)
o = jnp.asarray(rs.randn(N, 3), jnp.float32)


def run(name, body):
    f = jax.jit(lambda k, o: jax.lax.fori_loop(
        0, ITERS, lambda i, st: body(st), (k, o)))
    out = jax.block_until_ready(f(keys0, o))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(keys0, o))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)


def perturb(k):
    return (k * 1103515245 + 12345) & ((1 << 30) - 1)


def v_argsort_gather(st):
    k, o = st
    order = jnp.argsort(k)
    o2 = o[order]
    return perturb(k + order % 3), o2


def v_argsort_only(st):
    k, o = st
    order = jnp.argsort(k)
    return perturb(k + order % 3), o + order[:, None] * 1e-9


def v_sort_cosort(st):
    """one lax.sort carrying key + payload columns together."""
    k, o = st
    ks, o0, o1, o2, idx = jax.lax.sort(
        (k, o[:, 0], o[:, 1], o[:, 2], jnp.arange(N, dtype=jnp.int32)),
        num_keys=1)
    o2_ = jnp.stack([o0, o1, o2], axis=-1)
    return perturb(ks + idx % 3), o2_


def v_sort_key_only(st):
    k, o = st
    ks = jax.lax.sort((k,), num_keys=1)[0]
    return perturb(ks), o + ks[:1, None] * 1e-9


def v_top1(st):
    k, o = st
    return perturb(k + jnp.max(k) % 3), o


run("argsort + separate payload gather", v_argsort_gather)
run("argsort only", v_argsort_only)
run("lax.sort co-sort key+3payload+idx", v_sort_cosort)
run("lax.sort key only", v_sort_key_only)
run("baseline (max reduce)", v_top1)
