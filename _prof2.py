import time, jax, jax.numpy as jnp
from functools import partial
from izpi_tpu.integrator import path as path_mod
from izpi_tpu.render import renderer
from izpi_tpu.scene.library.cornell import cornell_box
from izpi_tpu.core import rng
from izpi_tpu.integrator import lights as lights_mod

nx = ny = 256
settings = path_mod.RenderSettings(max_depth=50)
scene = cornell_box(aspect=nx/ny)
cs, meta, intersect = renderer.prepare(scene)
base_key = rng.render_key(0)
n = 1<<16
k = jnp.arange(n, dtype=jnp.int32)
keys = rng.path_keys_perray(base_key, k % (nx*ny), k // (nx*ny))
o = jnp.zeros((n,3)) + jnp.array([278.,278.,-800.])
d = jnp.concatenate([jnp.linspace(-0.3,0.3,n)[:,None], jnp.linspace(-0.2,0.2,n)[:,None], jnp.ones((n,1))], axis=1)
tme = jnp.zeros(n)
depth = jnp.zeros(n, jnp.int32)
thru = jnp.ones((n,3)); rad = jnp.zeros((n,3)); active = jnp.ones(n, bool)

ITERS = 50
def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(ITERS):
        r = f(*args)
    jax.block_until_ready(r)
    dt=(time.perf_counter()-t0)/ITERS
    print(f"{name:24s} {dt*1e3:8.3f} ms  ({dt/n*1e9:6.1f} ns/ray)")

def loop20(body):
    # fold 20 reps inside one jit to remove dispatch overhead
    def f(*args):
        def it(i, c):
            return body(*c)
        return jax.lax.fori_loop(0, 20, lambda i,c: body(*c), args)
    return f

# full bounce
def full_bounce(o,d,tme,keys,depth,thru,rad,active):
    o2,d2,thru2,rad2,act2,nr = path_mod.bounce_rgb(cs,meta,settings,intersect,o,d,tme,keys,depth,thru,rad,active)
    return o2,d2,tme,keys,depth,thru2,rad2,act2
bench("bounce_rgb x20/20", lambda *a: loop20(full_bounce)(*a), o,d,tme,keys,depth,thru,rad,active)

# intersect only
def only_int(o,d,tme,keys,depth,thru,rad,active):
    rec = intersect(o,d,tme,1e-3, 1e30)
    return rec.p, d+rec.normal, tme, keys, depth, thru, rad+rec.t[:,None]*1e-9, active
bench("intersect x20/20", lambda *a: loop20(only_int)(*a), o,d,tme,keys,depth,thru,rad,active)

# rng only
def only_rng(o,d,tme,keys,depth,thru,rad,active):
    us = rng.bounce_uniforms_perray(keys, depth, 12)
    return o+us[:,0:3]*1e-9, d, tme, keys, depth+1, thru, rad, active
bench("rng12 x20/20", lambda *a: loop20(only_rng)(*a), o,d,tme,keys,depth,thru,rad,active)

# lights sample+pdf
def only_lights(o,d,tme,keys,depth,thru,rad,active):
    us = rng.bounce_uniforms_perray(keys, depth, 12)
    dl = lights_mod.sample(cs.lights, o, us[:,5:9])
    pv = lights_mod.pdf_value(cs.lights, o, dl)
    return o, dl, tme, keys, depth, thru, rad+pv[:,None]*1e-9, active
bench("lights x20/20", lambda *a: loop20(only_lights)(*a), o,d,tme,keys,depth,thru,rad,active)

# scatter-add
acc0 = jnp.zeros((nx*ny,3))
pix = k % (nx*ny)
def only_scatter(acc, thru, rad, active):
    acc = acc.at[pix].add(jnp.where(active[:,None], rad+1e-9, 0.0))
    return (acc, thru, rad*0.999, active)
bench("scatter x20/20", lambda acc,t,r,a: jax.lax.fori_loop(0,20,lambda i,c: only_scatter(*c),(acc,t,r,a)), acc0, thru, rad, active)

# cumsum compaction
def only_cumsum(o,d,tme,keys,depth,thru,rad,active):
    free = ~active
    sr = jnp.cumsum(free.astype(jnp.int32)) - 1
    return o+sr[:,None]*1e-12, d, tme, keys, depth, thru, rad, active
bench("cumsum x20/20", lambda *a: loop20(only_cumsum)(*a), o,d,tme,keys,depth,thru,rad,active)
