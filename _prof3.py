import jax, jax.numpy as jnp, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0

@jax.jit
def f(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.arange(1024*128, dtype=jnp.float32).reshape(1024, 128)
y = f(x)
print("pallas ok:", jnp.allclose(y, x*2+1), jax.devices())
