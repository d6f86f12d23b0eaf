from izpi_tpu.scene import types, compiler  # noqa: F401
