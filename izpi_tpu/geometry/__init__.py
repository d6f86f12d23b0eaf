from izpi_tpu.geometry import primitives  # noqa: F401
