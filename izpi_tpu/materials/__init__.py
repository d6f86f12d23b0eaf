from izpi_tpu.materials import tables  # noqa: F401
