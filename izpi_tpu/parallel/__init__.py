from izpi_tpu.parallel import dist  # noqa: F401
