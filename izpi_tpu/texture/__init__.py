from izpi_tpu.texture import tables, perlin  # noqa: F401
