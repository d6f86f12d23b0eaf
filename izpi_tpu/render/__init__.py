from izpi_tpu.render import renderer  # noqa: F401
