from izpi_tpu.io import output, postprocess  # noqa: F401
