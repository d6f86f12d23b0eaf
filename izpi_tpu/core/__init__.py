from izpi_tpu.core import vecmath, onb, sampling, rng  # noqa: F401
