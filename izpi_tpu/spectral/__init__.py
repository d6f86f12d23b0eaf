from izpi_tpu.spectral import cie, spd  # noqa: F401
