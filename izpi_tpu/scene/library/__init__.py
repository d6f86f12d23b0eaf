from izpi_tpu.scene.library import cornell  # noqa: F401
