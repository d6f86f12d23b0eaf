from izpi_tpu.accel import bvh_build, traverse  # noqa: F401
