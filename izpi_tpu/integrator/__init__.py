# Submodules import lazily to avoid a compiler↔integrator import cycle:
# scene.compiler uses integrator.lights for the light SoA, while
# integrator.path type-annotates against scene.compiler.
from izpi_tpu.integrator import lights  # noqa: F401
