"""Built-in scene registry (the analog of internal/scenes)."""

from izpi_tpu.scene.library import cornell, cornell_spectral, shirley  # noqa: F401

# name -> fn(aspect) -> Scene
REGISTRY = {
    "cornell_box": cornell.cornell_box,
    "cornell_box_spectral": cornell_spectral.cornell_box_spectral,
    "cornell_box_pyramid_spectral": (
        lambda aspect=1.0: cornell_spectral.cornell_box_spectral(
            aspect, with_prism=True)),
    "random_scene": shirley.random_scene,
    "two_spheres": shirley.two_spheres,
    "two_perlin_spheres": shirley.two_perlin_spheres,
    "simple_light": shirley.simple_light,
    "final": shirley.final,
}


def get_scene(name: str, aspect: float = 1.0):
    if name not in REGISTRY:
        raise KeyError(
            f"unknown scene {name!r}; available: {sorted(REGISTRY)}")
    return REGISTRY[name](aspect)
