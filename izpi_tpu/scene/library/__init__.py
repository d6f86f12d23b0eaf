"""Built-in scene registry (the analog of internal/scenes).

Sources:
- hand-written constructors matching the imperative Go builders
  (cornell, shirley, misc);
- `extracted`: data-exact .pbtxt conversions of every proto-literal scene
  in internal/scenes (see scripts/extract_go_scenes.py).
"""

from izpi_tpu.scene.library import (cornell, cornell_spectral, extracted,
                                    misc, shirley)  # noqa: F401

# name -> fn(aspect) -> Scene
REGISTRY = {
    "cornell_box": cornell.cornell_box,
    "cornell_box_spectral_simple": cornell_spectral.cornell_box_spectral,
    "cornell_box_pyramid_spectral": (
        lambda aspect=1.0: cornell_spectral.cornell_box_spectral(
            aspect, with_prism=True)),
    "random_scene": shirley.random_scene,
    "two_spheres": shirley.two_spheres,
    "two_perlin_spheres": shirley.two_perlin_spheres,
    "simple_light": shirley.simple_light,
    "final": shirley.final,
    "texture_mapped_sphere": misc.texture_mapped_sphere,
    "environment": misc.environment,
    "pbr_ibl": misc.pbr_ibl,
    "cornell_box_obj": misc.cornell_box_obj,
    "displacement_test": misc.displacement_test,
}
REGISTRY.update(extracted.CONSTRUCTORS)


def get_scene(name: str, aspect: float = 1.0):
    if name not in REGISTRY:
        raise KeyError(
            f"unknown scene {name!r}; available: {sorted(REGISTRY)}")
    return REGISTRY[name](aspect)
