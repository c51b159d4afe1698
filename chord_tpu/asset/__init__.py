from .gltf import load_gltf, GLTFScene  # noqa: F401
from .procedural import (  # noqa: F401
    make_box, make_plane, make_uv_sphere, make_cylinder,
    build_sponza_like, build_bistro_like,
)
