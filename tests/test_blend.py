"""Translucent (Blend) material bucket (reference: pipeline_filter.hlsl
alphaMode buckets + asset_gltf.h:55-59; the TPU build renders one
depth-peeled forward layer, which the reference's raster loops skip)."""

import numpy as np
import pytest
import jax.numpy as jnp

from chord_tpu.rhi.scene_arrays import MaterialData, MeshData, SceneBuilder
from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
from chord_tpu.renderer.deferred import RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              MeshletRenderer)
from chord_tpu.utils.camera import Camera
from chord_tpu.asset.procedural import make_plane
from chord_tpu.utils import math as cmath


def _scene():
    b = SceneBuilder()
    plane = b.add_mesh(make_plane(1.0, segments=2))
    red = b.add_material(MaterialData(base_color=(0.8, 0.05, 0.05, 1.0)))
    glass = b.add_material(MaterialData(base_color=(0.1, 0.3, 0.9, 0.4),
                                        alpha_mode="blend", two_sided=True))
    # opaque red wall at z=-6 facing camera (+z normal after pitch)
    m = cmath.compose_trs((0, 2, -6.0),
                          rotation_quat=(np.sin(np.pi / 4), 0, 0,
                                         np.cos(np.pi / 4)),
                          scale=(8, 1, 8))
    b.add_instance(plane, red, m)
    # translucent blue pane at z=-3 covering the LEFT half of the view
    m2 = cmath.compose_trs((-2, 2, -3.0),
                           rotation_quat=(np.sin(np.pi / 4), 0, 0,
                                          np.cos(np.pi / 4)),
                           scale=(4, 1, 4))
    b.add_instance(plane, glass, m2)
    return b


def _render(alpha_blend):
    b = _scene()
    pools = build_meshlet_pools(b)
    cam = Camera(width=96, height=64)
    cam.position = np.array([0.0, 2.0, 2.0])
    cam.look_at(np.array([0.0, 2.0, -6.0]))
    inst = b.frame_instances(cam)
    r = MeshletRenderer(
        RendererConfig(width=96, height=64, pair_capacity=2048,
                       big_capacity=64, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=256, occlusion=False,
                           alpha_blend=alpha_blend))
    img, stats = r.render(pools, inst, cam.view_uniform(0))
    return np.asarray(img).astype(np.float32), stats


@pytest.mark.slow
def test_blend_layer_tints_left_half():
    off, _ = _render(False)
    on, stats = _render(True)
    assert int(np.asarray(stats["draws_blend"])) > 0
    # right half (no glass) identical
    np.testing.assert_allclose(on[:, 64:], off[:, 64:], atol=1)
    # left half: glass shifts color toward blue (blue gains vs red)
    left_delta_b = on[20:44, 10:38, 2].mean() - off[20:44, 10:38, 2].mean()
    left_delta_r = on[20:44, 10:38, 0].mean() - off[20:44, 10:38, 0].mean()
    assert left_delta_b > 1.0          # visibly bluer
    assert left_delta_r < left_delta_b


@pytest.mark.slow
def test_blend_objects_excluded_from_opaque_bucket():
    """The glass must not write depth/visibility (it would black out the
    wall behind it in the opaque gbuffer)."""
    on, stats = _render(True)
    # wall visible everywhere through the glass: no black holes
    assert on[20:44, 10:38].mean() > 10.0
