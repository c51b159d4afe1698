"""Nanite cluster-LOD: C++ builder invariants + runtime DAG-cut selection
(reference: asset/nanite_builder.cpp GMSS + nanite_shared.hlsli cut rule)."""

import numpy as np
import pytest

from chord_tpu.asset.procedural import make_uv_sphere
from chord_tpu.native import available, nanite_build
from chord_tpu.renderer.deferred import RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              MeshletRenderer)
from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
from chord_tpu.rhi.scene_arrays import MaterialData, SceneBuilder
from chord_tpu.utils.camera import Camera

pytestmark = pytest.mark.skipif(not available(),
                                reason="native lib unavailable")


def test_builder_invariants():
    mesh = make_uv_sphere(1.0, rings=32, sectors=48)
    r = nanite_build(mesh.positions, mesh.indices)
    lv = r["lod_level"]
    assert lv.max() >= 2, "sphere should produce several LOD levels"
    # LOD0 covers the original triangles exactly
    assert r["tri_count"][lv == 0].sum() == mesh.num_triangles
    # each level is a reduction of the previous
    for L in range(1, lv.max() + 1):
        assert r["tri_count"][lv == L].sum() < \
            r["tri_count"][lv == L - 1].sum()
    # monotonic DAG errors
    assert (r["parent_error"] >= r["lod_error"] - 1e-6).all()
    assert (r["tri_count"] <= 128).all() and (r["tri_count"] > 0).all()
    # all indices valid
    assert r["indices"].min() >= 0
    assert r["indices"].max() < mesh.num_vertices


def _sphere_scene():
    b = SceneBuilder()
    mid = b.add_mesh(make_uv_sphere(1.0, rings=32, sectors=48))
    mat = b.add_material(MaterialData(base_color=(0.8, 0.3, 0.2, 1.0),
                                      roughness=0.6))
    m = np.eye(4)
    b.add_instance(mid, mat, m)
    return b


@pytest.mark.slow
def test_lod_selection_by_distance():
    """Fly-through: the DAG cut must draw fewer triangles when far and
    cover the ball either way (BASELINE config #3 behavior)."""
    b = _sphere_scene()
    pools = build_meshlet_pools(b, nanite=True)

    def render_at(dist):
        cam = Camera(width=192, height=96)
        cam.position = np.array([0.0, 0.0, dist])
        cam.look_at(np.array([0.0, 0.0, 0.0]))
        r = MeshletRenderer(
            RendererConfig(width=192, height=96, pair_capacity=4096,
                           big_capacity=64, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=512, occlusion=False))
        img, stats = r.render(pools, inst := b.frame_instances(cam),
                              cam.view_uniform(0))
        return np.asarray(img), {k: int(np.asarray(v))
                                 for k, v in stats.items()}

    img_near, near = render_at(2.5)
    img_far, far = render_at(40.0)
    assert near["drawn_tris"] > far["drawn_tris"] * 2, \
        f"near {near['drawn_tris']} vs far {far['drawn_tris']}"
    assert far["drawn_tris"] > 0, "far sphere must still draw"
    # exactly one DAG cut: no overdraw explosion near
    assert near["drawn_tris"] <= pools.meshlet_tri_count.sum()
    assert near["bin_overflow"] == 0 and far["bin_overflow"] == 0
    # the ball is visible in both
    assert img_near.std() > 8
    assert img_far.std() > 1
