"""Headless scene editor (apps/editor.py — the flower editor's editing
duties as a CLI: outliner, detail panel, content browser, viewport;
reference: application/flower widgets)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apps.editor import Editor  # noqa: E402


def _ed():
    ed = Editor()
    ed.lines = []
    ed.out = ed.lines.append
    return ed


def test_outliner_add_move_reparent_rm():
    ed = _ed()
    for c in ("add root a", "add root b", "add a leaf",
              "move leaf 1 2 3", "reparent leaf b"):
        assert ed.run_line(c)
    leaf = ed.scene.find("leaf")
    assert leaf.parent.name == "b"
    assert leaf.transform.translation == [1.0, 2.0, 3.0]
    ed.run_line("rm a")
    assert ed.scene.find("a") is None
    # errors surface, not raise
    ed.run_line("rm nope")
    assert any("error" in ln for ln in ed.lines)


def test_detail_panel_set_and_inspect():
    ed = _ed()
    ed.run_line("add root n")
    ed.run_line("mesh n builtin.box")
    ed.run_line("set n Mesh.material_key shiny")
    node = ed.scene.find("n")
    from chord_tpu.scene.components import MeshComponent
    assert node.get_component(MeshComponent).material_key == "shiny"
    # short and full component names both resolve
    ed.run_line("set n TransformComponent.scale 2 2 2")
    assert node.transform.scale == [2, 2, 2]
    ed.lines.clear()
    ed.run_line("inspect n")
    joined = "\n".join(ed.lines)
    assert "mesh_key = builtin.box" in joined
    # unknown field surfaces an error
    ed.run_line("set n Mesh.nope 1")
    assert any("error" in ln for ln in ed.lines)


def test_rotate_composes_unit_quaternion():
    ed = _ed()
    ed.run_line("add root n")
    ed.run_line("rotate n y 90")
    ed.run_line("rotate n y 90")
    q = np.asarray(ed.scene.find("n").transform.rotation)
    assert abs(np.linalg.norm(q) - 1.0) < 1e-6
    # two 90-deg y rotations = 180 deg: quat ~ (0, +-1, 0, 0)
    assert abs(abs(q[1]) - 1.0) < 1e-5 and abs(q[3]) < 1e-5


def test_save_load_roundtrip_and_dirty_guard(tmp_path):
    ed = _ed()
    ed.run_line("add root thing")
    ed.run_line("mesh thing builtin.sphere")
    ed.run_line("sky root 0 1 0")
    # dirty guard refuses quit
    assert ed.run_line("quit") is True
    assert any("unsaved" in ln for ln in ed.lines)
    p = tmp_path / "scene.chtp"
    ed.run_line(f"save {p}")
    assert ed.run_line("quit") is False

    ed2 = _ed()
    ed2.run_line(f"load {p}")
    n = ed2.scene.find("thing")
    from chord_tpu.scene.components import MeshComponent, SkyComponent
    assert n.get_component(MeshComponent).mesh_key == "builtin.sphere"
    assert ed2.scene.find("root").get_component(
        SkyComponent).sun_direction == [0.0, 1.0, 0.0]
    ed2.lines.clear()
    ed2.run_line(f"assets {tmp_path}")
    assert any("[scene]" in ln for ln in ed2.lines)


@pytest.mark.slow
def test_viewport_render_writes_png(tmp_path):
    ed = _ed()
    ed.run_line("add root box")
    ed.run_line("mesh box builtin.box")
    out = tmp_path / "view.png"
    ed.run_line(f"render {out} 64 32 3 2.5 4")
    assert out.exists()
    from PIL import Image
    arr = np.asarray(Image.open(out))
    assert arr.shape[:2] == (32, 64)
    # the box is visible: some pixels differ from the background corner
    assert (np.abs(arr[16, 24:40, :3].astype(int) -
                   arr[0, 0, :3].astype(int)).max() > 10)
    # render result becomes the save thumbnail
    ed.run_line(f"save {tmp_path/'s.chtp'}")
    from chord_tpu.asset.serialize import load_meta
    kind, meta = load_meta(tmp_path / "s.chtp")
    assert kind == "scene" and "thumbnail" in meta
