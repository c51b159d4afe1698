"""Typed AssetManager: lazy payloads, dirty tracking, kind registry
(reference: source/asset/asset.h:27 IAsset / :141 AssetManager)."""

import numpy as np
import pytest

from chord_tpu.asset.manager import (Asset, AssetManager, SceneAsset,
                                     register_kind)
from chord_tpu.asset.serialize import save_asset


def _write_raw(path, kind="raw", payload=None, meta=None):
    save_asset(path, kind, payload if payload is not None
               else {"x": np.arange(6, dtype=np.float32)}, meta=meta)


def test_meta_loads_without_payload(tmp_path):
    p = tmp_path / "a.chtp"
    _write_raw(p, meta={"name": "wall", "tag": 7})
    mgr = AssetManager()
    a = mgr.get(p)
    assert a.meta["tag"] == 7
    assert a.name == "wall"
    assert not a.loaded          # payload untouched
    assert not a.dirty


def test_payload_lazy_load_and_cache(tmp_path):
    p = tmp_path / "a.chtp"
    _write_raw(p)
    mgr = AssetManager()
    a = mgr.get(p)
    np.testing.assert_array_equal(a.payload["x"],
                                  np.arange(6, dtype=np.float32))
    assert a.loaded
    assert mgr.get(p) is a       # same instance, path-keyed


def test_dirty_tracking_and_save_dirty(tmp_path):
    p = tmp_path / "a.chtp"
    _write_raw(p)
    mgr = AssetManager()
    a = mgr.get(p)
    a.set_payload({"x": np.ones(3, np.float32)})
    mgr.mark_dirty(a)
    assert mgr.dirty_assets() == [a]
    assert mgr.save_dirty() == 1
    assert not a.dirty
    # round-trip: a fresh manager sees the new payload
    b = AssetManager().get(p)
    np.testing.assert_array_equal(b.payload["x"], np.ones(3, np.float32))


def test_unload_clean_keeps_dirty(tmp_path):
    p = tmp_path / "a.chtp"
    _write_raw(p)
    mgr = AssetManager()
    a = mgr.get(p)
    _ = a.payload
    mgr.unload_clean_payloads()
    assert not a.loaded          # clean payload dropped
    a.set_payload({"x": np.zeros(1, np.float32)})
    mgr.unload_clean_payloads()
    assert a.loaded              # dirty payload survives


def test_kind_registry_dispatch(tmp_path):
    @register_kind("blob7")
    class Blob7(Asset):
        def decode(self, payload):
            return payload["x"] * 7

    p = tmp_path / "b.chtp"
    _write_raw(p, kind="blob7", payload={"x": np.ones(2, np.float32)})
    a = AssetManager().get(p)
    assert isinstance(a, Blob7)
    np.testing.assert_array_equal(a.payload, np.full(2, 7, np.float32))


def test_kind_mismatch_rejected(tmp_path):
    p = tmp_path / "a.chtp"
    _write_raw(p, kind="raw")
    a = AssetManager().get(p)
    a.kind = "scene"             # force a wrong expectation
    with pytest.raises(AssertionError):
        _ = a.payload


def test_scene_asset_roundtrip(tmp_path):
    from chord_tpu.scene.scene import Scene, SceneNode

    s = Scene("lobby")
    s.root.add_child(SceneNode("crate"))
    p = tmp_path / "lobby.chtp"
    s.save(p)
    mgr = AssetManager()
    a = mgr.get(p)
    assert isinstance(a, SceneAsset)
    s2 = a.to_scene()
    assert s2.name == "lobby"
    assert s2.root.children[0].name == "crate"


def test_scan_and_on_changed(tmp_path):
    for n in ("a", "b"):
        _write_raw(tmp_path / f"{n}.chtp")
    mgr = AssetManager()
    found = list(mgr.scan(tmp_path))
    assert len(found) == 2
    events = []
    mgr.on_changed.add(events.append)
    mgr.mark_dirty(found[0])
    assert events == [found[0]]


def test_insert_new_asset(tmp_path):
    mgr = AssetManager()
    a = Asset(payload={"x": np.arange(3, dtype=np.int32)})
    mgr.insert(a, tmp_path / "new.chtp")
    assert a.dirty
    assert mgr.save_dirty() == 1
    b = AssetManager().get(tmp_path / "new.chtp")
    np.testing.assert_array_equal(b.payload["x"],
                                  np.arange(3, dtype=np.int32))
