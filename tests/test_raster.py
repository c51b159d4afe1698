"""Rasterizer vs NumPy oracle (SURVEY §4: unit tests for Pallas kernels
(cull/compaction/raster) vs NumPy oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chord_tpu.ops.raster import (RasterConfig, rasterize, rasterize_oracle,
                                  setup_triangles, bin_windows)

W, H = 128, 32
CFG = RasterConfig(width=W, height=H, tile_h=8, tile_w=128,
                   pair_capacity=512, big_capacity=32, interpret=True)


def make_random_tris(n, rng, depth_range=(0.1, 0.9), size=0.4, center_range=1.1):
    """Random small CCW-facing triangles in clip space (w=1 → no perspective)."""
    clip = np.zeros((n * 3, 4), np.float32)
    centers = rng.uniform(-center_range, center_range, (n, 2))
    for t in range(n):
        pts = centers[t] + rng.uniform(-size, size, (3, 2))
        a2 = (pts[1, 0] - pts[0, 0]) * (pts[2, 1] - pts[0, 1]) - \
             (pts[1, 1] - pts[0, 1]) * (pts[2, 0] - pts[0, 0])
        if a2 < 0:
            pts = pts[::-1]
        z = rng.uniform(*depth_range)
        clip[t * 3:t * 3 + 3, 0:2] = pts
        clip[t * 3:t * 3 + 3, 2] = z
        clip[t * 3:t * 3 + 3, 3] = 1.0
    indices = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    valid = np.ones(n, bool)
    payload = (np.arange(n, dtype=np.uint32) + 1) << 7
    return clip, indices, valid, payload


def run_both(clip, indices, valid, payload, cfg=CFG, backface_cull=True):
    depth, vis, stats = rasterize(jnp.asarray(clip), jnp.asarray(indices),
                                  jnp.asarray(valid), jnp.asarray(payload),
                                  cfg, backface_cull=backface_cull)
    d_ref, v_ref = rasterize_oracle(clip, indices, valid, payload,
                                    cfg.width, cfg.height,
                                    backface_cull=backface_cull)
    return np.asarray(depth), np.asarray(vis), d_ref, v_ref, stats


def assert_images_close(d, v, d_ref, v_ref, max_mismatch_frac=0.01):
    """Allow a tiny fraction of differing pixels (float rounding at edges)."""
    vis_mismatch = np.mean(v != v_ref)
    depth_err = np.abs(d - d_ref)
    assert vis_mismatch <= max_mismatch_frac, f"vis mismatch {vis_mismatch:.4f}"
    assert np.percentile(depth_err, 99) < 1e-3


def test_single_triangle():
    rng = np.random.default_rng(0)
    clip, idx, valid, payload = make_random_tris(1, rng)
    d, v, d_ref, v_ref, _ = run_both(clip, idx, valid, payload)
    assert (v_ref != 0).sum() > 0, "oracle drew nothing — bad test"
    assert_images_close(d, v, d_ref, v_ref)


def test_many_overlapping_triangles_depth_order():
    rng = np.random.default_rng(1)
    clip, idx, valid, payload = make_random_tris(30, rng)
    d, v, d_ref, v_ref, _ = run_both(clip, idx, valid, payload)
    assert (v_ref != 0).sum() > 100
    assert_images_close(d, v, d_ref, v_ref)


def test_multi_window_stream():
    """>128 triangles exercises multiple windows per tile."""
    rng = np.random.default_rng(6)
    clip, idx, valid, payload = make_random_tris(300, rng, size=0.15)
    d, v, d_ref, v_ref, _ = run_both(clip, idx, valid, payload)
    assert (v_ref != 0).sum() > 100
    assert_images_close(d, v, d_ref, v_ref)


def test_big_window_path():
    """A screen-covering triangle must take the big-window path."""
    clip = np.array([
        [-4.0, -4.0, 0.5, 1.0],
        [4.0, -4.0, 0.5, 1.0],
        [0.0, 4.0, 0.5, 1.0],
    ], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    valid = np.ones(1, bool)
    payload = np.array([123 << 7], np.uint32)
    d, v, d_ref, v_ref, _ = run_both(clip, idx, valid, payload)
    assert (v == (123 << 7)).mean() > 0.95  # covers whole screen
    assert_images_close(d, v, d_ref, v_ref)


def test_mixed_small_and_big():
    rng = np.random.default_rng(2)
    clip_s, idx_s, val_s, pay_s = make_random_tris(20, rng)
    clip_b = np.array([
        [-4.0, -4.0, 0.05, 1.0],
        [4.0, -4.0, 0.05, 1.0],
        [0.0, 4.0, 0.05, 1.0],
    ], np.float32)
    clip = np.concatenate([clip_s, clip_b])
    idx = np.concatenate([idx_s, np.array([[60, 61, 62]], np.int32)])
    valid = np.ones(21, bool)
    payload = np.concatenate([pay_s, np.array([999 << 7], np.uint32)])
    d, v, d_ref, v_ref, _ = run_both(clip, idx, valid, payload)
    # background must be the big tri (it's behind everything)
    assert (v_ref == (999 << 7)).mean() > 0.5
    assert_images_close(d, v, d_ref, v_ref)


@pytest.mark.slow
def test_backface_culling():
    rng = np.random.default_rng(3)
    clip, idx, valid, payload = make_random_tris(10, rng)
    idx_flipped = idx[:, ::-1].copy()
    d, v, *_ = run_both(clip, idx_flipped, valid, payload)
    assert (v != 0).sum() == 0, "backfaces must be culled"
    d2, v2, d_ref, v_ref, _ = run_both(clip, idx_flipped, valid, payload,
                                       backface_cull=False)
    assert (v2 != 0).sum() > 0
    assert_images_close(d2, v2, d_ref, v_ref)


def test_fully_behind_rejected():
    clip = np.array([
        [0.0, 0.0, 0.5, -0.5],
        [0.5, 0.0, 0.5, -1.0],
        [0.0, 0.5, 0.5, -0.7],
    ], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    d, v, *_ = run_both(clip, idx, np.ones(1, bool),
                        np.array([1 << 7], np.uint32))
    assert (v != 0).sum() == 0


def test_eye_plane_crossing_renders():
    """Homogeneous raster: a triangle with one vertex behind the eye must
    still rasterize its in-front part (no near clipping stage)."""
    clip = np.array([
        [-2.0, -1.0, 0.01, 2.0],
        [2.0, -1.0, 0.01, 2.0],
        [0.0, 1.0, 0.01, -0.5],   # behind the eye
    ], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    payload = np.array([77 << 7], np.uint32)
    d, v, d_ref, v_ref, _ = run_both(clip, idx, np.ones(1, bool), payload,
                                     backface_cull=False)
    assert (v_ref != 0).sum() > 50, "oracle should draw the in-front part"
    assert_images_close(d, v, d_ref, v_ref)


def test_invalid_triangles_ignored():
    rng = np.random.default_rng(4)
    clip, idx, valid, payload = make_random_tris(10, rng)
    valid[::2] = False
    d, v, d_ref, v_ref, _ = run_both(clip, idx, valid, payload)
    assert_images_close(d, v, d_ref, v_ref)
    drawn = set(np.unique(v)) - {0}
    culled = {int(p) for p in payload[::2]}
    assert not (drawn & culled)


@pytest.mark.slow
def test_raster_accumulate_seed():
    """Seeding with a previous phase's depth/vis must keep closer seed
    pixels (the two-phase HZB re-raster contract)."""
    rng = np.random.default_rng(7)
    clip, idx, valid, payload = make_random_tris(5, rng, depth_range=(0.3, 0.4))
    d1, v1, _, _, _ = run_both(clip, idx, valid, payload)
    # second phase: same geometry but farther depth and different payload
    clip2 = clip.copy()
    clip2[:, 2] = 0.1
    payload2 = payload + 7
    from chord_tpu.ops.raster import rasterize
    d2, v2, _ = rasterize(jnp.asarray(clip2), jnp.asarray(idx),
                          jnp.asarray(valid), jnp.asarray(payload2), CFG,
                          init_depth=jnp.asarray(d1), init_vis=jnp.asarray(v1))
    d2, v2 = np.asarray(d2), np.asarray(v2)
    covered = v1 != 0
    # phase-1 content must win everywhere it was closer
    assert (v2[covered] == v1[covered]).all()


def test_pair_overflow_counted():
    rng = np.random.default_rng(5)
    clip, idx, valid, payload = make_random_tris(600, rng, size=0.3,
                                                 center_range=0.1)
    cfg = CFG._replace(pair_capacity=4)
    setup = setup_triangles(jnp.asarray(clip), jnp.asarray(idx[:512 * 3 // 3]),
                            jnp.asarray(valid[:512]),
                            jnp.asarray(payload[:512]), cfg)
    queue = bin_windows(setup, cfg)
    assert int(queue.overflow) > 0
    assert int(queue.n_pairs) == 4


# ---------------------------------------------------------------------------
# Brick-layout kernel (fused x-binning): same oracle, bricks=True
# ---------------------------------------------------------------------------
BCFG = RasterConfig(width=W, height=H, tile_h=16, tile_w=128,
                    pair_capacity=512, big_capacity=32, bricks=True,
                    interpret=True)


def test_bricks_pack_roundtrip():
    from chord_tpu.ops.raster import bricks_pack, bricks_unpack
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(BCFG.tiles_y * BCFG.tile_h,
                                     BCFG.tiles_x * BCFG.tile_w))
                    .astype(np.float32))
    y = bricks_unpack(bricks_pack(x, BCFG), BCFG)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_bricks_matches_oracle_random():
    rng = np.random.default_rng(7)
    clip, indices, valid, payload = make_random_tris(150, rng)
    d, v, d_ref, v_ref, stats = run_both(clip, indices, valid, payload,
                                         cfg=BCFG)
    assert int(stats["bin_overflow"]) == 0
    assert_images_close(d, v, d_ref, v_ref)


@pytest.mark.slow
def test_bricks_matches_flat_kernel_with_attrs():
    """Brick and flat kernels agree up to edge-pixel ULP divergence (the
    brick kernel folds a*32b into the column constant — a different FMA
    association, so coverage at razor-edge pixels can flip)."""
    rng = np.random.default_rng(11)
    clip, indices, valid, payload = make_random_tris(120, rng)
    attrs = rng.normal(size=(clip.shape[0], 5)).astype(np.float32)
    flat_cfg = BCFG._replace(bricks=False, with_attrs=True)
    brick_cfg = BCFG._replace(with_attrs=True)
    outs_f = rasterize(jnp.asarray(clip), jnp.asarray(indices),
                       jnp.asarray(valid), jnp.asarray(payload),
                       flat_cfg, attrs=jnp.asarray(attrs))
    outs_b = rasterize(jnp.asarray(clip), jnp.asarray(indices),
                       jnp.asarray(valid), jnp.asarray(payload),
                       brick_cfg, attrs=jnp.asarray(attrs))
    v_f, v_b = np.asarray(outs_f[1]), np.asarray(outs_b[1])
    assert np.mean(v_f != v_b) < 0.01
    same = v_f == v_b
    for f, b in zip(outs_f[2:-1], outs_b[2:-1]):   # attr planes
        fa, ba = np.asarray(f)[same], np.asarray(b)[same]
        assert np.percentile(np.abs(fa - ba), 99) < 1e-3


@pytest.mark.slow
def test_bricks_seeded_accumulate():
    """Phase-1 style re-raster over brick seeds matches the flat kernel
    (same tolerance as the oracle gate)."""
    rng = np.random.default_rng(13)
    clip0, idx0, val0, pay0 = make_random_tris(60, rng)
    clip1, idx1, val1, pay1 = make_random_tris(60, rng)
    res = {}
    for cfg in (BCFG, BCFG._replace(bricks=False)):
        d0, v0, s0 = rasterize(jnp.asarray(clip0), jnp.asarray(idx0),
                               jnp.asarray(val0), jnp.asarray(pay0), cfg)
        d1, v1, s1 = rasterize(jnp.asarray(clip1), jnp.asarray(idx1),
                               jnp.asarray(val1), jnp.asarray(pay1), cfg,
                               seeds=(d0, v0))
        res[cfg.bricks] = (np.asarray(d1), np.asarray(v1))
    assert_images_close(res[True][0], res[True][1],
                        res[False][0], res[False][1])


@pytest.mark.parametrize("bricks", [False, True])
@pytest.mark.slow
def test_depth_peel_second_layer(bricks):
    """z_clip depth peeling: re-rastering with zclip = first-pass depth
    yields, per pixel, the SECOND-nearest surface (oracle: brute-force
    over overlapping random triangles). Backs the 2nd masked layer."""
    rng = np.random.default_rng(11)
    clip, idx, valid, payload = make_random_tris(40, rng)
    cfg = CFG._replace(z_clip=True, tile_h=16) if not bricks else \
        CFG._replace(z_clip=True, bricks=True, tile_h=16, sub_s=4)
    d0, v0, stats = rasterize(jnp.asarray(clip), jnp.asarray(idx),
                              jnp.asarray(valid), jnp.asarray(payload),
                              cfg)[0:2] + (None,)
    d1, v1, s1 = rasterize(jnp.asarray(clip), jnp.asarray(idx),
                           jnp.asarray(valid), jnp.asarray(payload),
                           cfg, zclip=d0)
    d0 = np.asarray(d0); v0 = np.asarray(v0)
    d1 = np.asarray(d1); v1 = np.asarray(v1)

    # oracle: two nearest depths per pixel via per-triangle z planes
    d_ref0, v_ref0 = rasterize_oracle(clip, idx, valid, payload,
                                      cfg.width, cfg.height)
    # peel oracle: drop, per pixel, every fragment at/nearer than d0 and
    # re-run — emulate by rasterizing each triangle alone and composing
    per = []
    for t in range(len(idx)):
        va = np.zeros(len(idx), bool); va[t] = True
        dt, vt = rasterize_oracle(clip, idx, va, payload,
                                  cfg.width, cfg.height)
        per.append((dt, vt))
    d_ref1 = np.zeros_like(d_ref0)
    v_ref1 = np.zeros_like(v_ref0)
    for dt, vt in per:
        # exclude the layer-0 winner by IDENTITY (the oracle's z differs
        # from the kernel's by an ulp, so a pure depth compare would
        # re-include the winner itself)
        m = (vt != 0) & (dt < d0) & (vt != v0) & \
            ((dt > d_ref1) | ((dt == d_ref1) & (vt > v_ref1)))
        d_ref1 = np.where(m, dt, d_ref1)
        v_ref1 = np.where(m, vt, v_ref1)

    layered = (v_ref1 != 0)
    assert layered.sum() > 50, "no overlapping coverage — bad test"
    # grade only where layer 0 agreed (edge-rounding pixels compound)
    agree = v0 == v_ref0
    mism = np.mean(v1[agree] != v_ref1[agree])
    assert mism <= 0.02, f"peel vis mismatch {mism:.4f}"
    # the peel layer is strictly behind layer 0 wherever it exists
    assert np.all(d1[v1 != 0] < d0[v1 != 0])


def test_overflow_exact_at_capacity_boundary():
    """n_pairs + overflow must equal the TRUE expanded (tile,window) pair
    count exactly, for any pair/big capacity (VERDICT r2 item 10: no
    `big_overflow * 8` guess)."""
    rng = np.random.default_rng(7)
    # mix of small and big windows: some tris span many tiles
    clip, idx, valid, payload = make_random_tris(248, rng, size=0.25,
                                                 center_range=0.9)
    clip2, idx2, valid2, payload2 = make_random_tris(8, rng, size=1.5,
                                                     center_range=0.2)
    n1 = idx.shape[0] * 3
    clip = np.concatenate([clip, clip2])
    idx = np.concatenate([idx, idx2 + n1])
    valid = np.concatenate([valid, valid2])
    payload = np.concatenate([payload, payload2])

    def pairs_at(pair_cap, big_cap):
        cfg = CFG._replace(pair_capacity=pair_cap, big_capacity=big_cap)
        setup = setup_triangles(jnp.asarray(clip), jnp.asarray(idx),
                                jnp.asarray(valid), jnp.asarray(payload),
                                cfg)
        q = bin_windows(setup, cfg)
        return int(q.n_pairs), int(q.overflow)

    n_true, ov0 = pairs_at(8192, 64)
    assert ov0 == 0
    total_true = n_true

    # exact boundary: capacity == true count -> zero overflow
    n, ov = pairs_at(total_true, 64)
    assert (n, ov) == (total_true, 0)
    # one below -> exactly one dropped
    n, ov = pairs_at(total_true - 1, 64)
    assert (n, ov) == (total_true - 1, 1)
    # squeeze the big-window list: dropped big windows count their full
    # tile-span expansion, so the invariant still holds exactly
    for big_cap in (1, 2, 4):
        n, ov = pairs_at(8192, big_cap)
        assert n + ov == total_true, (n, ov, total_true, big_cap)
    # both capacities squeezed
    n, ov = pairs_at(total_true // 2, 2)
    assert n + ov == total_true


@pytest.mark.slow   # 197s on the 1-core runner (interpret-mode frames)
def test_sub_loop_bit_identical():
    """config.sub_loop (dynamic fori over subwindows) is the SAME math in
    a different control structure — outputs must be bit-identical to the
    unrolled kernel at every sub_s, with and without attrs."""
    rng = np.random.default_rng(17)
    clip, indices, valid, payload = make_random_tris(120, rng)
    attrs = rng.normal(size=(clip.shape[0], 5)).astype(np.float32)
    for sub_s, tile_h in ((4, 8), (8, 8), (16, 16)):
        for with_attrs in (False, True):
            base = CFG._replace(sub_s=sub_s, tile_h=tile_h,
                                with_attrs=with_attrs)
            kw = dict(attrs=jnp.asarray(attrs)) if with_attrs else {}
            outs_u = rasterize(jnp.asarray(clip), jnp.asarray(indices),
                               jnp.asarray(valid), jnp.asarray(payload),
                               base, **kw)
            outs_l = rasterize(jnp.asarray(clip), jnp.asarray(indices),
                               jnp.asarray(valid), jnp.asarray(payload),
                               base._replace(sub_loop=True), **kw)
            for u, l in zip(outs_u[:-1], outs_l[:-1]):
                np.testing.assert_array_equal(np.asarray(u), np.asarray(l))


@pytest.mark.slow   # ~340s: interpret-mode rasters at 3 configs x2
def test_rp_override_bit_identical():
    """RasterConfig.rp (rows packed per inner iteration, decoupled from
    sub_s — the compile-helper workaround for sub_s=16) is the same math
    in narrower packs: outputs must be bit-identical to rp=auto."""
    rng = np.random.default_rng(23)
    clip, indices, valid, payload = make_random_tris(120, rng)
    attrs = rng.normal(size=(clip.shape[0], 5)).astype(np.float32)
    for sub_s, rp, tile_h in ((16, 8, 16), (8, 8, 8), (16, 8, 32)):
        for with_attrs in (False, True):
            base = CFG._replace(sub_s=sub_s, tile_h=tile_h,
                                with_attrs=with_attrs)
            kw = dict(attrs=jnp.asarray(attrs)) if with_attrs else {}
            outs_a = rasterize(jnp.asarray(clip), jnp.asarray(indices),
                               jnp.asarray(valid), jnp.asarray(payload),
                               base, **kw)
            outs_r = rasterize(jnp.asarray(clip), jnp.asarray(indices),
                               jnp.asarray(valid), jnp.asarray(payload),
                               base._replace(rp=rp), **kw)
            for a, r in zip(outs_a[:-1], outs_r[:-1]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(r))
