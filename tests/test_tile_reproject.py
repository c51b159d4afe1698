"""Tile-local history reprojection (ops/tile_reproject.py) vs the
per-pixel gather oracle — the parallax gate VERDICT r4 #6 asked for.

The bench's r4 "global" reprojection had NO gate under depth-varying
motion (the only global-vs-gather test asserted equality at zero
motion); the r5 bench quality probe then measured SSIM 0.84-0.91 vs the
exact path on the translating fly-through. These tests pin the tile
mode's contract: exact (to bilinear) under uniform motion, and
strictly closer than global under parallax."""

import numpy as np
import jax.numpy as jnp


def _oracle_bilinear(img, mot_px):
    """Exact per-pixel reproject: sample img at pos - motion."""
    h, w = img.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    sx = xs + 0.5 - mot_px[..., 0]
    sy = ys + 0.5 - mot_px[..., 1]
    x0 = np.floor(sx - 0.5)
    y0 = np.floor(sy - 0.5)
    fx = (sx - 0.5 - x0)[..., None]
    fy = (sy - 0.5 - y0)[..., None]
    x0i = np.clip(x0.astype(int), 0, w - 1)
    y0i = np.clip(y0.astype(int), 0, h - 1)
    x1i = np.clip(x0i + 1, 0, w - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    return (img[y0i, x0i] * (1 - fx) * (1 - fy) +
            img[y0i, x1i] * fx * (1 - fy) +
            img[y1i, x0i] * (1 - fx) * fy +
            img[y1i, x1i] * fx * fy)


def _smooth_img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h // 8, w // 8, 3)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8, 1), np.float32))
    # soften so bilinear differences stay small
    for _ in range(2):
        img = (np.roll(img, 1, 0) + np.roll(img, -1, 0) +
               np.roll(img, 1, 1) + np.roll(img, -1, 1) + img) / 5.0
    return img.astype(np.float32)


def test_uniform_motion_matches_bilinear_oracle():
    from chord_tpu.ops.tile_reproject import tile_reproject

    h, w = 96, 160
    img = _smooth_img(h, w)
    mot = np.zeros((h, w, 2), np.float32)
    mot[..., 0] = 5.3
    mot[..., 1] = -2.7
    out, resid = tile_reproject(jnp.asarray(img), jnp.asarray(mot))
    out = np.asarray(out)
    ref = _oracle_bilinear(img, mot)
    # interior (edge clamping differs only at borders the motion exposes)
    sl = (slice(8, -8), slice(8, -8))
    np.testing.assert_allclose(out[sl], ref[sl], atol=5e-4)
    assert float(np.abs(np.asarray(resid)).max()) < 1e-4


def test_parallax_beats_global_mode():
    """Depth-varying (parallax) motion: tile-local reprojection must be
    much closer to the exact resample than the global mean-shift."""
    from chord_tpu.ops.tile_reproject import tile_reproject

    h, w = 96, 160
    img = _smooth_img(h, w, seed=7)
    # motion grows from 1px at the top to 13px at the bottom (a ground
    # plane under camera translation), slight x-dependence too
    ys = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    xs = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    mot = np.zeros((h, w, 2), np.float32)
    mot[..., 0] = 1.0 + 12.0 * ys * np.ones_like(xs)
    mot[..., 1] = 2.0 * xs * np.ones_like(ys)
    ref = _oracle_bilinear(img, mot)

    out, resid = tile_reproject(jnp.asarray(img), jnp.asarray(mot))
    out = np.asarray(out)

    # global mean-shift baseline (nearest-int roll + bilinear like
    # post.temporal_resolve_global)
    mg = mot.reshape(-1, 2).mean(0)
    glob = _oracle_bilinear(img, np.broadcast_to(mg, mot.shape))

    sl = (slice(8, -8), slice(8, -8))
    err_tile = np.abs(out[sl] - ref[sl]).mean()
    err_glob = np.abs(glob[sl] - ref[sl]).mean()
    assert err_tile < err_glob * 0.45, (err_tile, err_glob)
    # residual reflects the within-tile motion spread only (< 2.3 px for
    # a 12px/96row gradient over 32-row tiles)
    assert float(np.asarray(resid).max()) < 2.5
