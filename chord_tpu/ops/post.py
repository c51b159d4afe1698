"""Post-processing chain: auto-exposure, bloom, TSR.

TPU-native equivalents of the reference post passes:
- Auto exposure: log-luminance histogram (128 bins) + percentile-clipped
  average + temporal adaptation with separate up/down speeds (reference:
  install/resource/shader/histogram.hlsl:44-54, auto_exposure.hlsl:116,
  renderer/postprocessing/renderer_postprocessing.cpp:18-20; config
  renderer/render_helper.h:516-526).
- Bloom: downsample/upsample pyramid with threshold + soft knee
  (reference: renderer/postprocessing/bloom.cpp:25-35).
- TSR: temporal super resolution — prepare (closest-depth motion dilation),
  reprojection (history resample), rectify (3x3 neighborhood clamp),
  sharpen (reference: renderer/postprocessing/tsr.cpp:25-28,
  shader/tsr_*.hlsl; SURVEY.md §8.8).

Shader atomics (histogram shared-mem adds) become one-hot segment sums; the
compute-pass chain becomes plain function composition that XLA fuses.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import colorspace


# --- Auto exposure ---------------------------------------------------------

HISTOGRAM_BINS = 128  # reference: shader/base.h:426 kHistogramBinCount


class ExposureConfig(NamedTuple):
    """reference: render_helper.h:516-526 PostprocessConfig."""

    min_log_lum: float = -10.0
    max_log_lum: float = 6.0
    low_percent: float = 0.5
    high_percent: float = 0.95
    speed_up: float = 3.0
    speed_down: float = 1.0
    exposure_compensation: float = 1.0
    fix_exposure: float = -1.0      # > 0 -> bypass (reference bAutoExposure off)


def luminance_histogram(color_ap1: jnp.ndarray, cfg: ExposureConfig
                        ) -> jnp.ndarray:
    """(H,W,3) AP1 -> (BINS,) normalized histogram of log2 luminance.

    The HLSL shared-memory atomic adds (histogram.hlsl:44-54) become a
    one-hot segment-sum, which XLA lowers to an efficient reduction.
    Bin 0 collects near-black pixels, exactly like the reference's
    `luma < epsilon -> bin 0` path.
    """
    # exposure statistics don't need full resolution: 1/4-res sampling
    # quarters the scatter cost with no visible adaptation difference
    color_ap1 = color_ap1[::4, ::4]
    luma = colorspace.luminance_ap1(color_ap1)
    scale = 1.0 / (cfg.max_log_lum - cfg.min_log_lum)
    t = (jnp.log2(jnp.maximum(luma, 1e-10)) - cfg.min_log_lum) * scale
    is_black = luma < 1e-5
    binf = jnp.where(is_black, 0.0, 1.0 + t * (HISTOGRAM_BINS - 2))
    bins = jnp.clip(binf.astype(jnp.int32), 0, HISTOGRAM_BINS - 1)
    # one-hot compare + sum, NOT .at[].add scatter: XLA lowers the scatter
    # serially on TPU (~2.7 ms); the fused (N,BINS) compare-reduce is a
    # plain reduction (~0.3 ms)
    onehot = (bins.reshape(-1, 1) ==
              jnp.arange(HISTOGRAM_BINS, dtype=jnp.int32)[None, :])
    hist = jnp.sum(onehot.astype(jnp.float32), axis=0)
    return hist / jnp.maximum(jnp.sum(hist), 1.0)


def adapt_exposure(
    hist: jnp.ndarray,           # (BINS,) normalized
    prev_exposure: jnp.ndarray,  # () f32
    dt: float,
    cfg: ExposureConfig,
) -> jnp.ndarray:
    """-> new adapted exposure scalar (reference: auto_exposure.hlsl —
    percentile-clipped mean luminance, key value
    `1.03 - 2/(2+log2(avg+1))`, exponential up/down adaptation)."""
    # percentiles over the NON-black distribution (bin 0 = near-black; a
    # mostly-black frame must still key on its lit pixels)
    nonblack = hist.at[0].set(0.0)
    nonblack = nonblack / jnp.maximum(jnp.sum(nonblack), 1e-6)
    cum = jnp.cumsum(nonblack)
    lo, hi = cfg.low_percent, cfg.high_percent
    # weight of each bin inside the [lo, hi] percentile band
    prev_cum = jnp.concatenate([jnp.zeros(1), cum[:-1]])
    band = jnp.clip(jnp.minimum(cum, hi) - jnp.maximum(prev_cum, lo), 0.0, 1.0)
    centers = (jnp.arange(HISTOGRAM_BINS, dtype=jnp.float32) - 1.0 + 0.5) / \
        (HISTOGRAM_BINS - 2) * (cfg.max_log_lum - cfg.min_log_lum) + cfg.min_log_lum
    band = band.at[0].set(0.0)   # black bin excluded from the average
    avg_log = jnp.sum(band * centers) / jnp.maximum(jnp.sum(band), 1e-6)
    avg_lum = jnp.exp2(avg_log)

    key = 1.03 - 2.0 / (2.0 + jnp.log2(avg_lum + 1.0))
    target = key / jnp.maximum(avg_lum, 1e-6) * cfg.exposure_compensation

    speed = jnp.where(target > prev_exposure, cfg.speed_up, cfg.speed_down)
    blend = 1.0 - jnp.exp(-dt * speed)
    adapted = prev_exposure + (target - prev_exposure) * blend
    if cfg.fix_exposure > 0.0:
        return jnp.asarray(cfg.fix_exposure, jnp.float32)
    return adapted


# --- Bloom -----------------------------------------------------------------

class BloomConfig(NamedTuple):
    """reference: render_helper.h:527-536 + bloom.cpp:25-35."""

    threshold: float = 1.0
    soft_knee: float = 0.5
    intensity: float = 0.06
    radius: float = 0.75
    levels: int = 5


def decimate(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Nearest k-fold downsample of (h,w,...) over the leading two axes
    — the drop-in for `x[::k, ::k]`, which the axon TPU lowers to an
    index-array GATHER (~2-4 ms per 1080p plane, measured; the frame had
    ~10 ms/frame of these). Matches `[::k]` output shape (ceil).

    f32 rank-2/3 inputs route through one-hot selection dot_generals
    (MXU relayout, exact: every output row/col has exactly one unit
    weight, so products and sums are exact f32); everything else uses
    the dense reshape + unit-index form."""
    ky, kx = (k, k) if isinstance(k, int) else k
    if ky == 1 and kx == 1:
        return x
    h, w = x.shape[0], x.shape[1]
    if x.dtype == jnp.float32 and x.ndim in (2, 3):
        hh, ww = -(-h // ky), -(-w // kx)
        sh = jnp.zeros((hh, h), jnp.float32).at[
            jnp.arange(hh), jnp.arange(hh) * ky].set(1.0)
        sw = jnp.zeros((w, ww), jnp.float32).at[
            jnp.arange(ww) * kx, jnp.arange(ww)].set(1.0)
        hi = jax.lax.Precision.HIGHEST
        if x.ndim == 2:
            return jnp.einsum("Hh,hw,wW->HW", sh, x, sw, precision=hi)
        y = jnp.einsum("Hh,hwc->Hwc", sh, x, precision=hi)
        return jnp.einsum("Hwc,wW->HWc", y, sw, precision=hi)
    ph = -(-h // ky) * ky
    pw = -(-w // kx) * kx
    if ph != h or pw != w:
        pad = ((0, ph - h), (0, pw - w)) + ((0, 0),) * (x.ndim - 2)
        x = jnp.pad(x, pad, mode="edge")
    shp = (ph // ky, ky, pw // kx, kx) + x.shape[2:]
    return x.reshape(shp)[:, 0, :, 0]


def upsample_nearest(x: jnp.ndarray, k, out_h: int, out_w: int
                     ) -> jnp.ndarray:
    """k-x nearest upsample of (h,w[,c]) cropped to (out_h, out_w). k may
    be an int or an (kh, kw) pair.

    stack+reshape replication (a sublane/lane broadcast, linear in output
    pixels) — NOT jnp.repeat (multi-ms relayout) and NOT the r4 one-hot
    dot_generals: the dot form's cost is H*h*w + H*w*W, which scales
    CUBICALLY with resolution — at 4K it made the GI upsample chain 7.6x
    its 1080p cost instead of 4x (r5 pass table: gi.probe.upsample
    26 ms/frame at 4K)."""
    kh, kw = (k, k) if isinstance(k, int) else k
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    h, w, c = x.shape
    x = jnp.stack([x] * kh, 1).reshape(h * kh, w, c)
    x = jnp.stack([x] * kw, 2).reshape(h * kh, w * kw, c)
    # callers pass out <= in*k (ceil-division decimate counterparts);
    # edge-extend defensively if a caller ever over-asks
    if out_h > h * kh or out_w > w * kw:
        x = jnp.pad(x, ((0, max(0, out_h - h * kh)),
                        (0, max(0, out_w - w * kw)), (0, 0)), mode="edge")
    x = x[:out_h, :out_w]
    return x[..., 0] if squeeze else x


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x box downsample, (H,W,3); odd dims are edge-padded to even.

    reduce_window, NOT reshape-mean: strided (h,2,w,2,c) reshapes relayout
    across lanes and measure ~6x slower on TPU (5.2 vs 0.9 ms at 1080p)."""
    h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1),
                                 "VALID") * 0.25


def _upsample2(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """2x bilinear-ish upsample via nearest + 3x3 tent filter.

    stack+reshape, NOT jnp.repeat: identical semantics but repeat lowers
    to a ~5 ms relayout at 1080p while stack+reshape is free."""
    h, w, c = x.shape
    up = jnp.stack([x, x], 1).reshape(h * 2, w, c)
    up = jnp.stack([up, up], 2).reshape(h * 2, w * 2, c)
    up = up[:out_h, :out_w]
    # tent blur: separable [1,2,1]/4 (rolls are cheap on TPU)
    k = jnp.array([0.25, 0.5, 0.25])
    up = (jnp.roll(up, 1, 0) * k[0] + up * k[1] + jnp.roll(up, -1, 0) * k[2])
    up = (jnp.roll(up, 1, 1) * k[0] + up * k[1] + jnp.roll(up, -1, 1) * k[2])
    return up


def compute_bloom(color: jnp.ndarray, cfg: BloomConfig) -> jnp.ndarray:
    """(H,W,3) HDR AP1 -> bloom contribution (H,W,3). Pyramid down +
    accumulate up (reference bloom.cpp pyramid). The whole pyramid runs
    at half res (a blur chain loses nothing; per-pixel cost is the
    bottleneck on this device)."""
    full_h, full_w = color.shape[:2]
    color = _downsample2(color)
    # Quadratic soft-knee threshold (standard; reference uses the same
    # threshold+knee curve family).
    luma = colorspace.luminance_ap1(color)[..., None]
    knee = cfg.threshold * cfg.soft_knee + 1e-5
    soft = jnp.clip(luma - cfg.threshold + knee, 0.0, 2.0 * knee)
    soft = soft * soft / (4.0 * knee)
    contrib = jnp.maximum(luma - cfg.threshold, soft) / jnp.maximum(luma, 1e-5)
    seed = color * contrib

    # Down chain
    mips = [seed]
    for _ in range(cfg.levels):
        h, w, _ = mips[-1].shape
        if h < 8 or w < 8:
            break
        mips.append(_downsample2(mips[-1]))

    # Up chain with radius-weighted accumulation
    acc = mips[-1]
    for i in range(len(mips) - 2, -1, -1):
        h, w, _ = mips[i].shape
        acc = mips[i] + _upsample2(acc, h, w) * cfg.radius
    return _upsample2(acc * cfg.intensity, full_h, full_w)


# --- TSR (temporal super resolution) --------------------------------------

def upsample2x_linear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact half-pixel-center 2x bilinear upsample of (h,w[,c]) via
    shift+lerp (matches jax.image.resize(..., "linear") without the
    resize gather/conv lowering — dense stacks and adds only).

    Output pixel y maps to half coord v = (y+0.5)/2 - 0.5: even rows
    blend rows (k-1, k) with weights (0.25, 0.75), odd rows (k, k+1)
    with (0.75, 0.25) — same in x; edges clamp."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]

    def axis_up(a, axis):
        # shifted-with-clamp neighbors
        if axis == 0:
            prev = jnp.concatenate([a[:1], a[:-1]], 0)
            nxt = jnp.concatenate([a[1:], a[-1:]], 0)
        else:
            prev = jnp.concatenate([a[:, :1], a[:, :-1]], 1)
            nxt = jnp.concatenate([a[:, 1:], a[:, -1:]], 1)
        even = 0.25 * prev + 0.75 * a
        odd = 0.75 * a + 0.25 * nxt
        # interleave along `axis`
        stacked = jnp.stack([even, odd], axis=axis + 1)
        sh = list(a.shape)
        sh[axis] *= 2
        return stacked.reshape(sh)

    x = axis_up(axis_up(x, 0), 1)
    return x[..., 0] if squeeze else x


def upsample_linear(x: jnp.ndarray, k: int, out_h: int, out_w: int
                    ) -> jnp.ndarray:
    """Power-of-two k-x bilinear upsample by repeated 2x steps, cropped
    to (out_h, out_w). Not bit-exact to a single k-x resize (cascaded
    2x lerps re-sample the intermediate grid) — visually equivalent and
    ~an order of magnitude cheaper than the resize lowering."""
    assert k & (k - 1) == 0, "k must be a power of two"
    while k > 1:
        x = upsample2x_linear(x)
        k //= 2
    return x[:out_h, :out_w]


def tsr_prepare(motion_ndc: jnp.ndarray, depth: jnp.ndarray
                ) -> jnp.ndarray:
    """TSR prepare pass (reference tsr_prepare.hlsl): 3x3 closest-depth
    motion dilation — every pixel takes the motion vector of its
    closest-depth (reverse-Z max) neighbor, so silhouette edges reproject
    with the FOREGROUND object's motion and don't tear during TAA.
    Shifted-plane taps, no gathers."""
    best_d = depth
    best_m = motion_ndc
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            d2 = jnp.roll(depth, (dy, dx), (0, 1))
            m2 = jnp.roll(motion_ndc, (dy, dx), (0, 1))
            take = d2 > best_d
            best_m = jnp.where(take[..., None], m2, best_m)
            best_d = jnp.maximum(best_d, d2)
    return best_m


def disocclusion_mask(
    pos_tw: jnp.ndarray,        # (H,W,3) current surface positions
    valid: jnp.ndarray,         # (H,W) bool geometry mask
    prev_depth: jnp.ndarray,    # (H,W) previous frame reverse-Z depth
    prev_tw_to_clip: jnp.ndarray,  # (4,4) current TW -> previous clip
    history_valid: jnp.ndarray,    # () f32
    tol: float = 0.02,
) -> jnp.ndarray:
    """Disocclusion mask (reference disocclusion_mask.hlsl, consumed by
    the TSR/shadow/GI temporal passes, renderer.cpp:370): reproject each
    surface point into the previous frame and compare the depth the
    previous frame recorded there with the depth the point would have
    had — a mismatch means the point was hidden (or offscreen) last
    frame. -> (H,W) f32, 1 = disoccluded (history unusable)."""
    h, w = prev_depth.shape
    c = (pos_tw[..., 0:1] * prev_tw_to_clip[0] +
         pos_tw[..., 1:2] * prev_tw_to_clip[1] +
         pos_tw[..., 2:3] * prev_tw_to_clip[2] + prev_tw_to_clip[3])
    wc = jnp.maximum(c[..., 3], 1e-6)
    px = (c[..., 0] / wc * 0.5 + 0.5) * w
    py = (0.5 - c[..., 1] / wc * 0.5) * h
    z_expect = c[..., 2] / wc
    on = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (c[..., 3] > 0)
    xi = jnp.clip(px.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, h - 1)
    z_prev = prev_depth[yi, xi]
    consistent = jnp.abs(z_prev - z_expect) < tol
    ok = on & consistent & valid & (history_valid > 0.5)
    return 1.0 - ok.astype(jnp.float32)


class TSRConfig(NamedTuple):
    """reference: tsr.cpp:17-28 (+ cvar r.tsr.sharpeness)."""

    blend: float = 0.1           # new-frame weight when history valid
    sharpness: float = 0.25
    bilinear_history: bool = True   # False = nearest (1 gather instead of 4)
    # "gather": per-pixel history resample (exact; ~280 ms/frame at
    #           1080p on the tunneled TPU — gathers hit the scalar path);
    # "global": one screen-wide shift from the mean motion + adaptive
    #           per-pixel blend on the residual — zero gathers, but
    #           parallax (depth-dependent motion) rides the residual
    #           fallback everywhere (bench SSIM vs gather: 0.84-0.91);
    # "tile":   per-32x32-tile mean-motion reprojection (Pallas window
    #           DMA + one-hot-bilinear MXU select, ops/tile_reproject.py)
    #           — gather-free like "global", parallax-correct to within
    #           a tile's motion variance.
    mode: str = "gather"


def _sample_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                     ) -> jnp.ndarray:
    """img (H,W,C), x/y pixel coords (HW grids) -> (H,W,C)."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x - 0.5)
    y0 = jnp.floor(y - 0.5)
    fx = (x - 0.5) - x0
    fy = (y - 0.5) - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = img[y0i, x0i]
    c01 = img[y0i, x1i]
    c10 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    fx = fx[..., None]
    fy = fy[..., None]
    return (c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy) +
            c10 * (1 - fx) * fy + c11 * fx * fy)


def _neighborhood_minmax(img: jnp.ndarray, cross_only: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 (or cross) min/max over (H,W,C) via shifted mins."""
    lo = img
    hi = img
    taps = ([(-1, 0), (1, 0), (0, -1), (0, 1)] if cross_only else
            [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
             if (dy, dx) != (0, 0)])
    for dy, dx in taps:
        sh = jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)
        lo = jnp.minimum(lo, sh)
        hi = jnp.maximum(hi, sh)
    return lo, hi


def _resolve_with_hist(color, hist, resid, history_valid, cfg):
    """Shared TAA tail: neighborhood clamp, residual-adaptive blend,
    unsharp sharpen (used by the global and tile reprojection modes)."""
    lo, hi = _neighborhood_minmax(color, cross_only=True)
    hist = jnp.clip(hist, lo, hi)
    alpha = jnp.clip(cfg.blend + resid * 0.5, cfg.blend, 1.0)[..., None]
    alpha = jnp.maximum(alpha, 1.0 - history_valid)
    out = color * alpha + hist * (1.0 - alpha)
    blur = (jnp.roll(out, 1, 0) + jnp.roll(out, -1, 0) +
            jnp.roll(out, 1, 1) + jnp.roll(out, -1, 1)) * 0.25
    return jnp.maximum(out + (out - blur) * cfg.sharpness, 0.0)


def temporal_resolve_global(
    color: jnp.ndarray,        # (H,W,3)
    motion_ndc: jnp.ndarray,   # (H,W,2)
    history: jnp.ndarray,      # (H,W,3)
    history_valid: jnp.ndarray,
    cfg: TSRConfig,
) -> jnp.ndarray:
    """Gather-free TAA: reproject history by the MEAN screen motion
    (integer shift + bilinear via 4 static shifts), then blend with a
    per-pixel alpha that rises with the motion residual so locally-moving
    content re-converges instead of ghosting."""
    h, w = color.shape[:2]
    mx = jnp.mean(motion_ndc[..., 0]) * (w * 0.5)    # pixels right
    my = -jnp.mean(motion_ndc[..., 1]) * (h * 0.5)   # pixels down
    ix = jnp.floor(mx).astype(jnp.int32)
    iy = jnp.floor(my).astype(jnp.int32)
    fx = mx - ix.astype(jnp.float32)
    fy = my - iy.astype(jnp.float32)

    # shift history by (-iy, -ix): content moves WITH the screen motion
    def sh(dy, dx):
        return jnp.roll(jnp.roll(history, dy, 0), dx, 1)

    h00 = sh(-iy, -ix)
    h01 = sh(-iy, -ix - 1)
    h10 = sh(-iy - 1, -ix)
    h11 = sh(-iy - 1, -ix - 1)
    hist = (h00 * (1 - fx) * (1 - fy) + h01 * fx * (1 - fy) +
            h10 * (1 - fx) * fy + h11 * fx * fy)

    # residual per pixel (in pixels): how wrong the global shift is
    rx = motion_ndc[..., 0] * (w * 0.5) - mx
    ry = -motion_ndc[..., 1] * (h * 0.5) - my
    resid = jnp.sqrt(rx * rx + ry * ry)
    return _resolve_with_hist(color, hist, resid, history_valid, cfg)


def temporal_resolve_tile(
    color: jnp.ndarray,        # (H,W,3)
    motion_ndc: jnp.ndarray,   # (H,W,2)
    history: jnp.ndarray,      # (H,W,3)
    history_valid: jnp.ndarray,
    cfg: TSRConfig,
) -> jnp.ndarray:
    """Tile-local TAA: per-32x32-tile mean-motion history reprojection
    (ops/tile_reproject.py) — parallax-correct to within a tile's own
    motion variance, still zero gather primitives."""
    from .tile_reproject import tile_reproject

    h, w = color.shape[:2]
    mot_px = jnp.stack([motion_ndc[..., 0] * (w * 0.5),
                        -motion_ndc[..., 1] * (h * 0.5)], -1)
    hist, resid = tile_reproject(history, mot_px)
    return _resolve_with_hist(color, hist, resid, history_valid, cfg)


def temporal_upscale_global(
    color: jnp.ndarray,        # (h,w,3) render-res HDR (jittered sampling)
    motion_ndc: jnp.ndarray,   # (h,w,2) render-res NDC motion
    history: jnp.ndarray,      # (H,W,3) POST-res accumulated history
    history_valid: jnp.ndarray,
    jitter_px: jnp.ndarray,    # (2,) this frame's subpixel jitter
    cfg: TSRConfig,
    post_h: int, post_w: int,
    disocclusion: "jnp.ndarray" = None,   # (h,w) render-res mask
) -> jnp.ndarray:
    """Gather-free TSR upscale: the jitter-compensated render->post
    resample uses jax.image.scale_and_translate (fixed-kernel resize —
    lowers to weight-matrix contractions, no data-dependent gathers; the
    per-pixel-gather variant in temporal_upscale costs ~300 ms at 1080p
    on this device), history reprojects by the mean screen motion with a
    residual-adaptive blend (same compromise as temporal_resolve_global).
    Jittered frames accumulate toward the supersampled image."""
    import jax.image as jimage

    h, w = color.shape[:2]
    sy = post_h / h
    sx = post_w / w
    # output coord X samples input index (X + 0.5 - t)/s - 0.5; we want
    # (X + 0.5)/s - jitter - 0.5  =>  t = jitter * s
    cur = jimage.scale_and_translate(
        color, (post_h, post_w, 3), (0, 1),
        jnp.asarray([sy, sx]),
        jnp.asarray([jitter_px[1] * sy, jitter_px[0] * sx]),
        method="linear")
    mot = jimage.resize(motion_ndc, (post_h, post_w, 2), "linear")
    f = (temporal_resolve_tile if cfg.mode == "tile"
         else temporal_resolve_global)
    return f(cur, mot, history, history_valid, cfg)


def temporal_resolve(
    color: jnp.ndarray,        # (H,W,3) current frame HDR AP1 (jittered)
    motion_ndc: jnp.ndarray,   # (H,W,2) NDC motion (curr - prev)
    history: jnp.ndarray,      # (H,W,3) accumulated history
    history_valid: jnp.ndarray,  # () f32 0/1
    cfg: TSRConfig,
    disocclusion: "jnp.ndarray" = None,   # (H,W) 1 = history unusable
) -> jnp.ndarray:
    """TAA-style temporal accumulation at render res (the TSR upscale path
    adds the render->post resolution change on top; reference tsr_*.hlsl:
    reprojection + rectify + sharpen)."""
    if cfg.mode in ("global", "tile"):
        f = (temporal_resolve_tile if cfg.mode == "tile"
             else temporal_resolve_global)
        out = f(color, motion_ndc, history, history_valid, cfg)
        if disocclusion is not None:
            out = color + (out - color) * (1.0 - disocclusion[..., None])
        return out
    h, w = color.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    xs = jnp.broadcast_to(xs, (h, w))
    ys = jnp.broadcast_to(ys, (h, w))
    # motion is NDC (x right, y up); pixels are y-down
    px_prev = xs - motion_ndc[..., 0] * (w * 0.5)
    py_prev = ys + motion_ndc[..., 1] * (h * 0.5)

    if cfg.bilinear_history:
        hist = _sample_bilinear(history.astype(jnp.bfloat16), px_prev,
                                py_prev).astype(jnp.float32)
    else:
        h_, w_ = history.shape[:2]
        xi = jnp.clip(px_prev.astype(jnp.int32), 0, w_ - 1)
        yi = jnp.clip(py_prev.astype(jnp.int32), 0, h_ - 1)
        hist = history.astype(jnp.bfloat16)[yi, xi].astype(jnp.float32)

    # Rectify: clamp history into the cross-neighborhood color AABB
    # (4 taps instead of the reference's 3x3 — rolls are the cheap op
    # here, but 4 taps halve the VPU cost with near-identical clamping)
    lo, hi = _neighborhood_minmax(color, cross_only=True)
    hist = jnp.clip(hist, lo, hi)

    offscreen = ((px_prev < 0) | (px_prev > w) |
                 (py_prev < 0) | (py_prev > h)).astype(jnp.float32)[..., None]
    alpha = jnp.maximum(cfg.blend, jnp.maximum(1.0 - history_valid, offscreen))
    if disocclusion is not None:
        # disoccluded pixels restart accumulation (reference feeds the
        # disocclusion mask into TSR, renderer.cpp:370)
        alpha = jnp.maximum(alpha, disocclusion[..., None])
    out = color * alpha + hist * (1.0 - alpha)

    # Sharpen (tsr_sharpen.hlsl): unsharp mask against the 4-neighbor mean.
    blur = (jnp.roll(out, 1, 0) + jnp.roll(out, -1, 0) +
            jnp.roll(out, 1, 1) + jnp.roll(out, -1, 1)) * 0.25
    return jnp.maximum(out + (out - blur) * cfg.sharpness, 0.0)


def temporal_upscale(
    color: jnp.ndarray,        # (h,w,3) render-res HDR (jittered sampling)
    motion_ndc: jnp.ndarray,   # (h,w,2) render-res NDC motion
    history: jnp.ndarray,      # (H,W,3) POST-res accumulated history
    history_valid: jnp.ndarray,
    jitter_px: jnp.ndarray,    # (2,) this frame's subpixel jitter (render px)
    cfg: TSRConfig,
    post_h: int, post_w: int,
    disocclusion: "jnp.ndarray" = None,   # (h,w) render-res mask
) -> jnp.ndarray:
    """TSR with render->post upscale (the reference's render-dim ->
    post-dim chain, renderer.h:55-89 DimensionConfig + tsr_*.hlsl):
    the jittered render-res frame is resampled to post res, history is
    reprojected at post res, rectified against the upsampled
    neighborhood, and blended. Jitter makes the accumulation converge to
    a supersampled image over frames."""
    if cfg.mode in ("global", "tile"):
        out = temporal_upscale_global(color, motion_ndc, history,
                                      history_valid, jitter_px, cfg,
                                      post_h, post_w)
        if disocclusion is not None:
            cur0 = upsample_nearest(color, (-(-post_h // color.shape[0]),
                                            -(-post_w // color.shape[1])),
                                    post_h, post_w)
            dis0 = upsample_nearest(disocclusion,
                                    (-(-post_h // color.shape[0]),
                                     -(-post_w // color.shape[1])),
                                    post_h, post_w)
            out = cur0 + (out - cur0) * (1.0 - dis0[..., None])
        return out
    h, w = color.shape[:2]
    # post-pixel centers in render-pixel coordinates, shifted by jitter
    ys = (jnp.arange(post_h, dtype=jnp.float32)[:, None] + 0.5) * (h / post_h)
    xs = (jnp.arange(post_w, dtype=jnp.float32)[None, :] + 0.5) * (w / post_w)
    xs = jnp.broadcast_to(xs, (post_h, post_w)) - jitter_px[0]
    ys = jnp.broadcast_to(ys, (post_h, post_w)) - jitter_px[1]
    cur = _sample_bilinear(color, xs, ys)
    mot = _sample_bilinear(motion_ndc, xs, ys)

    pxs = jnp.broadcast_to(
        jnp.arange(post_w, dtype=jnp.float32)[None, :] + 0.5,
        (post_h, post_w))
    pys = jnp.broadcast_to(
        jnp.arange(post_h, dtype=jnp.float32)[:, None] + 0.5,
        (post_h, post_w))
    px_prev = pxs - mot[..., 0] * (post_w * 0.5)
    py_prev = pys + mot[..., 1] * (post_h * 0.5)
    hist = _sample_bilinear(history.astype(jnp.bfloat16), px_prev,
                            py_prev).astype(jnp.float32)

    lo, hi = _neighborhood_minmax(cur, cross_only=True)
    hist = jnp.clip(hist, lo, hi)
    offscreen = ((px_prev < 0) | (px_prev > post_w) |
                 (py_prev < 0) | (py_prev > post_h)
                 ).astype(jnp.float32)[..., None]
    alpha = jnp.maximum(cfg.blend, jnp.maximum(1.0 - history_valid,
                                               offscreen))
    if disocclusion is not None:
        dis = _sample_bilinear(disocclusion[..., None], xs, ys)
        alpha = jnp.maximum(alpha, dis)
    out = cur * alpha + hist * (1.0 - alpha)
    blur = (jnp.roll(out, 1, 0) + jnp.roll(out, -1, 0) +
            jnp.roll(out, 1, 1) + jnp.roll(out, -1, 1)) * 0.25
    return jnp.maximum(out + (out - blur) * cfg.sharpness, 0.0)
