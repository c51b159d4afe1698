"""Golden-image SSIM tests (SURVEY §4: "golden-image/SSIM tests per pass
against a slow reference"; BASELINE gate is SSIM >= 0.99 vs reference).

The goldens are rendered by THIS engine on the CPU interpreter at fixed
seeds/config and committed; the test re-renders and compares SSIM. This
catches unintended regressions in any pass (raster, cull, LOD, shading,
post). Regenerate deliberately with:

    CHORD_REGEN_GOLDENS=1 python -m pytest tests/test_golden.py
"""

import os
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens"
GOLDEN_DIR.mkdir(exist_ok=True)


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Global SSIM on grayscale float images (the broad-stroke gate;
    windowed_ssim below catches localized artifacts this misses)."""
    a = a.astype(np.float64).mean(-1) / 255.0
    b = b.astype(np.float64).mean(-1) / 255.0
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2)) /
                 ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


def windowed_ssim(a: np.ndarray, b: np.ndarray, win: int = 16
                  ) -> float:
    """MINIMUM per-window SSIM over a win x win grid: a localized
    artifact of a few hundred pixels tanks its window's score instead of
    vanishing into the global statistics (VERDICT r2 weak #7). Windows
    are variance-stabilized by the standard C1/C2 constants, so flat sky
    windows compare ~1 unless they actually differ."""
    ga = a.astype(np.float64).mean(-1) / 255.0
    gb = b.astype(np.float64).mean(-1) / 255.0
    h, w = ga.shape
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    worst = 1.0
    for y in range(0, h - win + 1, win):
        for x in range(0, w - win + 1, win):
            wa = ga[y:y + win, x:x + win]
            wb = gb[y:y + win, x:x + win]
            mu_a, mu_b = wa.mean(), wb.mean()
            cov = ((wa - mu_a) * (wb - mu_b)).mean()
            s = (((2 * mu_a * mu_b + c1) * (2 * cov + c2)) /
                 ((mu_a ** 2 + mu_b ** 2 + c1) *
                  (wa.var() + wb.var() + c2)))
            worst = min(worst, float(s))
    return worst


def _render_scene(mode: str) -> np.ndarray:
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=160, height=96)
    cam.position = np.array([-15.0, 4.0, 3.0])
    cam.look_at(np.array([10.0, 2.0, -2.0]))
    inst = b.frame_instances(cam)
    r = MeshletRenderer(
        RendererConfig(width=160, height=96, pair_capacity=4096,
                       big_capacity=128, interpret=True,
                       enable_bloom=(mode == "full"),
                       enable_tsr=False),
        MeshletFrameConfig(draw_capacity=512,
                           occlusion=(mode == "full"),
                           shadows=(mode == "full"),
                           debug_mode="normal" if mode == "normal" else
                           "none"))
    img, stats = r.render(pools, inst, cam.view_uniform(0))
    assert int(np.asarray(stats["bin_overflow"])) == 0
    return np.asarray(img)


@pytest.mark.parametrize("mode", [
    "basic", "normal",
    pytest.param("full", marks=pytest.mark.slow)])
@pytest.mark.slow
def test_golden(mode):
    from PIL import Image

    img = _render_scene(mode)
    path = GOLDEN_DIR / f"sponza_{mode}_160x96.png"
    if os.environ.get("CHORD_REGEN_GOLDENS") or not path.exists():
        Image.fromarray(img).save(path)
        if not os.environ.get("CHORD_REGEN_GOLDENS"):
            pytest.skip(f"golden created: {path}")
        return
    golden = np.asarray(Image.open(path))
    s = ssim(img, golden)
    # mean abs error as a second gate (SSIM alone can miss color shifts)
    mae = np.abs(img.astype(int) - golden.astype(int)).mean()
    assert s >= 0.99, f"SSIM {s:.4f} < 0.99 for {mode}"
    assert mae < 2.0, f"MAE {mae:.2f} too high for {mode}"
    # localized gate: the WORST 16x16 window must also match (a small
    # artifact cannot hide in the global statistics)
    ws = windowed_ssim(img, golden)
    assert ws >= 0.95, f"worst-window SSIM {ws:.4f} < 0.95 for {mode}"
