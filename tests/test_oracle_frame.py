"""Engine vs INDEPENDENT NumPy oracle (the honest stand-in for the
BASELINE "SSIM >= 0.99 vs Vulkan reference" gate — VERDICT item #6).

Config #1 (flat path: frustum cull + visbuffer + deferred PBR + tonemap)
and config #2 (meshlet GPU-driven path, LOD0) are both gated."""

import numpy as np
import pytest

from test_golden import ssim  # same SSIM metric as the golden tests


def _scene(w, h):
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    cam = Camera(width=w, height=h)
    cam.position = np.array([-15.0, 4.0, 3.0])
    cam.look_at(np.array([10.0, 2.0, -2.0]))
    return b, cam


W, H = 320, 180


@pytest.fixture(scope="module")
def oracle_image():
    from oracle_frame import render_oracle

    b, cam = _scene(W, H)
    return render_oracle(b, cam, W, H, exposure=1.0)


def test_flat_path_matches_oracle(oracle_image):
    from chord_tpu.renderer.deferred import DeferredRenderer, RendererConfig
    from chord_tpu.utils.cvar import cvars

    b, cam = _scene(W, H)
    pools = b.build_pools()
    inst = b.frame_instances(cam)
    cvars.set("r.exposure.fix", 1.0)
    try:
        r = DeferredRenderer(RendererConfig(
            width=W, height=H, pair_capacity=8192, big_capacity=256,
            enable_bloom=False, enable_tsr=False, interpret=True))
        img, stats = r.render(pools, inst, cam.view_uniform(0))
    finally:
        cvars.set("r.exposure.fix", -1.0)
    assert int(np.asarray(stats["bin_overflow"])) == 0
    s = ssim(np.asarray(img), oracle_image)
    assert s >= 0.99, f"flat-path SSIM vs independent oracle: {s:.4f}"


def test_meshlet_path_matches_oracle(oracle_image):
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.cvar import cvars

    b, cam = _scene(W, H)
    pools = build_meshlet_pools(b, nanite=False)   # LOD0: same geometry
    inst = b.frame_instances(cam)
    cvars.set("r.exposure.fix", 1.0)
    try:
        r = MeshletRenderer(
            RendererConfig(width=W, height=H, pair_capacity=8192,
                           big_capacity=256, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=1024, occlusion=True))
        img, stats = r.render(pools, inst, cam.view_uniform(0))
    finally:
        cvars.set("r.exposure.fix", -1.0)
    assert int(np.asarray(stats["bin_overflow"])) == 0
    s = ssim(np.asarray(img), oracle_image)
    assert s >= 0.99, f"meshlet-path SSIM vs independent oracle: {s:.4f}"
