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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_bucket_routing_matches_oracle():
    """Masked punch-through + blend forward layer vs the independent
    oracle (pipeline_filter bucket routing, single-layer semantics):
    a solid masked pane shades opaque-style, a failing masked pane
    vanishes, a translucent pane composites src-alpha over the lit
    scene."""
    from chord_tpu.asset.procedural import make_box, make_plane
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.rhi.scene_arrays import MaterialData, SceneBuilder
    from chord_tpu.utils import math as cmath
    from chord_tpu.utils.camera import Camera
    from chord_tpu.utils.cvar import cvars
    from oracle_frame import render_oracle

    b = SceneBuilder()
    plane = b.add_mesh(make_plane(1.0, segments=2))
    box = b.add_mesh(make_box(extents=(2.0, 2.0, 2.0)))
    gray = b.add_material(MaterialData(base_color=(0.6, 0.6, 0.6, 1.0),
                                       roughness=0.8))
    red = b.add_material(MaterialData(base_color=(0.6, 0.2, 0.2, 1.0),
                                      roughness=0.5, metallic=0.3))
    m_solid = b.add_material(MaterialData(
        base_color=(0.2, 0.5, 0.2, 0.9), alpha_mode="mask",
        alpha_cutoff=0.5, roughness=0.7))
    m_clear = b.add_material(MaterialData(
        base_color=(0.5, 0.5, 0.1, 0.1), alpha_mode="mask",
        alpha_cutoff=0.5, roughness=0.7))
    glass = b.add_material(MaterialData(
        base_color=(0.2, 0.4, 0.7, 0.45), alpha_mode="blend",
        roughness=0.1))

    b.add_instance(plane, gray, cmath.compose_trs((0, 0, 0),
                                                  scale=(20, 1, 20)))
    b.add_instance(box, red, cmath.compose_trs((0, 1.0, -4.0)))
    # panes tilted toward the camera so their front faces are seen
    # (quaternion: -60 deg about X, glTF xyzw)
    q = (np.sin(np.deg2rad(-30.0)), 0.0, 0.0, np.cos(np.deg2rad(-30.0)))
    b.add_instance(plane, m_solid, cmath.compose_trs(
        (-4.0, 2.0, 0.0), rotation_quat=q, scale=(2, 1, 2)))
    b.add_instance(plane, m_clear, cmath.compose_trs(
        (0.0, 2.0, 0.0), rotation_quat=q, scale=(2, 1, 2)))
    b.add_instance(plane, glass, cmath.compose_trs(
        (4.0, 2.0, 0.0), rotation_quat=q, scale=(2, 1, 2)))

    w, h = 320, 180
    cam = Camera(width=w, height=h)
    cam.position = np.array([0.0, 5.0, 12.0])
    cam.look_at(np.array([0.0, 1.0, 0.0]))

    oracle = render_oracle(b, cam, w, h, exposure=1.0)

    pools = build_meshlet_pools(b, nanite=False)
    inst = b.frame_instances(cam)
    cvars.set("r.exposure.fix", 1.0)
    try:
        r = MeshletRenderer(
            RendererConfig(width=w, height=h, pair_capacity=8192,
                           big_capacity=256, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=1024, occlusion=True,
                               alpha_masked=True, alpha_blend=True))
        img, stats = r.render(pools, inst, cam.view_uniform(0))
    finally:
        cvars.set("r.exposure.fix", -1.0)
    assert int(np.asarray(stats["bin_overflow"])) == 0
    s = ssim(np.asarray(img), oracle)
    assert s >= 0.985, f"bucket-routing SSIM vs oracle: {s:.4f}"


@pytest.mark.slow
def test_shadowed_frame_matches_oracle():
    """Hard-shadow config vs the oracle's brute-force sun ray-cast
    (VERDICT item #6 — oracle shadow term): cascade fitting, shadow
    matrices, depth raster and bias must all be right for the shadow
    shapes to land where ground-truth rays say."""
    from chord_tpu.ops.shadow import ShadowConfig
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.cvar import cvars
    from oracle_frame import render_oracle

    w, h = 256, 144
    b, cam = _scene(w, h)
    oracle = render_oracle(b, cam, w, h, exposure=1.0, shadows=True)

    pools = build_meshlet_pools(b, nanite=False)
    inst = b.frame_instances(cam)
    # near-hard shadows: tiny sun disk, minimal PCF, full-res eval, no
    # temporal cache (single frame), high-res single-purpose cascades
    scfg = ShadowConfig(cascade_count=2, resolution=2048,
                        max_distance=60.0, light_size_world=0.02,
                        pcf_radius_px=0.75, eval_res_div=1,
                        temporal=False, temporal_phase=1)
    cvars.set("r.exposure.fix", 1.0)
    try:
        r = MeshletRenderer(
            RendererConfig(width=w, height=h, pair_capacity=8192,
                           big_capacity=256, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=1024, occlusion=False,
                               shadows=True, shadow_cfg=scfg,
                               shadow_draw_capacity=1024))
        img, stats = r.render(pools, inst, cam.view_uniform(0))
    finally:
        cvars.set("r.exposure.fix", -1.0)
    assert int(np.asarray(stats["bin_overflow"])) == 0
    s = ssim(np.asarray(img), oracle)
    # shadow-map discretization vs exact rays costs a little SSIM at the
    # penumbra-free edges; systematic errors (flipped cascade, wrong
    # bias sign, broken matrix) land far below this gate
    assert s >= 0.97, f"shadowed SSIM vs ray-cast oracle: {s:.4f}"


@pytest.mark.slow
def test_shadow_gate_under_camera_motion():
    """VERDICT r2 weak #6: the temporal shadow scheme (round-robin
    cascade refresh + phase-amortized PCSS + reprojected mask) gated
    UNDER MOTION. The camera translates for several frames; the ray-cast
    oracle renders the FINAL pose; the engine's final frame — built from
    up-to-N-frame-stale cascades and a motion-reprojected mask — must
    still land the shadows where ground-truth rays say."""
    from chord_tpu.ops.shadow import ShadowConfig
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.cvar import cvars
    from oracle_frame import render_oracle

    w, h = 256, 144
    b, cam = _scene(w, h)
    pools = build_meshlet_pools(b, nanite=False)

    # production-shaped temporal config (NOT the single-frame special
    # case): cached cascades, quarter-res phased PCSS, temporal mask
    scfg = ShadowConfig(cascade_count=2, resolution=1024,
                        max_distance=60.0, light_size_world=0.02,
                        pcf_radius_px=0.75, eval_res_div=2,
                        temporal=True, temporal_phase=2)
    cvars.set("r.exposure.fix", 1.0)
    try:
        r = MeshletRenderer(
            RendererConfig(width=w, height=h, pair_capacity=8192,
                           big_capacity=256, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=1024, occlusion=False,
                               shadows=True, shadow_cfg=scfg,
                               shadow_draw_capacity=1024))
        img = None
        for i in range(6):
            # ~0.35 world units/frame of lateral+forward motion
            cam.position = np.array([-15.0 + 0.25 * i, 4.0,
                                     3.0 - 0.25 * i])
            cam.look_at(np.array([10.0, 2.0, -2.0]))
            img, stats = r.render(pools, b.frame_instances(cam),
                                  cam.view_uniform(i))
    finally:
        cvars.set("r.exposure.fix", -1.0)
    assert int(np.asarray(stats["bin_overflow"])) == 0
    oracle = render_oracle(b, cam, w, h, exposure=1.0, shadows=True)
    s = ssim(np.asarray(img), oracle)
    # looser than the static gate: stale cascades + the phased temporal
    # mask trade exactness for cost; gross failures (shadows dragged by
    # reprojection, missed refresh, wrong matrices-for-map pairing)
    # land far below
    assert s >= 0.93, f"moving-camera shadowed SSIM: {s:.4f}"
