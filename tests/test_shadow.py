"""Cascaded shadow maps + PCSS (reference: pcss.hlsl, cascade_setup.hlsl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chord_tpu.asset.procedural import build_sponza_like
from chord_tpu.ops.shadow import ShadowConfig, evaluate_shadow, fit_cascades
from chord_tpu.renderer.deferred import RendererConfig
from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                              MeshletRenderer)
from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
from chord_tpu.utils.camera import Camera


def test_fit_cascades_monotonic():
    cfg = ShadowConfig(cascade_count=4, resolution=256)
    mats, splits = fit_cascades(np.array([0.0, 0.0, -1.0]),
                                np.array([0.3, 0.8, 0.5]),
                                np.radians(60.0), 16 / 9, cfg)
    assert mats.shape == (4, 4, 4)
    assert np.all(np.diff(splits) > 0), "splits must increase"
    # each cascade's matrix maps the slice center near the light NDC origin
    for i in range(4):
        d = 0.5 * (splits[i] + splits[i + 1])
        p = np.array([0.0, 0.0, -d, 1.0], np.float64)  # on the view axis
        clip = p @ mats[i].astype(np.float64)
        assert abs(clip[0]) < 1.0 and abs(clip[1]) < 1.0, \
            f"cascade {i} slice center off-map: {clip}"
        assert 0.0 < clip[2] <= 1.0, f"depth out of range {clip[2]}"


def test_shadow_occluder_blocks_sun():
    """A floor point under an occluder must be dark; an open point lit."""
    cfg = ShadowConfig(cascade_count=1, resolution=256, max_distance=40.0,
                       light_size_world=0.05)   # hard-ish shadow for test
    sun = np.array([0.0, 1.0, 0.0])   # straight down sun for simplicity
    mats, splits = fit_cascades(np.array([0.0, 0.0, -1.0]), sun,
                                np.radians(60.0), 1.0, cfg)
    m = jnp.asarray(mats)

    # Build a synthetic shadow map: occluder quad above y=0 plane covering
    # x,z in [-5,0] at height y=5. Project its depth into the map.
    r = cfg.resolution
    maps = np.zeros((1, r, r), np.float32)
    # rasterize the occluder analytically: for every texel compute its
    # world xz, if inside the quad store the quad's light-space depth
    inv = np.linalg.inv(mats[0].astype(np.float64))
    for ty in range(r):
        for tx in range(0, r, 4):      # stride 4 to keep the test fast
            ndc = np.array([(tx + 0.5) / r * 2 - 1,
                            0.5 - (ty + 0.5) / r, 0.0, 1.0])
    # instead of per-texel loop (slow), project quad corners to texels:
    quad = np.array([[-5.0, 5.0, -5.0], [0.0, 5.0, -5.0],
                     [0.0, 5.0, 0.0], [-5.0, 5.0, 0.0]])
    clip = np.concatenate([quad, np.ones((4, 1))], 1) @ mats[0].astype(np.float64)
    uv = np.stack([(clip[:, 0] * 0.5 + 0.5) * r,
                   (0.5 - clip[:, 1] * 0.5) * r], 1)
    z = clip[:, 2].mean()
    x0, x1 = int(uv[:, 0].min()), int(np.ceil(uv[:, 0].max()))
    y0, y1 = int(uv[:, 1].min()), int(np.ceil(uv[:, 1].max()))
    maps[0, max(y0, 0):y1, max(x0, 0):x1] = z

    pos = jnp.asarray(np.array([
        [[-2.5, 0.0, -2.5], [10.0, 0.0, 10.0]],
    ], np.float32))                                   # (1,2,3)
    nrm = jnp.asarray(np.tile([0.0, 1.0, 0.0], (1, 2, 1)).astype(np.float32))
    vis = evaluate_shadow(pos, nrm, jnp.asarray(sun, jnp.float32),
                          jnp.asarray(maps), m, cfg)
    vis = np.asarray(vis)
    assert vis[0, 0] < 0.2, f"under occluder should be dark, got {vis[0,0]}"
    assert vis[0, 1] > 0.9, f"open point should be lit, got {vis[0,1]}"


@pytest.mark.slow
def test_meshlet_frame_with_shadows():
    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=128, height=64)
    cam.position = np.array([-15.0, 4.0, 0.0])
    cam.look_at(np.array([10.0, 2.0, 0.0]))
    inst = b.frame_instances(cam)

    r = MeshletRenderer(
        RendererConfig(width=128, height=64, pair_capacity=4096,
                       big_capacity=128, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=1024, occlusion=False,
                           shadows=True,
                           shadow_cfg=ShadowConfig(cascade_count=2,
                                                   resolution=256,
                                                   pcss_blocker_samples=4,
                                                   pcss_pcf_samples=4),
                           shadow_draw_capacity=1024))
    img, stats = r.render(pools, inst, cam.view_uniform(0))
    img = np.asarray(img)
    assert img.std() > 8.0
    assert int(np.asarray(stats["bin_overflow"])) == 0
    # phased eval keeps the mask bounded + finite
    m = np.asarray(r.history.shadow_mask)
    assert np.isfinite(m).all() and m.min() >= 0.0 and m.max() <= 1.0


@pytest.mark.slow
def test_pipelined_shadow_converges_to_direct():
    """ShadowConfig.pipelined consumes the PCSS eval one frame late (the
    axon worker-fault workaround), but the MASK RECURSION itself is
    synchronized: service i blends q(fc=i) into the mask exactly like
    the direct frame i does, so history.shadow_mask after N frames must
    match the direct run after the SAME N frames (what lags one frame
    is only the mask the image consumes). The phase-amortized PCSS
    (ShadowConfig.temporal_phase) makes the mask phase-CYCLIC — masks
    from different frame counts sit at different points of the ph^2
    cycle and differ at penumbra texels by design, which is why this
    compares equal counts (an earlier revision compared N vs N+1 and
    went stale when the phased eval landed)."""
    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=96, height=48)
    cam.position = np.array([-15.0, 4.0, 0.0])
    cam.look_at(np.array([10.0, 2.0, 0.0]))
    inst = b.frame_instances(cam)

    def run(pipelined, n_frames=12):
        # temporal_alpha lowered so the one-update lag of the pipelined
        # path decays within the test budget (error ~ a0^(K-1)(1-a0))
        scfg = ShadowConfig(cascade_count=2, resolution=256,
                            pcss_blocker_samples=4, pcss_pcf_samples=4,
                            temporal=True, jitter=False,
                            temporal_alpha=0.4,
                            pipelined=pipelined)
        r = MeshletRenderer(
            RendererConfig(width=96, height=48, pair_capacity=4096,
                           big_capacity=128, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=1024, shadows=True,
                               shadow_cfg=scfg,
                               shadow_draw_capacity=1024))
        for i in range(n_frames):
            r.render(pools, inst, cam.view_uniform(i))
        return r

    r_dir = run(False, n_frames=11)
    r_pipe = run(True, n_frames=11)   # same count: same phase-cycle point
    m_dir = np.asarray(r_dir.history.shadow_mask)
    m_pipe = np.asarray(r_pipe.history.shadow_mask)
    # the one-frame-delayed pipeline reproduces the direct mask
    err = np.abs(m_pipe - m_dir).mean()
    assert err < 0.01, f"pipelined mask diverged: mean|d|={err}"
    assert (m_pipe < 0.3).any() and (m_pipe > 0.9).any()


@pytest.mark.slow
def test_temporal_shadow_mask_accumulates():
    """Static scene + static view: the temporal mask converges (frame 2
    matches frame 1 closely) and stays in [0,1]; history carries the
    eval-res mask."""
    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=96, height=48)
    cam.position = np.array([-15.0, 4.0, 0.0])
    cam.look_at(np.array([10.0, 2.0, 0.0]))
    inst = b.frame_instances(cam)

    scfg = ShadowConfig(cascade_count=2, resolution=256,
                        pcss_blocker_samples=4, pcss_pcf_samples=4,
                        temporal=True, temporal_phase=1, jitter=False)
    r = MeshletRenderer(
        RendererConfig(width=96, height=48, pair_capacity=4096,
                       big_capacity=128, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=1024, shadows=True,
                           shadow_cfg=scfg, shadow_draw_capacity=1024))
    # warm past the depth-range-fit transient: the device cascade refit
    # (shadow.fit_cascades_device) consumes LAST frame's depth range and
    # cascades refresh round-robin, so matrices converge only after
    # cascade_count+1 frames on a static view
    for i in range(scfg.cascade_count + 1):
        r.render(pools, inst, cam.view_uniform(i))
    img1, _ = r.render(pools, inst, cam.view_uniform(3))
    mask1 = np.asarray(r.history.shadow_mask)
    img2, _ = r.render(pools, inst, cam.view_uniform(4))
    mask2 = np.asarray(r.history.shadow_mask)

    d_ = scfg.eval_res_div
    assert mask1.shape == (48 // d_, 96 // d_)   # eval-res mask in history
    assert np.isfinite(mask2).all()
    assert mask2.min() >= 0.0 and mask2.max() <= 1.0
    # static view: the blended mask must not drift
    assert np.abs(mask2 - mask1).mean() < 0.05
    # and it must actually contain shadowed AND lit regions
    assert (mask1 < 0.3).any() and (mask1 > 0.9).any()
    # frames visually consistent
    d = np.abs(np.asarray(img1).astype(int) - np.asarray(img2).astype(int))
    assert d.mean() < 6.0

    # with jitter ON, the rotating disk samples new directions each frame
    # and the accumulator must CONVERGE: late deltas < first delta
    r2 = MeshletRenderer(
        RendererConfig(width=96, height=48, pair_capacity=4096,
                       big_capacity=128, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=1024, shadows=True,
                           shadow_cfg=scfg._replace(jitter=True),
                           shadow_draw_capacity=1024))
    masks = []
    for i in range(5):
        r2.render(pools, inst, cam.view_uniform(i))
        masks.append(np.asarray(r2.history.shadow_mask))
    d01 = np.abs(masks[1] - masks[0]).mean()
    d34 = np.abs(masks[4] - masks[3]).mean()
    assert d34 < d01, f"no convergence: {d34} !< {d01}"


def _occluder_setup(res=256, casc=1):
    """Straight-down sun, analytic occluder quad at y=5 over x,z in
    [-5,0] splatted into every cascade (the test_shadow_occluder scheme)."""
    cfg = ShadowConfig(cascade_count=casc, resolution=res,
                       max_distance=40.0, light_size_world=0.5)
    sun = np.array([0.0, 1.0, 0.0])
    mats, _ = fit_cascades(np.array([0.0, 0.0, -1.0]), sun,
                           np.radians(60.0), 1.0, cfg)
    maps = np.zeros((casc, res, res), np.float32)
    quad = np.array([[-5.0, 5.0, -5.0], [0.0, 5.0, -5.0],
                     [0.0, 5.0, 0.0], [-5.0, 5.0, 0.0]])
    for c in range(casc):
        clip = (np.concatenate([quad, np.ones((4, 1))], 1)
                @ mats[c].astype(np.float64))
        uv = np.stack([(clip[:, 0] * 0.5 + 0.5) * res,
                       (0.5 - clip[:, 1] * 0.5) * res], 1)
        z = clip[:, 2].mean()
        x0, x1 = int(uv[:, 0].min()), int(np.ceil(uv[:, 0].max()))
        y0, y1 = int(uv[:, 1].min()), int(np.ceil(uv[:, 1].max()))
        maps[c, max(y0, 0):y1, max(x0, 0):x1] = z
    return cfg, sun, jnp.asarray(mats), jnp.asarray(maps)


def _ground_grid(h, w, span):
    xs = np.linspace(-span, span, w)
    zs = np.linspace(-span, span, h)
    pos = np.zeros((h, w, 3), np.float32)
    pos[..., 0] = xs[None, :]
    pos[..., 2] = zs[:, None]
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[..., 1] = 1.0
    return jnp.asarray(pos), jnp.asarray(nrm)


def test_pcss_pallas_kernel_matches_gather_path():
    """The Pallas tile kernel (ops/shadow_kernel.py) must be tap-exact
    against evaluate_shadow when every tile selects one cascade at
    level 0 (the common case), and geometrically consistent (same
    shadowed set) when tiles decimate or span cascades."""
    from chord_tpu.ops.shadow_kernel import evaluate_shadow_pallas

    rng = np.random.default_rng(0)
    # exact regime: single cascade, receiver extent fits level 0
    cfg, sun, mats, maps = _occluder_setup(casc=1)
    pos, nrm = _ground_grid(64, 96, 7.0)
    noise = jnp.asarray(rng.uniform(0, 1, (64, 96)).astype(np.float32))
    a = np.asarray(evaluate_shadow(pos, nrm, jnp.asarray(sun, jnp.float32),
                                   maps, mats, cfg, noise=noise))
    b = np.asarray(evaluate_shadow_pallas(
        pos, nrm, jnp.asarray(sun, jnp.float32), maps, mats, cfg,
        noise=noise, interpret=True))
    assert (a < 0.5).mean() > 0.02, "test scene must cast shadow"
    np.testing.assert_allclose(b, a, atol=1e-5)

    # decimated regime (wide extent -> coarser pyramid level): the
    # shadowed sets must agree except at penumbra boundaries
    pos, nrm = _ground_grid(64, 96, 30.0)
    noise = jnp.asarray(rng.uniform(0, 1, (64, 96)).astype(np.float32))
    a = np.asarray(evaluate_shadow(pos, nrm, jnp.asarray(sun, jnp.float32),
                                   maps, mats, cfg, noise=noise))
    b = np.asarray(evaluate_shadow_pallas(
        pos, nrm, jnp.asarray(sun, jnp.float32), maps, mats, cfg,
        noise=noise, interpret=True))
    assert np.abs(a - b).mean() < 0.01
    assert abs((a < 0.5).mean() - (b < 0.5).mean()) < 0.01

    # multi-cascade: per-tile cascade choice may differ from per-pixel
    # (seam tiles take the containing coarser cascade) but the shadow
    # set must match closely
    cfg, sun, mats, maps = _occluder_setup(casc=4)
    pos, nrm = _ground_grid(64, 96, 7.0)
    a = np.asarray(evaluate_shadow(pos, nrm, jnp.asarray(sun, jnp.float32),
                                   maps, mats, cfg))
    b = np.asarray(evaluate_shadow_pallas(
        pos, nrm, jnp.asarray(sun, jnp.float32), maps, mats, cfg,
        interpret=True))
    assert abs((a < 0.5).mean() - (b < 0.5).mean()) < 0.03
    assert np.abs(a - b).mean() < 0.05


def test_evaluate_shadow_auto_dispatch():
    """eval_kernel=True routes through the Pallas kernel on CPU
    (interpret mode) and preserves the evaluate_shadow contract."""
    from chord_tpu.ops.shadow import evaluate_shadow_auto

    cfg, sun, mats, maps = _occluder_setup(casc=1)
    pos, nrm = _ground_grid(32, 64, 7.0)
    a = np.asarray(evaluate_shadow_auto(
        pos, nrm, jnp.asarray(sun, jnp.float32), maps, mats,
        cfg._replace(eval_kernel=True)))
    ref = np.asarray(evaluate_shadow(
        pos, nrm, jnp.asarray(sun, jnp.float32), maps, mats, cfg))
    np.testing.assert_allclose(a, ref, atol=1e-5)
    assert (a < 0.2).any() and (a > 0.9).any()


def test_interleaved_gradient_noise():
    from chord_tpu.ops.bluenoise import interleaved_gradient_noise

    n0 = np.asarray(interleaved_gradient_noise(32, 64, 0))
    n1 = np.asarray(interleaved_gradient_noise(32, 64, 1))
    assert n0.shape == (32, 64)
    assert n0.min() >= 0.0 and n0.max() < 1.0
    # roughly uniform over [0,1)
    assert abs(n0.mean() - 0.5) < 0.05
    # temporally decorrelated
    assert np.abs(n0 - n1).mean() > 0.15
    # spatially high-frequency: neighbors far apart on average ("blue")
    assert np.abs(n0 - np.roll(n0, 1, axis=1)).mean() > 0.25
    # frame wraps at 64 phases
    n64 = np.asarray(interleaved_gradient_noise(32, 64, 64))
    np.testing.assert_allclose(n0, n64)


def test_pcss_jitter_rotates_disk():
    """Rotated-disk eval must differ per pixel but agree on fully lit /
    fully blocked regions."""
    cfg = ShadowConfig(cascade_count=1, resolution=128,
                       pcss_blocker_samples=4, pcss_pcf_samples=4)
    sun = np.array([0.0, 1.0, 0.0])
    mats, splits = fit_cascades(np.array([0.0, 0.0, -1.0]), sun,
                                np.radians(60.0), 1.0, cfg)
    maps = jnp.zeros((1, 128, 128))          # nothing blocks
    pos = jnp.zeros((4, 8, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (4, 8, 3))
    from chord_tpu.ops.bluenoise import interleaved_gradient_noise
    noise = interleaved_gradient_noise(4, 8, 3)
    a = evaluate_shadow(pos, nrm, jnp.asarray(sun, jnp.float32), maps,
                        jnp.asarray(mats), cfg)
    b = evaluate_shadow(pos, nrm, jnp.asarray(sun, jnp.float32), maps,
                        jnp.asarray(mats), cfg, noise=noise)
    # open scene: both fully lit regardless of rotation
    np.testing.assert_allclose(np.asarray(a), 1.0)
    np.testing.assert_allclose(np.asarray(b), 1.0)


def test_fit_cascades_device_matches_host_at_full_range():
    """The device fit at the full (0.1, max_distance) range must agree
    with the host frustum-only fit (same split scheme / bounding sphere /
    texel snap) to within a texel. scroll=False: the scrolled-cache mode
    intentionally changes the z convention (6r range + quantized eye z)
    — its own contract is test_fit_scroll_rotation_is_texel_translation."""
    from chord_tpu.ops.shadow import fit_cascades_device

    cfg = ShadowConfig(cascade_count=4, resolution=256, scroll=False)
    fwd = np.array([0.2, -0.1, -1.0])
    fwd = fwd / np.linalg.norm(fwd)
    sun = np.array([0.3, 0.8, 0.5])
    fovy, aspect = np.radians(60.0), 16 / 9
    host, splits = fit_cascades(fwd, sun, fovy, aspect, cfg)
    tan_y = np.tan(fovy / 2)
    dev, planes = fit_cascades_device(
        jnp.asarray(fwd, jnp.float32),
        jnp.asarray(sun / np.linalg.norm(sun), jnp.float32),
        jnp.float32(tan_y * aspect), jnp.float32(tan_y),
        jnp.asarray([0.1, cfg.max_distance], jnp.float32), cfg)
    dev = np.asarray(dev)
    assert dev.shape == (4, 4, 4) and np.asarray(planes).shape == (4, 6, 4)
    # compare by projecting slice-center points (texel snap may differ by
    # one texel between f32/f64 -> tolerance ~2 texels in NDC)
    for i in range(4):
        d = 0.5 * (splits[i] + splits[i + 1])
        p = np.append(fwd * d, 1.0)
        ch = p @ host[i].astype(np.float64)
        cd = p @ dev[i].astype(np.float64)
        tex_ndc = 2.0 / cfg.resolution
        assert np.abs(ch[:2] - cd[:2]).max() < 3 * tex_ndc, (i, ch, cd)
        assert abs(ch[2] - cd[2]) < 1e-2, (i, ch[2], cd[2])


def test_fit_cascades_device_tight_range_shrinks_texels():
    """A tight valid-depth range must produce smaller cascade radii (the
    whole point of the depth-range fit: shadow texels track geometry)."""
    from chord_tpu.ops.shadow import fit_cascades_device

    cfg = ShadowConfig(cascade_count=4, resolution=256)
    fwd = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    sun = jnp.asarray([0.3, 0.8, 0.5], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    t = jnp.float32(np.tan(np.radians(30.0)))
    full, _ = fit_cascades_device(fwd, sun, t * 16 / 9, t,
                                  jnp.asarray([0.1, 80.0], jnp.float32),
                                  cfg)
    tight, _ = fit_cascades_device(fwd, sun, t * 16 / 9, t,
                                   jnp.asarray([5.0, 12.0], jnp.float32),
                                   cfg)
    # radius_i = 1 / ||mats[i][:3, 0]|| (view rotation is orthonormal, the
    # ortho proj scales column 0 by 1/radius)
    r_full = 1.0 / np.linalg.norm(np.asarray(full)[:, :3, 0], axis=1)
    r_tight = 1.0 / np.linalg.norm(np.asarray(tight)[:, :3, 0], axis=1)
    # the far cascades are where frustum-only fitting wastes texels: the
    # tight fit must shrink them dramatically (the near cascade is
    # naturally larger — it covers [5, ~6] instead of [0.1, ~2])
    assert r_tight[-1] < r_full[-1] * 0.25, (r_tight, r_full)
    assert r_tight[-2] < r_full[-2] * 0.6, (r_tight, r_full)
    # slice centers of the tight range still land on the maps
    for i, d in enumerate([5.5, 7.0, 9.0, 11.5]):
        clip = np.array([0, 0, -d, 1.0]) @ np.asarray(tight)[i]
        assert abs(clip[0]) < 1 and abs(clip[1]) < 1 and 0 < clip[2] <= 1


@pytest.mark.slow   # 63s: two interpret-mode frames
def test_frame_depth_range_history():
    """The frame must record the valid-depth view range of its geometry
    in history.depth_range (reference hzb.hlsl reduce), and the second
    frame's device cascade fit must consume it without breaking shadows."""
    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=128, height=64)
    cam.position = np.array([-15.0, 4.0, 0.0])
    cam.look_at(np.array([10.0, 2.0, 0.0]))
    inst = b.frame_instances(cam)
    scfg = ShadowConfig(cascade_count=2, resolution=128, max_distance=60.0,
                        pcss_blocker_samples=4, pcss_pcf_samples=4)
    r = MeshletRenderer(
        RendererConfig(width=128, height=64, pair_capacity=4096,
                       big_capacity=128, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=1024, occlusion=False,
                           shadows=True, shadow_cfg=scfg,
                           shadow_draw_capacity=1024))
    r.render(pools, inst, cam.view_uniform(0))
    near, far = np.asarray(r.history.depth_range)
    assert 0.1 < near < far < 200.0, (near, far)
    # second frame: the device cascade fit consumes the recorded range
    img2, stats2 = r.render(pools, inst, cam.view_uniform(1))
    assert np.asarray(img2).std() > 8.0
    assert int(np.asarray(stats2["bin_overflow"])) == 0
    near2, far2 = np.asarray(r.history.depth_range)
    assert 0.1 < near2 < far2 < 200.0


def test_fit_scroll_rotation_is_texel_translation():
    """The scrolled-cache contract (ShadowConfig.scroll,
    meshlet_frame.render_shadow_cascade scroll_plan): under camera
    ROTATION with a static sun, consecutive stable fits must differ by
    a pure integer-texel light-space translation — identical basis and
    scale rows, identical z row (the radius/2-quantized eye z), and x/y
    NDC deltas that land on the texel grid. This is what lets a refresh
    roll the cached map and raster only the exposed edge strips."""
    import jax.numpy as jnp

    from chord_tpu.ops.shadow import fit_cascades_device

    cfg = ShadowConfig(cascade_count=4, resolution=512, scroll=True)
    sun = np.array([0.3, 0.8, 0.5])
    sun = sun / np.linalg.norm(sun)
    tan_y = np.tan(np.radians(60.0) / 2)
    zr = jnp.asarray([0.0, 1e9], jnp.float32)

    def fit(yaw_deg):
        fwd = np.array([np.cos(np.radians(yaw_deg)), -0.15,
                        np.sin(np.radians(yaw_deg))])
        fwd = fwd / np.linalg.norm(fwd)
        m, _ = fit_cascades_device(
            jnp.asarray(fwd, jnp.float32), jnp.asarray(sun, jnp.float32),
            jnp.float32(tan_y * 16 / 9), jnp.float32(tan_y), zr, cfg)
        return np.asarray(m)

    m0 = fit(30.0)
    m1 = fit(32.5)     # a ~bench-sized per-frame rotation
    r = cfg.resolution
    scrolled = 0
    for i in range(4):
        # basis + scale rows bit-stable to f32 rounding
        assert np.abs(m1[i][:3, :] - m0[i][:3, :]).max() < 1e-6, i
        dz = abs(m1[i][3, 2] - m0[i][3, 2])
        dx = (m1[i][3, 0] - m0[i][3, 0]) * (r * 0.5)
        dy = (m0[i][3, 1] - m1[i][3, 1]) * (r * 0.5)
        if dz < 1e-5:
            # z quantum did not step -> x/y must be integer texels
            assert abs(dx - round(dx)) < 2e-2, (i, dx)
            assert abs(dy - round(dy)) < 2e-2, (i, dy)
            scrolled += 1
    # the quantizer must not step on every cascade at once for a small
    # rotation — most cascades scroll
    assert scrolled >= 3, scrolled
