"""World radiance cache GI: injection, propagation, irradiance, bleeding
(reference: renderer/gi/screen_probe_gather.cpp world cache + SHPropagate)."""

import pytest
import jax.numpy as jnp
import numpy as np

from chord_tpu.ops import gi


def _cfg():
    return gi.GIConfig(cascades=2, probe_dim=8, base_voxel=1.0,
                       temporal_alpha=0.5, trilinear=True)


def test_inject_and_sample_roundtrip():
    cfg = _cfg()
    cache = jnp.zeros(gi.sh_size(cfg))
    cam = jnp.zeros(3)
    # a bright red emitting floor patch at y=0 facing up
    n = 64
    rng = np.random.default_rng(0)
    pos = jnp.asarray(np.stack([rng.uniform(-2, 2, n),
                                np.zeros(n),
                                rng.uniform(-2, 2, n)], -1), jnp.float32)
    rad = jnp.tile(jnp.asarray([4.0, 0.2, 0.1]), (n, 1))
    nrm = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
    valid = jnp.ones(n, bool)
    for _ in range(4):
        cache = gi.inject_surfels(cache, pos, rad, nrm, valid, cam, cfg)
    cache = gi.propagate(cache, cfg)

    # sample a point above the floor looking down -> red-dominant irradiance
    p = jnp.asarray([[0.0, 1.0, 0.0]])
    nn = jnp.asarray([[0.0, -1.0, 0.0]])     # facing the lit floor
    irr, conf = gi.sample_irradiance(cache, p, nn, cam, cfg)
    irr = np.asarray(irr)[0]
    assert float(conf[0]) > 0.0
    assert irr[0] > irr[1] and irr[0] > irr[2], f"not red: {irr}"
    assert irr[0] > 0.0

    # nearest-probe mode (the fast production default) agrees on hue when
    # sampling right at a lit probe
    cfg_n = cfg._replace(trilinear=False)
    p0 = jnp.asarray([[0.0, 0.4, 0.0]])   # nearest probe row y=0 (lit)
    irr_n, conf_n = gi.sample_irradiance(cache, p0, nn, cam, cfg_n)
    irr_n = np.asarray(irr_n)[0]
    assert float(conf_n[0]) > 0.0
    assert irr_n[0] > irr_n[1]


def test_cache_confidence_zero_when_empty():
    cfg = _cfg()
    cache = jnp.zeros(gi.sh_size(cfg))
    p = jnp.asarray([[0.0, 1.0, 0.0]])
    nn = jnp.asarray([[0.0, -1.0, 0.0]])
    irr, conf = gi.sample_irradiance(cache, p, nn, jnp.zeros(3), cfg)
    assert float(conf[0]) == 0.0
    assert float(np.abs(np.asarray(irr)).max()) == 0.0


def test_propagate_spreads_light():
    cfg = _cfg()
    cache = jnp.zeros(gi.sh_size(cfg))
    # light exactly one probe
    d = cfg.probe_dim
    idx = (d // 2 * d + d // 2) * d + d // 2
    from chord_tpu.ops.gi import NFL
    cache = cache.at[0, idx, 0].set(1.0)
    cache = cache.at[0, idx, NFL].set(1.0)
    out = gi.propagate(cache, cfg)
    lit = np.asarray(out[0, :, NFL] > 0).sum()
    assert lit > 1, "propagation must spread to neighbors"


def test_ssao_corner_darker_than_plane():
    h, w = 64, 128
    # flat floor with a wall at the right edge
    xs = np.linspace(0, 10, w)
    pos = np.zeros((h, w, 3), np.float32)
    nrm = np.zeros((h, w, 3), np.float32)
    pos[..., 0] = xs[None, :]
    pos[..., 2] = np.linspace(0, 5, h)[:, None]
    nrm[..., 1] = 1.0
    # wall: last columns go vertical
    wall = xs > 9.0
    pos[:, wall, 1] = np.linspace(0, 2, h)[:, None]
    nrm[:, wall] = [-1.0, 0.0, 0.0]
    depth = np.full((h, w), 0.5, np.float32)
    cfg = gi.GIConfig()
    ao = np.asarray(gi.ssao(jnp.asarray(depth), jnp.asarray(pos),
                            jnp.asarray(nrm), cfg))
    open_ao = ao[:, 10:40].mean()
    corner_ao = ao[:, int(w * 9 / 10) - 3: int(w * 9 / 10)].mean()
    assert open_ao > corner_ao, f"open {open_ao} corner {corner_ao}"
    assert 0.0 <= ao.min() and ao.max() <= 1.0


def test_inject_jitter_cycles_phase():
    """With jitter on, different frames inject different gbuffer pixels
    (sub-stride detail reaches the cache over time)."""
    import jax.numpy as jnp

    from chord_tpu.ops import gi as gi_ops
    from chord_tpu.ops.shading import GBuffer

    cfg = gi_ops.GIConfig(cascades=1, probe_dim=8, inject_stride=8,
                          inject_round_robin=False, inject_jitter=True,
                          temporal_alpha=1.0)
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w]
    pos = np.stack([xx * 0.1, np.ones_like(xx), yy * 0.1], -1)
    g = GBuffer(valid=jnp.ones((h, w), bool),
                position_tw=jnp.asarray(pos, jnp.float32),
                normal=jnp.broadcast_to(jnp.asarray([0., 1., 0.]),
                                        (h, w, 3)),
                base_color=jnp.zeros((h, w, 3)), metallic=jnp.zeros((h, w)),
                roughness=jnp.ones((h, w)), emissive=jnp.zeros((h, w, 3)),
                uv=jnp.zeros((h, w, 2)), motion=jnp.zeros((h, w, 2)))
    # radiance varies at PIXEL scale: only visible to a moving phase
    lit = jnp.asarray(((xx % 8 == 1) & (yy % 8 == 0)).astype(np.float32)
                      [..., None] * np.array([5.0, 0.0, 0.0]), jnp.float32)
    cache0 = jnp.zeros(gi_ops.sh_size(cfg))
    cam = jnp.zeros(3)
    a = gi_ops.update_cache(cache0, g, lit, cam, cfg,
                            frame_count=jnp.asarray(0))
    # phase j=5 -> ox=5: samples columns 5,13,... (misses the bright px)
    b = gi_ops.update_cache(cache0, g, lit, cam, cfg,
                            frame_count=jnp.asarray(1))
    # some phase difference must show up in the injected energy
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # phase 0 sees no bright pixels (they sit at x%8==1), later phases do
    la, lb = float(jnp.abs(a).sum()), float(jnp.abs(b).sum())
    assert la != lb


@pytest.mark.slow
def test_interior_scene_bounce_light():
    """BASELINE config #4 shape (indoor diffuse GI): in the enclosed
    interior scene lit only through the window, regions with no direct
    sun must gain energy from the GI path, and the bounce near the green
    wall must carry the wall's tint (color bleeding)."""
    import numpy as np

    from chord_tpu.asset.procedural import build_bistro_interior
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera
    from chord_tpu.utils.cvar import cvars

    b = build_bistro_interior(detail=1)
    pools = build_meshlet_pools(b, nanite=False)
    w, h = 160, 96
    cam = Camera(width=w, height=h)
    cam.position = np.array([-6.0, 2.2, 3.6])
    cam.look_at(np.array([6.0, 1.2, -2.0]))
    inst = b.frame_instances(cam)
    # sun shines in through the +x window opening
    sun = np.array([0.85, 0.45, 0.15])
    sun /= np.linalg.norm(sun)

    def render(gi, frames=6):
        r = MeshletRenderer(
            RendererConfig(width=w, height=h, pair_capacity=4096,
                           big_capacity=128, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=512, occlusion=False,
                               shadows=True, gi=gi, gi_mode="probe"))
        cvars.set("r.exposure.fix", 1.0)
        try:
            img = None
            for i in range(frames):
                img, _ = r.render(pools, inst, cam.view_uniform(i),
                                  sun_direction=tuple(sun))
            return np.asarray(img).astype(np.float32)
        finally:
            cvars.set("r.exposure.fix", -1.0)

    off = render(False, frames=1)
    on = render(True)
    assert np.isfinite(on).all()
    # the room away from the window sees no direct sun: the GI path must
    # add substantial energy (measured ~+44/255 mean at this camera)
    gain = on[..., :3].mean() - off[..., :3].mean()
    assert gain > 10.0, f"GI added no energy: mean gain {gain:.2f}"
    # color bleeding: the neutral plaster ceiling next to the RED back
    # wall (top-left of frame at this camera) must gain far more red
    # than green (measured dR~+91 vs dG~+30)
    strip_on = on[: h // 3, : w // 3]
    strip_off = off[: h // 3, : w // 3]
    dr = strip_on[..., 0].mean() - strip_off[..., 0].mean()
    dg = strip_on[..., 1].mean() - strip_off[..., 1].mean()
    assert dr > 20.0, f"no bounce on the back-wall ceiling: dR={dr:.2f}"
    assert dr > 1.5 * dg, \
        f"bounce not red-tinted: dR={dr:.2f} dG={dg:.2f}"


@pytest.mark.slow
def test_gi_default_mode_error_bounded_vs_triangle_exact():
    """VERDICT r2 item 5 gate: on the occlusion-designed interior scene
    (sun through one window — light must not leak through walls), the
    DEFAULT probe trace mode's indirect output must stay close to the
    triangle-exact reference (march + BVH rays over real geometry).
    Calibrated: taps-vs-exact mean abs diff ~0.9/255 at this camera."""
    import numpy as np

    from chord_tpu.asset.procedural import build_bistro_interior
    from chord_tpu.ops.screen_probe import ScreenProbeConfig
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera
    from chord_tpu.utils.cvar import cvars

    b = build_bistro_interior(detail=1)
    pools = build_meshlet_pools(b, nanite=False)
    w, h = 160, 96
    cam = Camera(width=w, height=h)
    cam.position = np.array([-6.0, 2.2, 3.6])
    cam.look_at(np.array([6.0, 1.2, -2.0]))
    inst = b.frame_instances(cam)
    sun = np.array([0.85, 0.45, 0.15])
    sun /= np.linalg.norm(sun)

    def render(mode, rt=False, gran="meshlet", frames=6):
        r = MeshletRenderer(
            RendererConfig(width=w, height=h, pair_capacity=4096,
                           big_capacity=128, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=512, occlusion=False,
                               shadows=True, gi=True, gi_mode="probe",
                               gi_rt=rt, rt_granularity=gran, rt_rays=4,
                               debug_mode="gi",
                               probe_cfg=ScreenProbeConfig(
                                   trace_mode=mode)))
        cvars.set("r.exposure.fix", 1.0)
        try:
            img = None
            for i in range(frames):
                img, _ = r.render(pools, inst, cam.view_uniform(i),
                                  sun_direction=tuple(sun))
            return np.asarray(img).astype(np.float32)
        finally:
            cvars.set("r.exposure.fix", -1.0)

    taps = render("taps")
    exact = render("march", rt=True, gran="triangle")
    mad = np.abs(taps - exact)[..., :3].mean()
    assert mad < 6.0, f"default GI diverges from triangle-exact: {mad:.2f}"
    # both see real energy (not two blank buffers agreeing)
    assert exact[..., :3].mean() > 30.0 and taps[..., :3].mean() > 30.0


def test_rtao_sees_offscreen_occluder():
    """RTAO (gi_rt_ao.hlsl analog) must darken under a big occluder that
    SSAO cannot see (it lives outside the screen-space taps)."""
    import jax.numpy as jnp

    from chord_tpu.ops import rt
    from chord_tpu.ops.gi import GIConfig, rtao

    # one fat sphere hovering above the origin patch
    sph = np.array([[0.0, 3.0, 0.0, 2.0]], np.float32)
    tree = rt.build_bvh_numpy(sph)
    bvh = rt.SceneBVH(
        node_sphere=jnp.asarray(tree["sphere"]),
        node_count=jnp.asarray(tree["count"]),
        node_leaf=jnp.asarray(tree["leaf"]),
        leaf_albedo=jnp.ones((1, 3)), leaf_emissive=jnp.zeros((1, 3)),
        leaf_sphere=jnp.asarray(sph))
    h, w = 8, 16
    pos = np.zeros((h, w, 3), np.float32)
    pos[..., 0] = np.arange(w)[None, :] * 0.2          # under the sphere
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[..., 1] = 1.0                                  # up
    cfg = GIConfig(ao_mode="rtao", rtao_rays=6, ao_radius=4.0)
    ao = np.asarray(rtao(jnp.asarray(pos), jnp.asarray(nrm), bvh, cfg))
    # directly under the sphere (x~0): strongly occluded; far away: open
    assert ao[:, 0].mean() < 0.75, ao[:, 0]
    assert ao[:, -1].mean() > ao[:, 0].mean() + 0.15
    assert np.isfinite(ao).all() and (ao >= 0).all() and (ao <= 1).all()


def test_world_cache_sh3_directionality():
    """The world cache carries SH3 since round 4 (reference
    shader/gi.h:21-29). Gates: (1) radiance evaluated back along the
    injected direction exceeds the L1-representable maximum — only the
    L2 band can get it there; (2) the VERDICT red-wall gate: a probe lit
    by a red wall lights wall-FACING receivers much more than
    wall-backed ones, and more sharply than L1 could."""
    from chord_tpu.ops import gi

    cfg = _cfg()
    cache = jnp.zeros(gi.sh_size(cfg))
    anchor = jnp.zeros(3)

    # a red wall at x=0 facing +x: surfels emit red into the room;
    # inject stores the radiance lobe around -normal (receivers facing
    # the wall see it)
    n_s = 64
    pos = np.zeros((n_s, 3), np.float32)
    pos[:, 1] = np.linspace(-1.0, 1.0, n_s)       # spread along the wall
    nrm = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (n_s, 1))
    red = np.tile(np.array([1.0, 0.05, 0.05], np.float32), (n_s, 1))
    ok = np.ones(n_s, bool)
    for _ in range(40):   # temporal blend converges toward the mean
        cache = gi.inject_surfels(cache, jnp.asarray(pos),
                                  jnp.asarray(red), jnp.asarray(nrm),
                                  jnp.asarray(ok), anchor, cfg)

    q = jnp.asarray([[0.0, 0.0, 0.0]])            # the probe's cell
    to_wall = jnp.asarray([[-1.0, 0.0, 0.0]])     # facing the wall
    away = jnp.asarray([[1.0, 0.0, 0.0]])

    e_face, c1 = gi.sample_irradiance(cache, q, to_wall, anchor, cfg)
    e_back, c2 = gi.sample_irradiance(cache, q, away, anchor, cfg)
    e_face, e_back = np.asarray(e_face)[0], np.asarray(e_back)[0]
    assert c1[0] > 0 and c2[0] > 0
    assert e_face[0] > 4.0 * max(e_back[0], 1e-4), (e_face, e_back)
    assert e_face[0] > 3.0 * e_face[1], "bounce must stay red"

    # radiance lookup along the lobe: a delta at d evaluated at d gives
    # sum_i Y_i(d)^2 * pi = (9/4pi)*pi = 2.25 with SH3; L1 caps at
    # (4/4pi)*pi = 1.0 — anything > 1.3 proves the L2 band is live
    r_face, _ = gi.sample_radiance(cache, q, to_wall, anchor, cfg)
    assert np.asarray(r_face)[0, 0] > 1.3, np.asarray(r_face)
