"""Screen-probe GI stage invariants (reference pass list:
screen_probe_gather.cpp:164-182)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chord_tpu.ops import screen_probe as sp
from chord_tpu.ops import sh


class _FakeGbuf:
    def __init__(self, h, w):
        ys = np.arange(h, dtype=np.float32)[:, None] + 0.5
        xs = np.arange(w, dtype=np.float32)[None, :] + 0.5
        pos = np.stack([np.broadcast_to(xs * 0.1, (h, w)),
                        np.zeros((h, w), np.float32),
                        np.broadcast_to(-ys * 0.1 - 1.0, (h, w))], -1)
        self.position_tw = jnp.asarray(pos)
        n = np.zeros((h, w, 3), np.float32)
        n[..., 1] = 1.0
        self.normal = jnp.asarray(n)
        self.valid = jnp.ones((h, w), bool)
        self.motion = jnp.zeros((h, w, 2), jnp.float32)


def test_spawn_strides_and_jitter():
    h, w, t = 32, 48, 8
    g = _FakeGbuf(h, w)
    depth = jnp.asarray(np.random.default_rng(0).uniform(
        0.1, 0.9, (h, w)).astype(np.float32))
    cfg = sp.ScreenProbeConfig(tile=t)
    p0 = sp.spawn_probes(g, depth, jnp.asarray(0, jnp.int32), cfg)
    assert p0.depth.shape == (h // t, w // t)
    # frame 0: offset (0,0) — probes at pixel (0,0) of each tile
    np.testing.assert_array_equal(np.asarray(p0.depth),
                                  np.asarray(depth)[::t, ::t])
    # a later frame picks a different in-tile pixel
    p1 = sp.spawn_probes(g, depth, jnp.asarray(1, jnp.int32), cfg)
    assert not np.allclose(np.asarray(p1.depth), np.asarray(p0.depth))


def test_constant_environment_roundtrip():
    """Probes in a constant-radiance environment -> irradiance equals that
    radiance (energy conservation of project + cosine eval/pi)."""
    h, w = 32, 32
    g = _FakeGbuf(h, w)
    cfg = sp.ScreenProbeConfig(tile=8, rays=16)
    probes = sp.spawn_probes(g, jnp.full((h, w), 0.5),
                             jnp.asarray(0, jnp.int32), cfg)
    # bypass trace: constant radiance from every direction
    dirs = jnp.broadcast_to(
        jnp.asarray(sp._octahedral_dirs(4)), (4, 4, 16, 3))
    rad = jnp.ones((4, 4, 16, 3)) * jnp.asarray([1.0, 0.5, 0.25])
    sh_hist = jnp.zeros((4, 4, 9, 3))
    n_hist = jnp.zeros((4, 4))
    packed = sp.project_and_merge(rad, dirs, probes, sh_hist, n_hist, cfg)
    shc, n = sh.unpack(packed)
    assert float(n[0, 0]) == 16.0
    e = sh.eval_irradiance(shc, probes.normal[:4, :4]) / np.pi
    np.testing.assert_allclose(np.asarray(e[1, 1]), [1.0, 0.5, 0.25],
                               rtol=0.15)


def test_temporal_reprojection_static_camera():
    """Static camera: probes re-fetch their own history SH; numSample
    accumulates toward the cap."""
    h, w = 32, 32
    g = _FakeGbuf(h, w)
    cfg = sp.ScreenProbeConfig(tile=8)
    depth = jnp.full((h, w), 0.5)
    probes = sp.spawn_probes(g, depth, jnp.asarray(0, jnp.int32), cfg)
    # identity-ish projection: map x,z to clip so all probes land onscreen
    # at their own grid cell with depth 0.5
    # Build a projection that yields ndc from position: x_ndc = pos.x/ 5 -
    # simpler: use an orthographic-like matrix (row-vector convention)
    # positions span x in (0, w*0.1), z in (-1, -h*0.1-1); map them onto
    # ndc (-1,1)^2 with constant depth 0.5, w=1 (row-vector convention)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 2.0 / (w * 0.1)
    m[3, 0] = -1.0
    m[2, 1] = 2.0 / (h * 0.1)
    m[3, 1] = 1.0 + 2.0 / (h * 0.1)
    m[3, 2] = 0.5
    m[3, 3] = 1.0
    prev_sh = np.zeros((4, 4, 28), np.float32)
    prev_sh[..., 0] = 2.5          # DC coeff
    prev_sh[..., 27] = 32.0        # numSample
    prev_depth = np.full((4, 4), 0.5, np.float32)
    shc, n = sp.reproject_probe_sh(
        probes, jnp.asarray(prev_sh), jnp.asarray(prev_depth),
        jnp.asarray(m), jnp.ones(()), cfg._replace(temporal_depth_tol=10.0))
    # history found: numSample carried over
    assert np.asarray(n).max() == 32.0
    # packed index 0 unpacks to (coeff 0, channel R)
    assert np.allclose(np.asarray(shc)[np.asarray(n) > 0][:, 0, 0], 2.5)


def test_bilateral_upsample_preserves_constant():
    hh, wh = 16, 16
    diff = jnp.ones((hh, wh, 3)) * jnp.asarray([0.3, 0.6, 0.9])
    dh = jnp.full((hh, wh), 0.5)
    nh = jnp.zeros((hh, wh, 3)).at[..., 1].set(1.0)
    df = jnp.full((2 * hh, 2 * wh), 0.5)
    nf = jnp.zeros((2 * hh, 2 * wh, 3)).at[..., 1].set(1.0)
    out = sp.bilateral_upsample(diff, dh, nh, df, nf)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to([0.3, 0.6, 0.9],
                                               (2 * hh, 2 * wh, 3)),
                               rtol=1e-4)


def test_bilateral_upsample_respects_depth_edges():
    """Across a depth discontinuity the upsample must not leak the far
    side's irradiance onto the near side."""
    hh, wh = 16, 16
    diff = np.zeros((hh, wh, 3), np.float32)
    diff[:, :8] = 1.0              # bright left half
    dh = np.full((hh, wh), 0.9, np.float32)
    dh[:, :8] = 0.2                # left half is FAR (different depth)
    nh = np.zeros((hh, wh, 3), np.float32)
    nh[..., 1] = 1.0
    # full res: everywhere near-depth
    df = np.full((2 * hh, 2 * wh), 0.9, np.float32)
    nf = np.zeros((2 * hh, 2 * wh, 3), np.float32)
    nf[..., 1] = 1.0
    out = np.asarray(sp.bilateral_upsample(
        jnp.asarray(diff), jnp.asarray(dh), jnp.asarray(nh),
        jnp.asarray(df), jnp.asarray(nf)))
    # columns well inside the near region stay dark even next to the seam
    assert out[:, 18:, :].max() < 0.2


def test_spatial_filter_edge_stopping():
    hh, wh = 16, 16
    diff = np.zeros((hh, wh, 3), np.float32)
    diff[:, :8] = 1.0
    dh = np.full((hh, wh), 0.5, np.float32)
    dh[:, :8] = 0.1                # depth edge at the brightness edge
    nh = np.zeros((hh, wh, 3), np.float32)
    nh[..., 1] = 1.0
    cfg = sp.ScreenProbeConfig()
    out = np.asarray(sp.spatial_filter_half(
        jnp.asarray(diff), jnp.asarray(dh), jnp.asarray(nh), cfg))
    # bright side blurs within itself; dark side stays dark at the seam
    assert out[:, 10:].max() < 0.08


def test_trace_probes_hits_screen_geometry():
    """A probe ray marching toward visible geometry picks up the previous
    frame's color there; rays to the sky fall back to sky ambient."""
    h, w = 64, 64
    # flat floor gbuffer: probes on a plane, wall at far x
    g = _FakeGbuf(h, w)
    cfg = sp.ScreenProbeConfig(tile=8, rays=16, steps=8, max_distance=10.0)
    depth = np.full((h, w), 0.5, np.float32)
    probes = sp.spawn_probes(g, jnp.asarray(depth),
                             jnp.asarray(0, jnp.int32), cfg)
    # orthographic-ish projection (row-vector) mapping the gbuffer plane
    # onto the screen with constant depth 0.5
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 2.0 / (w * 0.1)
    m[3, 0] = -1.0
    m[2, 1] = 2.0 / (h * 0.1)
    m[3, 1] = 1.0 + 2.0 / (h * 0.1)
    m[3, 2] = 0.5
    m[1, 2] = -0.1      # height above the plane reads as "farther"
    m[3, 3] = 1.0
    prev_color = np.full((h, w, 3), 0.0, np.float32)
    prev_color[..., 0] = 3.0       # red screen
    rad, dirs = sp.trace_probes(
        probes, jnp.asarray(depth)[::4, ::4], jnp.asarray(prev_color),
        jnp.asarray(m), jnp.asarray(0, jnp.int32), cfg,
        sky_ambient=jnp.asarray([0.0, 0.0, 1.0]))
    r = np.asarray(rad)
    # some rays hit (red), some miss (blue-ish sky)
    assert (r[..., 0] > 2.0).any()
    assert (r[..., 2] > 0.0).any()
    assert np.isfinite(r).all()


@pytest.mark.slow
def test_frame_with_probe_gi_smoke():
    """Full meshlet frame with the screen-probe stage on: runs, finite,
    history pytree carries probe state across frames."""
    from chord_tpu.asset.procedural import build_sponza_like
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.camera import Camera

    b = build_sponza_like(detail=1)
    pools = build_meshlet_pools(b)
    cam = Camera(width=64, height=32)
    cam.position = np.array([-15.0, 4.0, 3.0])
    cam.look_at(np.array([10.0, 2.0, -2.0]))
    inst = b.frame_instances(cam)
    r = MeshletRenderer(
        RendererConfig(width=64, height=32, pair_capacity=2048,
                       big_capacity=64, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=256, occlusion=False,
                           gi=True, gi_mode="probe",
                           probe_cfg=sp.ScreenProbeConfig(
                               tile=8, rays=4, steps=4, depth_div=2)))
    img1, _ = r.render(pools, inst, cam.view_uniform(0))
    img2, _ = r.render(pools, inst, cam.view_uniform(1))
    assert np.isfinite(np.asarray(r.history.probe_sh)).all()
    assert r.history.probe_sh.shape == (4, 8, 28)
    assert r.history.gi_diffuse.shape == (16, 32, 3)
    # second frame accumulated samples
    assert float(np.asarray(r.history.probe_sh[..., 27]).max()) > 4.0
    assert np.asarray(img2).dtype == np.uint8


# ---------------------------------------------------------------------------
# Specular GI filtering chain (VERDICT r2 item 4; reference:
# gi_spatial_specular_remove_fireflare.hlsl / gi_spatial_filter_specular.hlsl)
# ---------------------------------------------------------------------------

def _flat_plane(hq=16, wq=32, rough=0.3):
    pos = np.zeros((hq, wq, 3), np.float32)
    pos[..., 0] = np.arange(wq)[None, :] * 0.1
    pos[..., 1] = np.arange(hq)[:, None] * 0.1
    pos[..., 2] = -3.0
    nrm = np.zeros((hq, wq, 3), np.float32)
    nrm[..., 2] = 1.0
    return (jnp.asarray(pos), jnp.asarray(nrm),
            jnp.full((hq, wq), rough, jnp.float32))


def test_specular_firefly_clamped():
    """A single hot outlier on a flat glossy plane must be pulled to the
    neighborhood level; the rest of the plane stays put."""
    from chord_tpu.ops.screen_probe import specular_firefly_clamp

    pos, nrm, rough = _flat_plane()
    spec = np.full((16, 32, 3), 0.2, np.float32)
    spec[8, 16] = 500.0   # firefly
    out = np.asarray(specular_firefly_clamp(jnp.asarray(spec), pos, nrm,
                                            rough))
    assert out[8, 16].max() < 5.0, out[8, 16]
    assert np.abs(out[2, 2] - 0.2).max() < 0.05


def test_specular_firefly_mirror_passthrough():
    """roughness == 0 (mirror) skips the filter (reference early-out)."""
    from chord_tpu.ops.screen_probe import specular_firefly_clamp

    pos, nrm, _ = _flat_plane()
    rough = jnp.zeros((16, 32), jnp.float32)
    spec = np.full((16, 32, 3), 0.2, np.float32)
    spec[8, 16] = 500.0
    out = np.asarray(specular_firefly_clamp(jnp.asarray(spec), pos, nrm,
                                            rough))
    np.testing.assert_allclose(out, spec, rtol=1e-6)


def test_specular_spatial_filter_smooths_and_respects_edges():
    from chord_tpu.ops.screen_probe import spatial_filter_specular

    pos, nrm, rough = _flat_plane(rough=0.25)
    rng = np.random.default_rng(3)
    spec = rng.uniform(0, 1, (16, 32, 3)).astype(np.float32)
    # right half: orthogonal normals -> filter must not bleed across
    nrm = np.asarray(nrm).copy()
    nrm[:, 16:] = [1.0, 0.0, 0.0]
    spec[:, 16:] = 10.0
    out = np.asarray(spatial_filter_specular(
        jnp.asarray(spec), pos, jnp.asarray(nrm), rough))
    left_in = spec[4:12, 2:12]
    left_out = out[4:12, 2:12]
    assert left_out.std() < left_in.std() * 0.7   # smoothed
    assert np.abs(out[:, :13] - spec[:, :13]).max() < 5.0  # some smoothing ok
    assert out[4:12, 2:12].max() < 3.0            # no 10.0 bleed-through


def test_specular_temporal_reduces_flicker():
    """Alternating noise under a static camera converges: the blended
    frame-to-frame delta must be much smaller than the raw delta."""
    from chord_tpu.ops.screen_probe import temporal_specular

    rng = np.random.default_rng(4)
    hq, wq = 16, 32
    rough = jnp.full((hq, wq), 0.3, jnp.float32)
    motion = jnp.zeros((hq, wq, 2), jnp.float32)
    base = rng.uniform(0.2, 0.6, (hq, wq, 3)).astype(np.float32)
    hist = jnp.asarray(base)
    outs = []
    for i in range(6):
        fresh = base + rng.normal(0, 0.1, base.shape).astype(np.float32)
        hist = temporal_specular(jnp.asarray(fresh), motion, hist,
                                 jnp.float32(1.0), rough)
        outs.append(np.asarray(hist))
    raw_delta = 0.1 * np.sqrt(2)   # independent noise frame-to-frame
    acc_delta = np.abs(outs[-1] - outs[-2]).mean()
    assert acc_delta < raw_delta * 0.55, acc_delta


def test_ggx_sample_normal_statistics():
    """GGX importance sampling (reference gi_specular_trace.hlsl):
    roughness 0 returns the shading normal exactly; the half-vector
    spread must grow monotonically with roughness; every reflected
    direction stays above the surface."""
    import jax.numpy as jnp

    from chord_tpu.ops.screen_probe import ggx_sample_normal

    rng = np.random.default_rng(7)
    n = 4096
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    view = jnp.broadcast_to(
        jnp.asarray([0.6, 0.8, 0.0]) / np.linalg.norm([0.6, 0.8, 0.0]),
        (n, 3))
    u1 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))

    h0 = np.asarray(ggx_sample_normal(nrm, view,
                                      jnp.zeros(n), u1, u2))
    # the 1e-4 alpha floor allows ~sqrt(1e-8*u/(1-u)) ~ 3e-3 deviation
    np.testing.assert_allclose(h0, np.asarray(nrm), atol=5e-3)

    spreads = []
    for rough in (0.1, 0.3, 0.6):
        h = np.asarray(ggx_sample_normal(
            nrm, view, jnp.full((n,), rough), u1, u2))
        # unit vectors
        np.testing.assert_allclose(np.linalg.norm(h, axis=1), 1.0,
                                   atol=1e-4)
        cos_t = h[:, 1]
        spreads.append(1.0 - cos_t.mean())
        # reflected rays above the surface (the sampler's fallback rule)
        v = np.asarray(view)
        d = 2.0 * np.sum(v * h, 1, keepdims=True) * h - v
        assert (d[:, 1] > 0.0).all()
    assert spreads[0] < spreads[1] < spreads[2], spreads
    # mid roughness really is a cone, not a delta and not a hemisphere
    assert 0.005 < spreads[1] < 0.4, spreads
