"""DDGI clipmap light-probe volumes (reference: renderer/gi/light_probe.cpp
ddgiUpdate + shader/ddgi.h): convolution vs NumPy oracle, octahedral
mapping, Chebyshev visibility, relocation, end-to-end update+sample."""

import pytest
import jax.numpy as jnp
import numpy as np

from chord_tpu.ops import ddgi
from chord_tpu.ops.rt import SceneBVH, build_bvh_numpy


def _cfg(**kw):
    base = dict(cascades=2, probe_dim=(4, 4, 4), base_spacing=1.0,
                rays=16, irr_side=4, dist_side=4, update_phases=2,
                hysteresis=0.5)
    base.update(kw)
    return ddgi.DDGIConfig(**base)


def _bvh_from_spheres(spheres, albedo=None, emissive=None):
    spheres = np.asarray(spheres, np.float32).reshape(-1, 4)
    b = build_bvh_numpy(spheres)
    n = len(spheres)
    return SceneBVH(
        node_sphere=jnp.asarray(b["sphere"]),
        node_count=jnp.asarray(b["count"]),
        node_leaf=jnp.asarray(b["leaf"]),
        leaf_albedo=jnp.asarray(albedo if albedo is not None
                                else np.full((n, 3), 0.5, np.float32)),
        leaf_emissive=jnp.asarray(emissive if emissive is not None
                                  else np.zeros((n, 3), np.float32)),
        leaf_sphere=jnp.asarray(spheres),
    )


def test_fibonacci_unit_and_balanced():
    d = ddgi.spherical_fibonacci(64)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # spherical spread: mean direction near zero, covers both hemispheres
    assert np.abs(d.mean(0)).max() < 0.08
    assert (d[:, 2] > 0).sum() == 32


def test_octahedral_nearest_roundtrip():
    for side in (4, 6, 8):
        dirs = ddgi.octahedral_texel_dirs(side)
        idx = np.asarray(ddgi.octahedral_texel_index(jnp.asarray(dirs),
                                                     side))
        assert (idx == np.arange(side * side)).all(), side


def test_convolve_matches_numpy_oracle():
    cfg = _cfg()
    rng = np.random.default_rng(3)
    pp, r = 8, cfg.rays
    dirs = ddgi.spherical_fibonacci(r)
    rad = rng.uniform(0, 2, (pp, r, 3)).astype(np.float32)
    dist = rng.uniform(0.1, 4, (pp, r)).astype(np.float32)
    irr_j, dist_j = ddgi._convolve(jnp.asarray(rad), jnp.asarray(dist),
                                   jnp.asarray(dirs), cfg)
    irr_o, dist_o = ddgi.convolve_numpy(rad, dist,
                                        np.broadcast_to(dirs, (pp, r, 3)),
                                        cfg)
    np.testing.assert_allclose(np.asarray(irr_j), irr_o, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dist_j), dist_o, rtol=2e-3,
                               atol=2e-4)


def test_convolve_furnace():
    """Uniform incident radiance -> every irradiance texel equals it."""
    cfg = _cfg(rays=64)
    dirs = ddgi.spherical_fibonacci(cfg.rays)
    rad = jnp.ones((2, cfg.rays, 3)) * jnp.asarray([1.0, 0.5, 0.25])
    dist = jnp.ones((2, cfg.rays))
    irr, _ = ddgi._convolve(rad, dist, jnp.asarray(dirs), cfg)
    np.testing.assert_allclose(np.asarray(irr)[0, :, 0], 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(irr)[1, :, 1], 0.5, atol=1e-3)


@pytest.mark.slow
def test_update_directional_irradiance():
    """A bright emissive wall on +x: after updates, probes report more
    irradiance on +x-facing normals than -x."""
    cfg = _cfg()
    state = ddgi.DDGIState.empty(cfg)
    # wall of emissive spheres at x=+3
    ys, zs = np.meshgrid(np.linspace(-2, 2, 4), np.linspace(-2, 2, 4))
    sph = np.stack([np.full(16, 3.0), ys.ravel(), zs.ravel(),
                    np.full(16, 0.7)], -1)
    bvh = _bvh_from_spheres(
        sph, albedo=np.zeros((16, 3), np.float32),
        emissive=np.full((16, 3), 5.0, np.float32))
    sun_d = jnp.asarray([0.0, 1.0, 0.0])
    sun_r = jnp.zeros(3)
    sky = jnp.zeros(3)
    # run a full round-robin (cascades * phases frames)
    for f in range(cfg.cascades * cfg.update_phases * 2):
        state = ddgi.ddgi_update(state, bvh, sun_d, sun_r, sky,
                                 jnp.asarray(f, jnp.int32), cfg)
    assert float(state.weight.max()) > 0.0
    pos = jnp.asarray([[0.0, 0.1, 0.1]])
    irr_px, c_px = ddgi.sample_ddgi(state, pos,
                                    jnp.asarray([[1.0, 0.0, 0.0]]), cfg)
    irr_nx, c_nx = ddgi.sample_ddgi(state, pos,
                                    jnp.asarray([[-1.0, 0.0, 0.0]]), cfg)
    assert float(c_px[0]) > 0.0
    assert float(irr_px[0].sum()) > float(irr_nx[0].sum()) * 1.3, (
        np.asarray(irr_px), np.asarray(irr_nx))
    # octahedral sampling path agrees on the ordering
    irr_px_o, _ = ddgi.sample_ddgi(state, pos,
                                   jnp.asarray([[1.0, 0.0, 0.0]]), cfg,
                                   mode="oct")
    irr_nx_o, _ = ddgi.sample_ddgi(state, pos,
                                   jnp.asarray([[-1.0, 0.0, 0.0]]), cfg,
                                   mode="oct")
    assert float(irr_px_o[0].sum()) > float(irr_nx_o[0].sum())


def test_chebyshev_occlusion_downweights():
    """A probe whose distance map says 'blocker nearby' contributes less
    than an unoccluded one (ddgi.h:248-270 Chebyshev test)."""
    cfg = _cfg(cascades=1, update_phases=1, normal_bias=0.0)
    state = ddgi.DDGIState.empty(cfg)
    # all probes: uniform white irradiance (SH DC only => E(n) == 1.0
    # for every normal), traced once
    sh = np.zeros(state.sh.shape, np.float32)
    sh[..., 0:3] = 1.0 / ddgi.SH0    # k-major layout: coeff0 rgb first
    state = state._replace(
        irr=jnp.ones_like(state.irr),
        sh=jnp.asarray(sh),
        weight=jnp.ones_like(state.weight))

    far = jnp.concatenate([jnp.full(state.dist.shape[:-1] + (1,), 100.0),
                           jnp.full(state.dist.shape[:-1] + (1,), 1e4)],
                          -1)
    state_free = state._replace(dist=far)
    near = jnp.concatenate([jnp.full(state.dist.shape[:-1] + (1,), 0.01),
                            jnp.full(state.dist.shape[:-1] + (1,), 1e-4)],
                           -1)
    state_occ = state._replace(dist=near)
    pos = jnp.asarray([[0.2, 0.2, 0.2]])
    nrm = jnp.asarray([[0.0, 1.0, 0.0]])
    irr_free, _ = ddgi.sample_ddgi(state_free, pos, nrm, cfg)
    irr_occ, _ = ddgi.sample_ddgi(state_occ, pos, nrm, cfg)
    # occluded probes are floor-weighted (0.05) but the blend target is the
    # same uniform field here, so check the weighting via a mixed state:
    # even probes bright+free, odd probes dark+occluded
    mask = (jnp.arange(state.sh.shape[1]) % 2 == 0)[None, :, None]
    mixed = state._replace(
        sh=jnp.where(mask, state.sh, 0.0),
        dist=jnp.where(mask[..., None], far, near))
    irr_mixed, _ = ddgi.sample_ddgi(mixed, pos, nrm, cfg)
    # visibility weighting pulls the mix toward the bright free probes
    assert float(irr_mixed[0, 0]) > 0.6, np.asarray(irr_mixed)
    # sanity on the uniform cases
    np.testing.assert_allclose(np.asarray(irr_free)[0],
                               np.asarray(irr_occ)[0], rtol=0.05)


def test_relocation_pushes_probe_off_geometry():
    cfg = _cfg(cascades=1, update_phases=1, min_frontface=0.5)
    state = ddgi.DDGIState.empty(cfg)
    # a sphere sitting right next to every probe row (big flat slab)
    bvh = _bvh_from_spheres(np.asarray([[0.0, -0.55, 0.0, 0.5]]))
    st1 = ddgi.ddgi_update(state, bvh, jnp.asarray([0.0, 1.0, 0.0]),
                           jnp.zeros(3), jnp.zeros(3),
                           jnp.asarray(0, jnp.int32), cfg)
    off = np.asarray(st1.offset)
    assert np.abs(off).max() > 0.0
    assert np.abs(off).max() <= cfg.max_offset_frac * cfg.base_spacing + 1e-5


def test_fresh_probe_full_take_then_hysteresis():
    cfg = _cfg(cascades=1, update_phases=1, hysteresis=0.9, rays=16)
    state = ddgi.DDGIState.empty(cfg)
    bvh = _bvh_from_spheres(np.asarray([[50.0, 0.0, 0.0, 1.0]]))
    sky = jnp.asarray([1.0, 1.0, 1.0])
    st1 = ddgi.ddgi_update(state, bvh, jnp.asarray([0.0, 1.0, 0.0]),
                           jnp.zeros(3), sky, jnp.asarray(0, jnp.int32),
                           cfg)
    # fresh probes take the full new value (no 0.9 * zero-history drag)
    lvl1 = float(np.asarray(st1.irr).max())
    assert lvl1 > 0.2 * cfg.sky_leak
    st2 = ddgi.ddgi_update(st1, bvh, jnp.asarray([0.0, 1.0, 0.0]),
                           jnp.zeros(3), sky * 3.0,
                           jnp.asarray(1, jnp.int32), cfg)
    lvl2 = float(np.asarray(st2.irr).max())
    # hysteresis: second frame moves only (1-h) toward the 3x-bright sky
    assert lvl1 < lvl2 < lvl1 * 2.0


def test_sample_batched_shapes():
    """sample_ddgi on an (H,W,3) batch returns (H,W,3)/(H,W) — guards the
    broadcast bug only visible at N>1 sample points."""
    cfg = _cfg()
    state = ddgi.DDGIState.empty(cfg)
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32))
    for mode in ("sh", "oct"):
        irr, conf = ddgi.sample_ddgi(state, pos, nrm, cfg, mode=mode)
        assert irr.shape == (4, 5, 3) and conf.shape == (4, 5)
        assert np.isfinite(np.asarray(irr)).all()


def test_pick_cascade():
    cfg = _cfg(cascades=3, probe_dim=(8, 8, 8), base_spacing=1.0)
    c = ddgi._pick_cascade(jnp.asarray([[0.0, 0.0, 0.0],
                                        [2.9, 0.0, 0.0],
                                        [5.0, 0.0, 0.0],
                                        [11.0, 0.0, 0.0],
                                        [100.0, 0.0, 0.0]]), cfg)
    c = np.asarray(c)
    assert c[0] == 0 and c[1] == 0
    assert c[2] == 1
    assert c[3] == 2
    assert c[4] == 2    # clamped to the outermost cascade


import pytest


@pytest.mark.slow
def test_frame_with_ddgi_smoke():
    """Frame with gi_mode='ddgi': clipmap probe update + sampling compile
    and produce finite output (reference r.gi.method alt path)."""
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
                           gi=True, gi_mode="ddgi",
                           ddgi_cfg=ddgi.DDGIConfig(
                               cascades=2, probe_dim=(4, 4, 4),
                               rays=8, irr_side=4, dist_side=4,
                               update_phases=1)))
    img, _ = r.render(pools, inst, cam.view_uniform(0))
    assert r._bvh is not None
    assert float(np.asarray(r.history.ddgi.weight).max()) > 0.0
    assert np.isfinite(np.asarray(r.history.ddgi.irr)).all()
    assert np.asarray(img).dtype == np.uint8
