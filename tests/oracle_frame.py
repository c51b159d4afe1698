"""Independent NumPy full-frame reference renderer (the fidelity oracle).

VERDICT round-1 item #6: the SSIM gate needs an implementation that does
NOT share code with the JAX engine — a systematic engine error (wrong
BRDF normalization, flipped bitangent) must FAIL here, not be baked into
self-rendered goldens. Everything below is scalar/NumPy written straight
from the spec (reference: lighting.hlsl metallic-roughness GGX,
base.hlsli:457-497 barycentrics, tonemapping.hlsl ACES film curve); the
only shared pieces are the published color matrices (standard constants)
and the rasterizer oracle (ops/raster.py rasterize_oracle, itself a
NumPy loop written against the kernel spec).
"""

import numpy as np

from chord_tpu.ops.colorspace import AP1_LUMA, AP1_TO_SRGB, SRGB_TO_AP1
from chord_tpu.ops.raster import rasterize_oracle


def _sun_visibility(p, tris, sun_d, eps=2e-2, chunk=1024):
    """Brute-force shadow ray-cast: Moeller-Trumbore from every shaded
    point toward the sun against ALL scene triangles (the oracle for the
    engine's cascaded shadow maps; reference resolves the same
    ground-truth with its RT path). -> (H,W) 0/1 visibility."""
    H, W, _ = p.shape
    pts = p.reshape(-1, 3).astype(np.float32)
    v0 = tris[:, 0].astype(np.float32)
    e1 = (tris[:, 1] - tris[:, 0]).astype(np.float32)
    e2 = (tris[:, 2] - tris[:, 0]).astype(np.float32)
    d = sun_d.astype(np.float32)
    pvec = np.cross(d[None], e2)                      # (T,3)
    det = (e1 * pvec).sum(-1)
    ok = np.abs(det) > 1e-12
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    vis = np.ones(len(pts), bool)
    for c0 in range(0, len(pts), chunk):
        tvec = pts[c0:c0 + chunk, None, :] - v0[None]      # (C,T,3)
        u = (tvec * pvec[None]).sum(-1) * inv_det[None]
        qvec = np.cross(tvec, e1[None])
        v = (qvec * d).sum(-1) * inv_det[None]
        t = (qvec * e2[None]).sum(-1) * inv_det[None]
        blocked = (ok[None] & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) &
                   (t > eps))
        vis[c0:c0 + chunk] = ~blocked.any(1)
    return vis.reshape(H, W).astype(np.float64)


def render_oracle(builder, cam, width, height,
                  sun_direction=(0.3, 0.8, 0.5),
                  sun_radiance=(8.0, 7.6, 7.0),
                  sky_ambient=(0.3, 0.4, 0.6),
                  exposure=1.0, shadows=False):
    """Render one frame with pure NumPy: transform -> oracle raster ->
    per-pixel barycentric resolve -> GGX sun + hemispherical ambient ->
    ACES film -> sRGB u8. Matches render_frame_flat's feature-off config
    (BASELINE config #1 shape)."""
    u = cam.view_uniform(0)
    vp = u.translated_world_to_clip_nojitter.astype(np.float64)

    # flatten the scene: world-space triangle soup + per-tri material
    tris = []          # (T,3,3) translated-world positions
    nrms = []          # (T,3,3) world normals
    mats = []          # (T,) material ids
    for mesh_id, mat_id, l2w in builder.instances:
        mesh = builder.meshes[mesh_id]
        pos = np.asarray(mesh.positions, np.float64)
        ph = np.concatenate([pos, np.ones((len(pos), 1))], 1) @ l2w
        ptw = ph[:, :3] / ph[:, 3:4] - cam.position
        # row-vector normal transform: n' = n @ inv(M)^T (the extra .T
        # that used to be here applied the INVERSE rotation — harmless on
        # the axis-aligned procedural scenes, wrong for rotated instances)
        nm = np.linalg.inv(l2w[:3, :3]).T
        nrm = np.asarray(mesh.normals, np.float64) @ nm
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
        idx = np.asarray(mesh.indices, np.int64).reshape(-1, 3)
        tris.append(ptw[idx])
        nrms.append(nrm[idx])
        mats.append(np.full(len(idx), mat_id, np.int64))
    tris = np.concatenate(tris)
    nrms = np.concatenate(nrms)
    mats = np.concatenate(mats)

    t = len(tris)
    ph = np.concatenate([tris.reshape(-1, 3), np.ones((t * 3, 1))], 1)
    clip = (ph @ vp).astype(np.float32)
    indices = np.arange(t * 3, dtype=np.int64).reshape(-1, 3)
    payload = np.arange(1, t + 1, dtype=np.uint32)

    # material bucket routing (pipeline_filter semantics): opaque rasters
    # first; the masked bucket punches through with a deferred constant-
    # alpha test against its cutoff (single layer, engine parity); blend
    # forward-shades one depth-peeled layer after lighting
    mode = np.asarray([{"opaque": 0, "mask": 1, "blend": 2}[
        builder.materials[i].alpha_mode] for i in
        range(len(builder.materials))], np.int64)[mats]
    factor = np.asarray([builder.materials[i].base_color[3]
                         for i in range(len(builder.materials))])[mats]
    cutoff = np.asarray([builder.materials[i].alpha_cutoff
                         for i in range(len(builder.materials))])[mats]

    depth, vis = rasterize_oracle(clip, indices, mode == 0, payload,
                                  width, height)
    if (mode == 1).any():
        depth_m, vis_m = rasterize_oracle(clip, indices, mode == 1,
                                          payload, width, height)
        tm = np.maximum(vis_m.astype(np.int64) - 1, 0)
        accept = (vis_m > 0) & (depth_m > depth) & \
            (factor[tm] >= cutoff[tm])
        depth = np.where(accept, depth_m, depth)
        vis = np.where(accept, vis_m, vis)

    # per-pixel resolve + shade (scalar spec math, vectorized by numpy)
    tri_id = vis.astype(np.int64) - 1
    hit = tri_id >= 0
    ts = np.maximum(tri_id, 0)

    c0 = clip[indices[ts, 0]].astype(np.float64)
    c1 = clip[indices[ts, 1]].astype(np.float64)
    c2 = clip[indices[ts, 2]].astype(np.float64)
    xs = (np.arange(width) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (np.arange(height) + 0.5) / height * 2.0
    px = np.broadcast_to(xs[None, :], (height, width))
    py = np.broadcast_to(ys[:, None], (height, width))

    def edge(a, b):
        return ((a[..., 1] * b[..., 3] - a[..., 3] * b[..., 1]) * px +
                (a[..., 3] * b[..., 0] - a[..., 0] * b[..., 3]) * py +
                (a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]))

    l0 = edge(c1, c2)
    l1 = edge(c2, c0)
    l2 = edge(c0, c1)
    ssum = l0 + l1 + l2
    ssum = np.where(np.abs(ssum) > 1e-20, ssum, 1.0)
    b0, b1, b2 = l0 / ssum, l1 / ssum, l2 / ssum

    p = (b0[..., None] * tris[ts, 0] + b1[..., None] * tris[ts, 1] +
         b2[..., None] * tris[ts, 2])
    n = (b0[..., None] * nrms[ts, 0] + b1[..., None] * nrms[ts, 1] +
         b2[..., None] * nrms[ts, 2])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    mat_rows = np.asarray([
        (builder.materials[i].base_color[:3] +
         (builder.materials[i].metallic, builder.materials[i].roughness) +
         builder.materials[i].emissive)
        for i in range(len(builder.materials))], np.float64)
    mrow = mat_rows[mats[ts]]
    base = mrow[..., 0:3] @ SRGB_TO_AP1.astype(np.float64)
    metallic = mrow[..., 3]
    rough = mrow[..., 4]
    emissive = mrow[..., 5:8] @ SRGB_TO_AP1.astype(np.float64)

    sun_d = np.asarray(sun_direction, np.float64)
    sun_d /= np.linalg.norm(sun_d)
    sun_r = np.asarray(sun_radiance, np.float64) @ SRGB_TO_AP1.astype(
        np.float64)
    sky = np.asarray(sky_ambient, np.float64) @ SRGB_TO_AP1.astype(
        np.float64)

    v = -p
    v /= np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    h = v + sun_d
    h /= np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    nol = np.clip((n * sun_d).sum(-1), 0.0, 1.0)
    nov = np.clip((n * v).sum(-1), 1e-4, 1.0)
    noh = np.clip((n * h).sum(-1), 0.0, 1.0)
    voh = np.clip((v * h).sum(-1), 0.0, 1.0)

    a = np.maximum(rough * rough, 1e-3)
    a2 = a * a
    f0 = 0.04 * (1.0 - metallic[..., None]) + base * metallic[..., None]
    diff_color = base * (1.0 - metallic[..., None])

    dd = noh * noh * (a2 - 1.0) + 1.0
    d_ggx = a2 / np.maximum(np.pi * dd * dd, 1e-8)
    gv = nol * np.sqrt(np.maximum(nov * nov * (1 - a2) + a2, 1e-8))
    gl = nov * np.sqrt(np.maximum(nol * nol * (1 - a2) + a2, 1e-8))
    vis_s = 0.5 / np.maximum(gv + gl, 1e-8)
    f = f0 + (1.0 - f0) * np.clip(1.0 - voh, 0.0, 1.0)[..., None] ** 5
    spec = (d_ggx * vis_s)[..., None] * f
    direct = (diff_color / np.pi + spec) * nol[..., None] * sun_r
    if shadows:
        direct = direct * _sun_visibility(p, tris, sun_d)[..., None]

    up_wrap = np.clip(n[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    lit = direct + diff_color * (sky * up_wrap) + emissive
    color = np.where(hit[..., None], lit, sky)

    if (mode == 2).any():
        # forward blend layer (shade_blend_layer semantics: Lambert sun +
        # ambient, src-alpha composite against the lit scene)
        depth_b, vis_b = rasterize_oracle(clip, indices, mode == 2,
                                          payload, width, height)
        tb = np.maximum(vis_b.astype(np.int64) - 1, 0)
        hit_b = (vis_b > 0) & (depth_b > depth)
        cb0 = clip[indices[tb, 0]].astype(np.float64)
        cb1 = clip[indices[tb, 1]].astype(np.float64)
        cb2 = clip[indices[tb, 2]].astype(np.float64)

        def edge_b(a, b):
            return ((a[..., 1] * b[..., 3] - a[..., 3] * b[..., 1]) * px +
                    (a[..., 3] * b[..., 0] - a[..., 0] * b[..., 3]) * py +
                    (a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]))

        lb0 = edge_b(cb1, cb2)
        lb1 = edge_b(cb2, cb0)
        lb2 = edge_b(cb0, cb1)
        sb = lb0 + lb1 + lb2
        sb = np.where(np.abs(sb) > 1e-20, sb, 1.0)
        nb = ((lb0 / sb)[..., None] * nrms[tb, 0] +
              (lb1 / sb)[..., None] * nrms[tb, 1] +
              (lb2 / sb)[..., None] * nrms[tb, 2])
        nb /= np.maximum(np.linalg.norm(nb, axis=-1, keepdims=True), 1e-12)
        mrow_b = mat_rows[mats[tb]]
        alb = mrow_b[..., 0:3] @ SRGB_TO_AP1.astype(np.float64)
        em_b = mrow_b[..., 5:8] @ SRGB_TO_AP1.astype(np.float64)
        a_b = np.where(hit_b, np.clip(factor[tb], 0.0, 1.0), 0.0)
        ndl = np.clip((nb * sun_d).sum(-1), 0.0, 1.0)
        col_b = alb * (sun_r * ndl[..., None] / np.pi + sky * 0.5) + em_b
        color = color * (1.0 - a_b[..., None]) + col_b * a_b[..., None]

    # ACES film (Hill fit) + sRGB encode
    c = color * exposure
    luma = (c @ AP1_LUMA.astype(np.float64))[..., None]
    c = luma + 0.96 * (c - luma)
    film = np.clip((c * (c + 0.0245786) - 0.000090537) /
                   (c * (0.983729 * c + 0.4329510) + 0.238081), 0.0, 1.0)
    srgb_lin = np.clip(film @ AP1_TO_SRGB.astype(np.float64), 0.0, 1.0)
    enc = np.where(srgb_lin <= 0.0031308, srgb_lin * 12.92,
                   1.055 * np.maximum(srgb_lin, 1e-7) ** (1 / 2.4) - 0.055)
    return np.clip(enc * 255.0 + 0.5, 0, 255).astype(np.uint8)
