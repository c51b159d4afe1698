"""Deferred shading from the visibility buffer.

TPU-native equivalent of the reference's tile-indirect lighting pass
(reference: install/resource/shader/lighting.hlsl:270-385 — decode
visibility, re-fetch the hit triangle, recompute perspective-correct
barycentrics with analytic derivatives, interpolate attributes, GLTF
metallic-roughness BRDF with sun + sky; barycentric math in
install/resource/shader/base.hlsli:449-497).

On TPU there is no need for material-bucketed indirect dispatches
(reference: visibility_tile.hlsl) in the *uniform-material-model* case: all
pixels run the same metallic-roughness BRDF as one dense fused pass over the
(H, W) grid, and XLA fuses the decode->interpolate->BRDF chain. Sky pixels
(visibility == 0) take the sky radiance branch via `jnp.where` — branchless,
exactly how an 8x128 vreg machine wants it. (The reference's material-
bucketed tile dispatch, visibility_tile.hlsl, exists to serve divergent
material shaders on a scalar-warp machine; with one uniform BRDF model a
dense fused pass is strictly better here — revisit if divergent material
models land.)

All radiometric quantities are linear ACEScg (AP1); see ops/colorspace.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import colorspace
from ..rhi.framebuffer import unpack_visibility


class SunLight(NamedTuple):
    """Directional sun. Direction points *from* the surface *toward* the sun
    (translated world). Radiance in AP1."""

    direction: jnp.ndarray    # (3,) f32, normalized
    radiance: jnp.ndarray     # (3,) f32 AP1
    # Sky ambient used before the atmosphere pass exists / as leak term.
    sky_ambient: jnp.ndarray  # (3,) f32 AP1


class GBuffer(NamedTuple):
    """Decoded per-pixel surface attributes (the reference's thin gbuffer,
    render_textures.h:10-62, produced here directly from the visibility
    buffer instead of being rasterized)."""

    valid: jnp.ndarray        # (H,W) bool — hit something
    position_tw: jnp.ndarray  # (H,W,3) translated-world position
    normal: jnp.ndarray       # (H,W,3) shading normal (translated world)
    base_color: jnp.ndarray   # (H,W,3) AP1 linear albedo
    metallic: jnp.ndarray     # (H,W)
    roughness: jnp.ndarray    # (H,W)
    emissive: jnp.ndarray     # (H,W,3) AP1
    uv: jnp.ndarray           # (H,W,2)
    motion: jnp.ndarray       # (H,W,2) NDC motion vector (curr - prev)


def _barycentrics_from_clip(
    c0: jnp.ndarray, c1: jnp.ndarray, c2: jnp.ndarray,  # (...,4) clip
    px_ndc: jnp.ndarray, py_ndc: jnp.ndarray,            # (...,) pixel NDC
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Perspective-correct barycentrics at an NDC point from clip-space
    vertices (reference: base.hlsli:457-497 calculateTriangleBarycentrics,
    UE5-style). Returns (b0, b1, b2) with b0+b1+b2 = 1.

    Derivation: the 2D homogeneous cofactor weights lambda_i evaluated at
    the pixel give screen-space (non-perspective) weights proportional to
    sub-triangle areas times w products; dividing each by w_i and
    renormalizing yields attribute-correct barycentrics.
    """
    def ndc_xy(c):
        return c[..., 0], c[..., 1], c[..., 3]

    x0, y0, w0 = ndc_xy(c0)
    x1, y1, w1 = ndc_xy(c1)
    x2, y2, w2 = ndc_xy(c2)
    # Homogeneous 2D cross products: lambda_i(p) for p = (px, py, 1) against
    # the projected homogeneous verts (x, y, w).
    def edge(ax, ay, aw, bx, by, bw):
        return ((ay * bw - aw * by) * px_ndc +
                (aw * bx - ax * bw) * py_ndc +
                (ax * by - ay * bx))

    l0 = edge(x1, y1, w1, x2, y2, w2)
    l1 = edge(x2, y2, w2, x0, y0, w0)
    l2 = edge(x0, y0, w0, x1, y1, w1)
    # Perspective correction: b_i ∝ l_i (already includes the 1/w_i factor
    # through the homogeneous formulation when normalized by the sum).
    s = l0 + l1 + l2
    inv = 1.0 / jnp.where(jnp.abs(s) > 1e-20, s, 1.0)
    return l0 * inv, l1 * inv, l2 * inv


def resolve_gbuffer(
    vis: jnp.ndarray,            # (H,W) uint32 — payload = global_tri_id + 1
    pools,                       # rhi.ScenePools
    instances,                   # rhi.FrameInstances
    view_tw_to_clip: jnp.ndarray,        # (4,4) f32 (no jitter)
    prev_tw_to_clip: jnp.ndarray,        # (4,4) f32 previous frame
) -> GBuffer:
    """Visibility buffer -> full-res gbuffer (flat-triangle path: the
    payload is the global pool triangle id + 1; the meshlet path decodes
    (draw:25, tri:7) in resolve_gbuffer_meshlet)."""
    tri = vis.astype(jnp.int32) - 1                  # -1 = sky
    valid = tri >= 0
    tri_safe = jnp.maximum(tri, 0)
    idx = pools.indices[tri_safe]                    # (H,W,3)
    obj = pools.tri_object[tri_safe]                 # (H,W)
    return _resolve_from_ids(idx, obj, valid, pools, instances,
                             view_tw_to_clip, prev_tw_to_clip)


def resolve_gbuffer_meshlet(
    vis: jnp.ndarray,            # (H,W) u32 — packed (drawSlot+1):25|tri:7
    draw_object: jnp.ndarray,    # (cap,) i32 combined draw table
    draw_meshlet: jnp.ndarray,   # (cap,) i32
    pools,                       # rhi.MeshletScenePools
    instances,
    view_tw_to_clip: jnp.ndarray,
    prev_tw_to_clip: jnp.ndarray,
) -> GBuffer:
    """Meshlet-path gbuffer resolve: decode the packed visibility id via
    the frame's compacted draw list (the reference's drawedMeshletCmdId
    indirection, lighting.hlsl:270-310)."""
    from ..rhi.framebuffer import unpack_visibility

    slot, tri = unpack_visibility(vis)
    valid = slot >= 0
    slot_safe = jnp.maximum(slot, 0)
    mesh = draw_meshlet[slot_safe]                   # (H,W)
    obj = draw_object[slot_safe]
    idx = pools.tri_indices[mesh * 128 + tri]        # (H,W,3)
    return _resolve_from_ids(idx, obj, valid, pools, instances,
                             view_tw_to_clip, prev_tw_to_clip)


def resolve_gbuffer_raster_rt(
    vis: jnp.ndarray,            # (H,W) u32 packed (slot+1):25|tri:7
    depth: jnp.ndarray,          # (H,W) f32 reverse-Z
    nx: jnp.ndarray, ny: jnp.ndarray, nz: jnp.ndarray,   # (H,W) raster RTs
    u: jnp.ndarray, v: jnp.ndarray,                       # (H,W)
    draw_object: jnp.ndarray,    # (cap,) i32 combined draw table
    pools,
    instances,
    clip_to_tw: jnp.ndarray,     # (4,4) inverse view-proj (no jitter)
    tw_to_clip: jnp.ndarray,
    prev_tw_to_clip: jnp.ndarray,
    textured: bool = False,      # sample material base-color textures
    normal_mapped: bool = False,  # perturb normals from normal-map layers
    pbr_textures: bool = False,   # sample metal-rough + emissive maps
    mip_dither_frame=None,       # i32 scalar -> stochastic trilinear
    interpret: bool = False,     # pallas interpret (CPU tests)
    motion_div: int = 1,         # reconstruct per-object motion at 1/d
                                 # res + nearest upsample: the rigid-
                                 # delta row gather is the resolve's
                                 # biggest gather (2.4 ms/frame full-res
                                 # on device) and motion's consumers are
                                 # the half-res GI temporal passes + the
                                 # TSR global-mode residual — both
                                 # tolerant of half-res vectors
) -> GBuffer:
    """Zero-big-gather gbuffer resolve: normals/uv come straight from the
    rasterizer's attribute-plane render targets, position from depth
    unprojection; the only gathers are per-pixel row lookups into the tiny
    per-draw tables. Motion is per-object (rigid-delta reconstruction of
    the previous-frame position)."""
    from ..rhi.framebuffer import unpack_visibility

    h, w = vis.shape
    slot, _tri = unpack_visibility(vis)
    valid = slot >= 0

    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
    nrm = jnp.stack([nx * inv_len, ny * inv_len, nz * inv_len], axis=-1)
    uv = jnp.stack([u, v], axis=-1)

    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))
    ph = (px[..., None] * clip_to_tw[0] + py[..., None] * clip_to_tw[1] +
          depth[..., None] * clip_to_tw[2] + clip_to_tw[3])
    pos_tw = ph[..., :3] / jnp.where(jnp.abs(ph[..., 3:4]) > 1e-12,
                                     ph[..., 3:4], 1.0)

    def project_xy(p3, vp):
        c = (p3[..., 0:1] * vp[0] + p3[..., 1:2] * vp[1] +
             p3[..., 2:3] * vp[2] + vp[3])
        wc = jnp.where(jnp.abs(c[..., 3:4]) > 1e-8, c[..., 3:4], 1.0)
        return c[..., :2] / wc

    # Per-object motion: reconstruct the pixel's previous-frame position
    # via the draw's rigid delta D = inv(M) @ M_prev (exact for rigid
    # transforms — the reference interpolates last-frame HS positions for
    # its motion vectors, lighting.hlsl; one (H,W) row-gather of D here).
    minv = jnp.linalg.inv(instances.object_to_tw)
    delta = jnp.einsum("oij,ojk->oik", minv, instances.object_prev_to_tw)
    delta_d = delta[draw_object].reshape(-1, 16)          # (cap,16)
    if motion_div > 1:
        from . import post as _post
        slot_m = _post.decimate(slot, motion_div)
        valid_m = _post.decimate(valid, motion_div)
        pos_m = _post.decimate(pos_tw, motion_div)
        hm, wm = slot_m.shape
    else:
        slot_m, valid_m, pos_m, hm, wm = slot, valid, pos_tw, h, w
    # miss/sky pixels take the identity delta (pure camera reprojection);
    # clamping to draw 0 would leak that object's rigid motion into the
    # background fed to TSR. Row fetch via the row_gather bank-sweep
    # kernel (the (H,W)x16 XLA gather was the resolve's biggest).
    from .row_gather import gather_rows as _grows, pack_table as _ptab
    dcm = _ptab([delta_d[:, i] for i in range(16)])
    dpl = _grows(dcm, slot_m, interpret=interpret)
    _d = lambda i: jax.lax.bitcast_convert_type(dpl[i], jnp.float32)
    px_, py_, pz_ = pos_m[..., 0], pos_m[..., 1], pos_m[..., 2]
    prev_pos = jnp.stack(
        [px_ * _d(0) + py_ * _d(4) + pz_ * _d(8) + _d(12),
         px_ * _d(1) + py_ * _d(5) + pz_ * _d(9) + _d(13),
         px_ * _d(2) + py_ * _d(6) + pz_ * _d(10) + _d(14)], -1)
    # identity delta for misses == pure camera reprojection
    prev_pos = jnp.where(valid_m[..., None], prev_pos, pos_m)
    motion = project_xy(pos_m, tw_to_clip) - \
        project_xy(prev_pos, prev_tw_to_clip)
    if motion_div > 1:
        motion = _post.upsample_nearest(motion, motion_div, h, w)

    # ONE per-pixel row fetch from a per-draw material table (chaining
    # draw->object->material->per-channel gathers at (H,W) costs ~6 full
    # screen gathers; building the channel-major table first is ~free
    # since cap is tiny, then the row_gather bank-sweep Pallas kernel
    # serves every material channel — ~2x the XLA row gather, exact)
    from .row_gather import gather_rows, pack_table
    mat_id_d = instances.object_material[draw_object]          # (cap,)
    base_d = colorspace.srgb_to_acescg(
        pools.mat_base_color[mat_id_d][..., :3])
    mr_d = pools.mat_metal_rough[mat_id_d]
    em_d = colorspace.srgb_to_acescg(pools.mat_emissive[mat_id_d])
    cm = pack_table([
        base_d[:, 0], base_d[:, 1], base_d[:, 2],
        mr_d[:, 0], mr_d[:, 1],
        em_d[:, 0], em_d[:, 1], em_d[:, 2],
        pools.mat_base_tex[mat_id_d].astype(jnp.int32),
        pools.mat_normal_tex[mat_id_d].astype(jnp.int32),
        pools.mat_mr_tex[mat_id_d].astype(jnp.int32),
        pools.mat_emissive_tex[mat_id_d].astype(jnp.int32),
        pools.mat_normal_scale[mat_id_d]])
    mplanes = gather_rows(cm, slot, interpret=interpret)       # (16,H,W)
    _f = lambda c: jax.lax.bitcast_convert_type(mplanes[c], jnp.float32)
    base = jnp.stack([_f(0), _f(1), _f(2)], -1)
    metal_rough = jnp.stack([_f(3), _f(4)], -1)
    emissive = jnp.stack([_f(5), _f(6), _f(7)], -1)

    if textured:
        from . import texture as texture_ops

        size = pools.tex_size
        layer = mplanes[8]
        if mip_dither_frame is not None:
            # stochastic trilinear (ops/texture.py mip_dithered): IGN-
            # dithered mip pick, resolved temporally by TSR
            mip = texture_ops.mip_dithered(uv, size, mip_dither_frame)
        else:
            mip = texture_ops.mip_from_uv_density(uv, size)
        # ONE fused paged-sampler pass covers every material map (they
        # share uv/mip/size, so tap math + page gathers amortize across
        # channels — ops/paged_texture.py)
        layer_list = [layer]
        if pbr_textures:
            layer_list.append(mplanes[10])
            layer_list.append(mplanes[11])
        if normal_mapped:
            layer_list.append(mplanes[9])
        texels = texture_ops.sample_material_maps(
            pools, jnp.stack(layer_list), uv, mip)
        texel = texels[0]
        # textures are stored linear-sRGB primaries; convert to AP1
        base = base * colorspace.srgb_to_acescg(texel[..., :3])

        if pbr_textures:   # static: metal-rough + emissive map layers
            # glTF packing (lighting.hlsl samples the same channels):
            # G = roughness, B = metallic, multiplied onto the factors
            mr_texel = texels[1]
            metal_rough = metal_rough * jnp.stack(
                [mr_texel[..., 2], mr_texel[..., 1]], axis=-1)
            emissive = emissive * colorspace.srgb_to_acescg(
                texels[2][..., :3])

        # Tangent-space normal mapping WITHOUT stored tangents: build the
        # cotangent frame per pixel from screen-space derivatives of
        # position and uv (Schüler's method — the TPU stand-in for the
        # reference's vertex tangents + analytic uv gradients,
        # lighting.hlsl normal fetch + base.hlsli ddx/ddy). Derivatives
        # are shifted differences, masked to same-surface neighbors so
        # silhouette edges fall back to the geometric normal.
        if normal_mapped:   # static: traced only when normal maps exist
            n_layer = layer_list[-1]
            n_texel = texels[len(layer_list) - 1]
            n_scale = _f(12)[..., None]
            n_ts = n_texel[..., :3] * 2.0 - 1.0   # linear-stored, [-1,1]

            def ddx(a):
                return a - jnp.roll(a, 1, axis=1)

            def ddy(a):
                return a - jnp.roll(a, 1, axis=0)

            same_x = (slot == jnp.roll(slot, 1, axis=1)) & valid
            same_y = (slot == jnp.roll(slot, 1, axis=0)) & valid
            dp1 = jnp.where(same_x[..., None], ddx(pos_tw), 0.0)
            dp2 = jnp.where(same_y[..., None], ddy(pos_tw), 0.0)
            du1 = jnp.where(same_x[..., None], ddx(uv), 0.0)
            du2 = jnp.where(same_y[..., None], ddy(uv), 0.0)
            # cross orders flipped vs the GL formulation: our ddy is an
            # image-ROW derivative (y-down), which negates both frame
            # vectors — flipping the perps restores glTF's +u/+v handedness
            dp2perp = jnp.cross(nrm, dp2)
            dp1perp = jnp.cross(dp1, nrm)
            t = dp2perp * du1[..., 0:1] + dp1perp * du2[..., 0:1]
            b = dp2perp * du1[..., 1:2] + dp1perp * du2[..., 1:2]
            m2 = jnp.maximum(jnp.sum(t * t, -1), jnp.sum(b * b, -1))
            inv = jax.lax.rsqrt(jnp.maximum(m2, 1e-24))[..., None]
            pert = (t * inv * (n_ts[..., 0:1] * n_scale) +
                    b * inv * (n_ts[..., 1:2] * n_scale) +
                    nrm * jnp.maximum(n_ts[..., 2:3], 0.05))
            pert = pert * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(pert * pert, -1, keepdims=True), 1e-12))
            ok = (n_layer >= 0) & (m2 > 1e-24) & same_x & same_y
            nrm = jnp.where(ok[..., None], pert, nrm)

    vz = valid[..., None]
    return GBuffer(
        valid=valid,
        position_tw=jnp.where(vz, pos_tw, 0.0),
        normal=jnp.where(vz, nrm, 0.0),
        base_color=jnp.where(vz, base, 0.0),
        metallic=jnp.where(valid, metal_rough[..., 0], 0.0),
        roughness=jnp.where(valid, metal_rough[..., 1], 1.0),
        emissive=jnp.where(vz, emissive, 0.0),
        uv=jnp.where(vz, uv, 0.0),
        motion=jnp.where(vz, motion, 0.0),
    )


def alpha_mask_accept(
    vis_m: jnp.ndarray,          # (H,W) u32 masked-pass visibility
    depth_m: jnp.ndarray,        # (H,W) masked-pass reverse-Z depth
    depth_o: jnp.ndarray,        # (H,W) opaque depth
    u_m: jnp.ndarray, v_m: jnp.ndarray,   # masked-pass uv RTs
    draw_object_m: jnp.ndarray,  # (cap_m,) i32 masked draw table
    payload_base: int,           # slot offset of the masked pass
    pools, instances,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-pixel alpha test for the masked material bucket (the
    reference's Masked raster permutation does this with `discard` in the
    pixel shader, mesh_raster.hlsl + pipeline_filter.hlsl; here it's a
    deferred punch-through: masked fragments that fail the cutoff or lose
    the depth test against the opaque layer are dropped before the
    gbuffer resolve). Single masked layer: a masked surface directly
    behind a FAILING masked texel falls back to the opaque layer."""
    hit, keep = masked_alpha_keep(vis_m, u_m, v_m, draw_object_m,
                                  payload_base, pools, instances,
                                  interpret=interpret)
    return hit & (depth_m > depth_o) & keep


def masked_alpha_keep(
    vis_m: jnp.ndarray,          # (H,W) u32 masked-pass visibility
    u_m: jnp.ndarray, v_m: jnp.ndarray,
    draw_object_m: jnp.ndarray,
    payload_base: int,
    pools, instances,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel masked alpha test -> (hit, alpha >= cutoff). Shared by
    the main masked bucket and the alpha-tested shadow raster (the
    reference's Masked shadow permutation discards in the depth-only
    pixel shader, mesh_raster.hlsl DIM_PASS_TYPE=PASS_TYPE_DEPTH)."""
    from . import texture as texture_ops

    slot_g, _tri = unpack_visibility(vis_m)
    slot = slot_g - payload_base
    hit = slot_g >= 0
    slot_safe = jnp.where(hit, jnp.maximum(slot, 0), 0)
    # per-draw row table + ONE (H,W) 16-wide row gather (the chained
    # per-pixel scalar gathers draw->material->cutoff/factor/layer
    # measured ~30-43 ms/frame at 1080p; same pattern as
    # resolve_gbuffer_raster_rt's mat_table)
    from .row_gather import gather_rows, pack_table
    mat_d = instances.object_material[draw_object_m]          # (cap_m,)
    cm = pack_table([pools.mat_alpha_cutoff[mat_d],
                     pools.mat_base_color[mat_d][:, 3],
                     pools.mat_base_tex[mat_d].astype(jnp.int32)])
    rows = gather_rows(cm, slot_safe, interpret=interpret)    # (16,H,W)
    cutoff = jax.lax.bitcast_convert_type(rows[0], jnp.float32)
    factor = jax.lax.bitcast_convert_type(rows[1], jnp.float32)
    layer = rows[2]

    uv = jnp.stack([u_m, v_m], axis=-1)
    mip = texture_ops.mip_from_uv_density(uv, pools.tex_size)
    # nearest sampling: the alpha TEST is binary, bilinear only shifts
    # the cutoff crossing by <1 texel while costing 4x the tap gathers
    texel = texture_ops.sample_material_maps(
        pools, layer[None], uv, mip, bilinear=False)[0]
    alpha = factor * jnp.where(layer >= 0, texel[..., 3], 1.0)
    return hit, alpha >= cutoff


def shade_blend_layer(
    vis_b: jnp.ndarray,          # (H,W) u32 blend-pass visibility
    depth_b: jnp.ndarray,        # (H,W) blend-pass reverse-Z depth
    depth_o: jnp.ndarray,        # (H,W) opaque depth
    nx: jnp.ndarray, ny: jnp.ndarray, nz: jnp.ndarray,   # normal RTs
    u_b: jnp.ndarray, v_b: jnp.ndarray,                  # uv RTs
    draw_object_b: jnp.ndarray,  # (cap_b,) i32 blend draw table
    pools, instances,
    sun: "SunLight",
    sun_shadow: jnp.ndarray = None,       # (H,W) 1 = lit
    ambient: jnp.ndarray = None,          # (H,W,3) or (1,1,3) AP1
    interpret: bool = False,
    textured: bool = True,       # STATIC: any blend material carries a
                                 # base texture? False compiles the pass
                                 # WITHOUT the full-screen paged sampler
                                 # (9.3 ms at 4K for the bench's 10
                                 # untextured glass draws)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-shade ONE depth-peeled translucent layer (the glTF Blend
    bucket, asset_gltf.h:55-59 / pipeline_filter.hlsl; NOTE the
    reference's raster loops draw only opaque+masked — mesh_raster.cpp:
    178,224 stop at alphaMode 1 — so this pass EXCEEDS reference
    behavior). The rasterizer's closest-fragment rule is the depth peel;
    compositing is ordinary src-alpha blending against the lit scene.
    -> (color (H,W,3) AP1 premultiplied-by-nothing, alpha (H,W))."""
    from . import colorspace, texture as texture_ops

    slot, _tri = unpack_visibility(vis_b)
    hit = (slot >= 0) & (depth_b > depth_o)      # in front of opaque
    slot_safe = jnp.maximum(slot, 0)
    # per-draw row table + ONE (H,W) 16-wide row gather (chained
    # per-pixel scalar gathers are ~10x the cost — see masked_alpha_keep)
    from .row_gather import gather_rows, pack_table
    mat_d = instances.object_material[draw_object_b]          # (cap_b,)
    base_b = colorspace.srgb_to_acescg(pools.mat_base_color[mat_d][:, :3])
    em_b = colorspace.srgb_to_acescg(pools.mat_emissive[mat_d])
    cm = pack_table([base_b[:, 0], base_b[:, 1], base_b[:, 2],
                     pools.mat_base_color[mat_d][:, 3],
                     em_b[:, 0], em_b[:, 1], em_b[:, 2],
                     pools.mat_base_tex[mat_d].astype(jnp.int32)])
    rows = gather_rows(cm, slot_safe, interpret=interpret)    # (16,H,W)
    _fb = lambda c: jax.lax.bitcast_convert_type(rows[c], jnp.float32)
    alpha = _fb(3)
    albedo = jnp.stack([_fb(0), _fb(1), _fb(2)], -1)
    emissive = jnp.stack([_fb(4), _fb(5), _fb(6)], -1)
    layer = rows[7]
    if textured:
        uv = jnp.stack([u_b, v_b], axis=-1)
        mip = texture_ops.mip_from_uv_density(uv, pools.tex_size)
        texel = texture_ops.sample_material_maps(
            pools, layer[None], uv, mip)[0]
        has_tex = (layer >= 0)[..., None]
        albedo = jnp.where(has_tex,
                           albedo *
                           colorspace.srgb_to_acescg(texel[..., :3]),
                           albedo)
        alpha = alpha * jnp.where(layer >= 0, texel[..., 3], 1.0)

    n = jnp.stack([nx, ny, nz], axis=-1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    ndl = jnp.clip(jnp.sum(n * sun.direction, -1), 0.0, 1.0)
    lit = ndl if sun_shadow is None else ndl * sun_shadow
    amb = (ambient if ambient is not None
           else sun.sky_ambient[None, None, :] * 0.5)
    color = albedo * (sun.radiance * lit[..., None] / np.pi + amb) + emissive
    alpha = jnp.where(hit, jnp.clip(alpha, 0.0, 1.0), 0.0)
    return color, alpha


def resolve_gbuffer_fast(
    vis: jnp.ndarray,            # (H,W) u32 packed (slot+1):25|tri:7
    depth: jnp.ndarray,          # (H,W) f32 reverse-Z from the rasterizer
    b0: jnp.ndarray,             # (H,W) f32 winner barycentrics (raster RT)
    b1: jnp.ndarray,
    stream,                      # renderer.meshlet_frame.DrawStream (concat'd)
    draw_object: jnp.ndarray,    # (cap,) i32 combined draw table
    pools,
    instances,
    clip_to_tw: jnp.ndarray,     # (4,4) inverse view-proj (no jitter)
    tw_to_clip: jnp.ndarray,     # (4,4) current view-proj (no jitter)
    prev_tw_to_clip: jnp.ndarray,
) -> GBuffer:
    """Gather-minimal gbuffer resolve (the production path).

    Positions come from unprojecting the raster depth (zero gathers);
    barycentrics come straight from the rasterizer's extra render targets;
    normals/uv are narrow bf16 SoA gathers from the draw stream (wide row
    gathers are 3-25x slower on TPU — measured). Motion uses camera-only
    reprojection (static scene; per-object motion needs the slow path).
    """
    from ..rhi.framebuffer import unpack_visibility

    h, w = vis.shape
    slot, tri = unpack_visibility(vis)
    valid = slot >= 0
    corner = jnp.maximum(slot, 0) * 384 + tri * 3     # (H,W)

    b2 = 1.0 - b0 - b1

    def interp(tbl):
        t0 = tbl[corner].astype(jnp.float32)
        t1 = tbl[corner + 1].astype(jnp.float32)
        t2 = tbl[corner + 2].astype(jnp.float32)
        return b0 * t0 + b1 * t1 + b2 * t2

    nx = interp(stream.nrm_x)
    ny = interp(stream.nrm_y)
    nz = interp(stream.nrm_z)
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
    nrm = jnp.stack([nx * inv_len, ny * inv_len, nz * inv_len], axis=-1)
    uv = jnp.stack([interp(stream.uv_u), interp(stream.uv_v)], axis=-1)

    # position: unproject pixel-center NDC + raster depth
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))
    ph = (px[..., None] * clip_to_tw[0] + py[..., None] * clip_to_tw[1] +
          depth[..., None] * clip_to_tw[2] + clip_to_tw[3])
    pos_tw = ph[..., :3] / jnp.where(jnp.abs(ph[..., 3:4]) > 1e-12,
                                     ph[..., 3:4], 1.0)

    # motion: camera reprojection (NDC now - NDC prev)
    def project_xy(p3, vp):
        c = (p3[..., 0:1] * vp[0] + p3[..., 1:2] * vp[1] +
             p3[..., 2:3] * vp[2] + vp[3])
        wc = jnp.where(jnp.abs(c[..., 3:4]) > 1e-8, c[..., 3:4], 1.0)
        return c[..., :2] / wc

    motion = project_xy(pos_tw, tw_to_clip) - \
        project_xy(pos_tw, prev_tw_to_clip)

    obj = draw_object[jnp.maximum(slot, 0)]
    mat_id = instances.object_material[obj]
    base_srgb = pools.mat_base_color[mat_id][..., :3]
    base = colorspace.srgb_to_acescg(base_srgb)
    metal_rough = pools.mat_metal_rough[mat_id]
    emissive = colorspace.srgb_to_acescg(pools.mat_emissive[mat_id])

    vz = valid[..., None]
    return GBuffer(
        valid=valid,
        position_tw=jnp.where(vz, pos_tw, 0.0),
        normal=jnp.where(vz, nrm, 0.0),
        base_color=jnp.where(vz, base, 0.0),
        metallic=jnp.where(valid, metal_rough[..., 0], 0.0),
        roughness=jnp.where(valid, metal_rough[..., 1], 1.0),
        emissive=jnp.where(vz, emissive, 0.0),
        uv=jnp.where(vz, uv, 0.0),
        motion=jnp.where(vz, motion, 0.0),
    )


def _resolve_from_ids(
    idx: jnp.ndarray,            # (H,W,3) pool-space vertex ids
    obj: jnp.ndarray,            # (H,W) instance slots
    valid: jnp.ndarray,          # (H,W) bool
    pools,                       # needs positions/normals/uv0/mat_* tables
    instances,
    view_tw_to_clip: jnp.ndarray,
    prev_tw_to_clip: jnp.ndarray,
) -> GBuffer:
    h, w = valid.shape

    p0 = pools.positions[idx[..., 0]]                # (H,W,3) local
    p1 = pools.positions[idx[..., 1]]
    p2 = pools.positions[idx[..., 2]]
    n0 = pools.normals[idx[..., 0]]
    n1 = pools.normals[idx[..., 1]]
    n2 = pools.normals[idx[..., 2]]
    uv0 = pools.uv0[idx[..., 0]]
    uv1 = pools.uv0[idx[..., 1]]
    uv2 = pools.uv0[idx[..., 2]]

    m = instances.object_to_tw[obj]                  # (H,W,4,4)
    mp = instances.object_prev_to_tw[obj]
    nm = instances.object_normal_mat[obj]            # (H,W,3,3)

    def xf(p, mat):
        # row-vector: p' = p @ mat (homogeneous, w row added)
        return (p[..., 0:1] * mat[..., 0, :] + p[..., 1:2] * mat[..., 1, :] +
                p[..., 2:3] * mat[..., 2, :] + mat[..., 3, :])

    tw0 = xf(p0, m)                                  # (H,W,4) but w==1 col
    tw1 = xf(p1, m)
    tw2 = xf(p2, m)

    def clip_of(twp, vp):
        return (twp[..., 0:1] * vp[0] + twp[..., 1:2] * vp[1] +
                twp[..., 2:3] * vp[2] + twp[..., 3:4] * vp[3])

    c0 = clip_of(tw0, view_tw_to_clip)
    c1 = clip_of(tw1, view_tw_to_clip)
    c2 = clip_of(tw2, view_tw_to_clip)

    # Pixel center NDC coordinates (y up in NDC, y down in pixels).
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))

    b0, b1, b2 = _barycentrics_from_clip(c0, c1, c2, px, py)
    bexp = lambda b: b[..., None]

    pos_tw = (bexp(b0) * tw0[..., :3] + bexp(b1) * tw1[..., :3] +
              bexp(b2) * tw2[..., :3])
    nrm_local = bexp(b0) * n0 + bexp(b1) * n1 + bexp(b2) * n2
    nrm = (nrm_local[..., 0:1] * nm[..., 0, :] +
           nrm_local[..., 1:2] * nm[..., 1, :] +
           nrm_local[..., 2:3] * nm[..., 2, :])
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
    uv = bexp(b0) * uv0 + bexp(b1) * uv1 + bexp(b2) * uv2

    # Motion vector: NDC delta of the interpolated surface point between
    # frames (reference: mesh_raster writes no-jitter HS positions for this,
    # SURVEY.md §8.3).
    prev_tw0 = xf(p0, mp)
    prev_tw1 = xf(p1, mp)
    prev_tw2 = xf(p2, mp)
    prev_pos = (bexp(b0) * prev_tw0[..., :3] + bexp(b1) * prev_tw1[..., :3] +
                bexp(b2) * prev_tw2[..., :3])

    def project_ndc(p3, vp):
        c = (p3[..., 0:1] * vp[0] + p3[..., 1:2] * vp[1] +
             p3[..., 2:3] * vp[2] + vp[3])
        return c[..., :2] / jnp.maximum(jnp.abs(c[..., 3:4]), 1e-8) * \
            jnp.sign(c[..., 3:4])

    ndc_now = project_ndc(pos_tw, view_tw_to_clip)
    ndc_prev = project_ndc(prev_pos, prev_tw_to_clip)
    motion = ndc_now - ndc_prev

    mat_id = instances.object_material[obj]
    base_srgb = pools.mat_base_color[mat_id][..., :3]
    base = colorspace.srgb_to_acescg(base_srgb)
    metal_rough = pools.mat_metal_rough[mat_id]
    emissive = colorspace.srgb_to_acescg(pools.mat_emissive[mat_id])

    vz = valid[..., None]
    return GBuffer(
        valid=valid,
        position_tw=jnp.where(vz, pos_tw, 0.0),
        normal=jnp.where(vz, nrm, 0.0),
        base_color=jnp.where(vz, base, 0.0),
        metallic=jnp.where(valid, metal_rough[..., 0], 0.0),
        roughness=jnp.where(valid, metal_rough[..., 1], 1.0),
        emissive=jnp.where(vz, emissive, 0.0),
        uv=jnp.where(vz, uv, 0.0),
        motion=jnp.where(vz, motion, 0.0),
    )


# --- BRDF ------------------------------------------------------------------
# GLTF metallic-roughness GGX, matching the reference's BRDF
# (install/resource/shader/material.hlsli / lighting.hlsl:75-135).

def _d_ggx(noh: jnp.ndarray, a2: jnp.ndarray) -> jnp.ndarray:
    d = noh * noh * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-8)


def _v_smith_ggx_correlated(nov, nol, a2):
    # Height-correlated Smith visibility (includes the 1/(4 NoV NoL)).
    ggx_v = nol * jnp.sqrt(jnp.maximum(nov * nov * (1.0 - a2) + a2, 1e-8))
    ggx_l = nov * jnp.sqrt(jnp.maximum(nol * nol * (1.0 - a2) + a2, 1e-8))
    return 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-8)


def _f_schlick(voh, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - voh, 0.0, 1.0), 5.0)


def shade_pixels(
    gbuffer: GBuffer,
    sun: SunLight,
    view_pos_tw: Optional[jnp.ndarray] = None,  # camera at origin in TW
    sun_shadow: Optional[jnp.ndarray] = None,   # (H,W) [0,1] visibility
    sky_radiance: Optional[jnp.ndarray] = None, # (H,W,3) AP1 for sky pixels
    ambient: Optional[jnp.ndarray] = None,      # (H,W,3) or None -> flat sky
) -> jnp.ndarray:
    """Per-pixel direct lighting -> (H,W,3) HDR AP1.

    Sun (with optional shadow mask) + hemispherical ambient. Indirect
    diffuse/specular GI are composited separately (ops/gi.py).
    """
    g = gbuffer
    n = g.normal
    # View ray: camera sits at the origin of translated world.
    v = -g.position_tw
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    l = jnp.broadcast_to(sun.direction, n.shape)
    h = v + l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)

    nol = jnp.clip(jnp.sum(n * l, -1), 0.0, 1.0)
    nov = jnp.clip(jnp.sum(n * v, -1), 1e-4, 1.0)
    noh = jnp.clip(jnp.sum(n * h, -1), 0.0, 1.0)
    voh = jnp.clip(jnp.sum(v * h, -1), 0.0, 1.0)

    a = jnp.maximum(g.roughness * g.roughness, 1e-3)
    a2 = a * a
    f0 = 0.04 * (1.0 - g.metallic[..., None]) + \
        g.base_color * g.metallic[..., None]
    diffuse_color = g.base_color * (1.0 - g.metallic[..., None])

    d = _d_ggx(noh, a2)
    vis = _v_smith_ggx_correlated(nov, nol, a2)
    f = _f_schlick(voh[..., None], f0)
    specular = (d * vis)[..., None] * f
    diffuse = diffuse_color / jnp.pi

    shadow = sun_shadow if sun_shadow is not None else 1.0
    direct = (diffuse + specular) * (nol * shadow)[..., None] * sun.radiance

    if ambient is None:
        # Flat hemispherical ambient from the sky color (pre-atmosphere
        # bootstrap; replaced by GI + atmosphere when enabled).
        up_wrap = jnp.clip(n[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
        ambient = sun.sky_ambient * up_wrap
    indirect = diffuse_color * ambient

    lit = direct + indirect + g.emissive

    if sky_radiance is None:
        sky_radiance = jnp.broadcast_to(sun.sky_ambient, lit.shape)
    return jnp.where(g.valid[..., None], lit, sky_radiance)
