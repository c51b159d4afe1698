"""Meshlet-based GPU scene: shared geometry + instance-meshlet draw pairs.

TPU-native equivalent of the reference GPUScene + GPU-driven draw stream
(reference: renderer/gpu_scene.h:21-171 — persistent pools addressed by id;
install/resource/shader/instance_culling.hlsl:48-208 — per-object cluster
group append producing `uint3{objectId, meshletId, slot}` draw commands).

Unlike the flat path (scene_arrays.py, which duplicates geometry per
instance), this path stores each mesh's geometry ONCE and draws
(instance, meshlet) pairs:

- Geometry pools: positions/normals/uv0 stacked over meshes; indices
  REORDERED so each meshlet's <=128 triangles are contiguous; triangle
  index rows padded so every meshlet owns exactly a 128-triangle window
  (degenerate padding rows reference vertex 0 and are masked by
  tri_count) — one meshlet == one dense raster chunk.
- Meshlet tables: per-meshlet sphere/cone/LOD data (gathered per frame by
  the culling kernels).
- Pair table: static (instance, meshlet) pairs for the whole scene — the
  worst-case draw stream the cull kernels compact from.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import chex
import jax.numpy as jnp
import numpy as np

from ..geometry.meshlet import build_meshlets
from ..utils.log import get_logger
from .scene_arrays import SceneBuilder

log = get_logger("rhi.meshlet")

MESHLET_TRIS = 128   # raster chunk width == meshlet max tris


def _empty_tex_pool():
    """1-layer 1x1 placeholder (total texels for size=1 is 1)."""
    return jnp.full((1, 1, 4), 255, jnp.uint8)


@chex.dataclass(frozen=True)
class MeshletScenePools:
    """Device pools for the meshlet path (jax pytree)."""

    # geometry (stacked over meshes, shared across instances)
    positions: jnp.ndarray       # (V,3) f32 local space
    normals: jnp.ndarray         # (V,3) f32
    uv0: jnp.ndarray             # (V,2) f32
    # per-meshlet dense triangle windows: (M*128, 3) pool-space vertex ids,
    # padded rows repeat the meshlet's first vertex (degenerate, masked).
    tri_indices: jnp.ndarray     # (M*128,3) i32
    # meshlet tables
    meshlet_sphere: jnp.ndarray  # (M,4) f32 local bounding sphere
    meshlet_cone: jnp.ndarray    # (M,4) f32 axis.xyz + cutoff
    meshlet_tri_count: jnp.ndarray  # (M,) i32
    meshlet_error: jnp.ndarray      # (M,) f32 cluster error (Nanite)
    meshlet_parent_error: jnp.ndarray  # (M,) f32
    meshlet_lod_sphere: jnp.ndarray    # (M,4) f32 error-projection sphere
    meshlet_parent_sphere: jnp.ndarray # (M,4) f32 parent group sphere
    meshlet_lod: jnp.ndarray           # (M,) i32 LOD level (visualize)
    # corner-major per-meshlet geometry for the mesh-shader expand kernel
    # (ops/mesh_shader.py): rows [x0,y0,z0,pad, x1,y1,z1,pad, x2,y2,z2,pad]
    # per 128-triangle window; +1 poison window at the end.
    mv_posT: jnp.ndarray         # (12, (M+1)*128) f32
    # rows [n0x,n0y,n0z,u0,v0, n1...,n2..., pad] per corner
    mv_attrT: jnp.ndarray        # (16, (M+1)*128) f32
    # static draw-pair table
    pair_object: jnp.ndarray     # (P,) i32 instance slot
    pair_meshlet: jnp.ndarray    # (P,) i32 meshlet id
    pair_valid: jnp.ndarray      # (P,) bool
    # pre-gathered per-pair cull data (meshlet tables indexed by
    # pair_meshlet at BUILD time — per-frame gathers lower poorly on TPU):
    # [sphere xyzr | cone xyzw | lod_sphere | parent_sphere | err, perr]
    pair_cull: jnp.ndarray       # (P, 18) f32
    # materials (same layout as the flat path)
    mat_base_color: jnp.ndarray
    mat_metal_rough: jnp.ndarray
    mat_emissive: jnp.ndarray
    mat_base_tex: jnp.ndarray    # (M,) i32 texture layer id, -1 = none
    mat_normal_tex: jnp.ndarray  # (M,) i32 normal-map layer id, -1 = none
    mat_normal_scale: jnp.ndarray  # (M,) f32 normal perturbation scale
    mat_mr_tex: jnp.ndarray      # (M,) i32 metal-rough layer id, -1 = none
    mat_emissive_tex: jnp.ndarray  # (M,) i32 emissive layer id, -1 = none
    mat_alpha_cutoff: jnp.ndarray  # (M,) f32 (alpha-mask cutoff)
    tex_pool: jnp.ndarray        # (L, total_texels, 4) u8 flat-mip stack
    # paged virtual-texture pool (ops/paged_texture.py): apron-tiled
    # (8,128)-vreg pages + entry table, the fast full-res sampling path
    tex_pages: jnp.ndarray       # (n_pages*8, 128) i32 RGBA8-packed
    tex_meta: jnp.ndarray        # (2, E_pad) i32 [page base | avg color]

    @property
    def tex_size(self) -> int:
        # total = sum_{k} (size/2^k)^2 = (4*size^2 - 1) / 3
        total = self.tex_pool.shape[1]
        import math
        return int(math.isqrt((3 * total + 1) // 4))

    @property
    def num_meshlets(self) -> int:
        return self.meshlet_sphere.shape[0]

    @property
    def num_pairs(self) -> int:
        return self.pair_object.shape[0]


def build_meshlet_pools(builder: SceneBuilder,
                        meshlet_cache: Optional[Dict[int, tuple]] = None,
                        nanite: bool = False,
                        texture_pool=None,
                        texture_compress: Optional[bool] = None
                        ) -> MeshletScenePools:
    """SceneBuilder (meshes + instances) -> meshlet device pools.

    Meshlets are built per MESH (not per instance) and shared; the pair
    table expands instances × their mesh's meshlets. With nanite=True the
    C++ builder (native/nanite.cpp) produces the FULL cluster-LOD DAG —
    meshlets of every LOD level live in one flat table and the runtime cut
    (ops/cull.py lod_cut_visible) selects exactly one level per screen
    size (reference: asset/nanite_builder.cpp GMSS).
    """
    v_base = 0
    m_base = 0
    mesh_vbase: List[int] = []
    mesh_meshlets: List[Tuple[int, int]] = []   # (meshlet base, count)
    pos_l, nrm_l, uv_l, tri_l = [], [], [], []
    sph_l, cone_l, cnt_l, err_l, perr_l, lsph_l, psph_l, lvl_l = \
        [], [], [], [], [], [], [], []

    cache = meshlet_cache if meshlet_cache is not None else {}
    for mesh_id, mesh in enumerate(builder.meshes):
        if mesh_id in cache:
            tbl = cache[mesh_id]
        elif nanite:
            from ..native import nanite_build
            tbl = nanite_build(mesh.positions, mesh.indices, build_lods=True)
            cache[mesh_id] = tbl
        else:
            md, reordered = build_meshlets(mesh.positions, mesh.indices)
            tbl = {
                "indices": reordered,
                "tri_offset": md.tri_offset, "tri_count": md.tri_count,
                "sphere": md.sphere,
                "cone": np.concatenate([md.cone_axis,
                                        md.cone_cutoff[:, None]], 1),
                "lod_error": md.lod_error,
                "parent_error": md.parent_error,
                "lod_sphere": md.lod_sphere,
                "parent_sphere": md.lod_sphere,
                "lod_level": np.zeros(md.count, np.int32),
            }
            cache[mesh_id] = tbl
        count = len(tbl["tri_offset"])
        reordered = tbl["indices"]
        mesh_vbase.append(v_base)
        mesh_meshlets.append((m_base, count))

        pos_l.append(mesh.positions)
        nrm_l.append(mesh.normals)
        uv_l.append(mesh.uv0)

        # dense per-meshlet 128-triangle windows
        win = np.zeros((count, MESHLET_TRIS, 3), np.int64)
        for k in range(count):
            o, c = int(tbl["tri_offset"][k]), int(tbl["tri_count"][k])
            tris = reordered[o:o + c]
            win[k, :c] = tris
            if c < MESHLET_TRIS:
                win[k, c:] = tris[0, 0]      # degenerate padding
        tri_l.append((win + v_base).reshape(-1, 3).astype(np.int32))

        sph_l.append(np.asarray(tbl["sphere"], np.float32))
        cone_l.append(np.asarray(tbl["cone"], np.float32))
        cnt_l.append(np.asarray(tbl["tri_count"], np.int32))
        err_l.append(np.asarray(tbl["lod_error"], np.float32))
        perr_l.append(np.asarray(tbl["parent_error"], np.float32))
        lsph_l.append(np.asarray(tbl["lod_sphere"], np.float32))
        psph_l.append(np.asarray(tbl["parent_sphere"], np.float32))
        lvl_l.append(np.asarray(tbl["lod_level"], np.int32))

        v_base += mesh.num_vertices
        m_base += count

    # pair table
    pair_obj, pair_mesh = [], []
    for oid, (mesh_id, _mat, _m) in enumerate(builder.instances):
        mb, mc = mesh_meshlets[mesh_id]
        pair_obj.append(np.full(mc, oid, np.int32))
        pair_mesh.append(np.arange(mb, mb + mc, dtype=np.int32))
    pair_object = np.concatenate(pair_obj) if pair_obj else np.zeros(0, np.int32)
    pair_meshlet = np.concatenate(pair_mesh) if pair_mesh else np.zeros(0, np.int32)
    n_pairs = len(pair_object)
    pad = (-n_pairs) % 128
    if pad:
        pair_object = np.concatenate([pair_object, np.zeros(pad, np.int32)])
        pair_meshlet = np.concatenate([pair_meshlet, np.zeros(pad, np.int32)])
    pair_valid = np.zeros(len(pair_object), bool)
    pair_valid[:n_pairs] = True

    # corner-major tables (zero-gather mesh-shader inputs)
    tri_all = np.concatenate(tri_l)                    # (M*128, 3)
    pos_all = np.concatenate(pos_l)
    nrm_all = np.concatenate(nrm_l)
    uv_all = np.concatenate(uv_l)
    c0, c1, c2 = tri_all[:, 0], tri_all[:, 1], tri_all[:, 2]
    pad_col = np.zeros(len(tri_all), np.float32)
    mv_posT = np.stack([
        pos_all[c0, 0], pos_all[c0, 1], pos_all[c0, 2], pad_col,
        pos_all[c1, 0], pos_all[c1, 1], pos_all[c1, 2], pad_col,
        pos_all[c2, 0], pos_all[c2, 1], pos_all[c2, 2], pad_col], 0)
    mv_attrT = np.stack(
        [nrm_all[c0, 0], nrm_all[c0, 1], nrm_all[c0, 2],
         uv_all[c0, 0], uv_all[c0, 1],
         nrm_all[c1, 0], nrm_all[c1, 1], nrm_all[c1, 2],
         uv_all[c1, 0], uv_all[c1, 1],
         nrm_all[c2, 0], nrm_all[c2, 1], nrm_all[c2, 2],
         uv_all[c2, 0], uv_all[c2, 1], pad_col], 0)
    # poison window (degenerate corners at origin)
    mv_posT = np.concatenate([mv_posT, np.zeros((12, 128), np.float32)], 1)
    mv_attrT = np.concatenate([mv_attrT, np.zeros((16, 128), np.float32)], 1)

    sph_all = np.concatenate(sph_l)
    cone_all = np.concatenate(cone_l)
    lsph_all = np.concatenate(lsph_l)
    psph_all = np.concatenate(psph_l)
    err_all = np.concatenate(err_l)
    perr_all = np.concatenate(perr_l)
    pair_cull = np.concatenate(
        [sph_all[pair_meshlet], cone_all[pair_meshlet],
         lsph_all[pair_meshlet], psph_all[pair_meshlet],
         err_all[pair_meshlet, None], perr_all[pair_meshlet, None]],
        axis=1).astype(np.float32)

    mats = builder.materials
    # paged virtual-texture pool (apron-tiled vreg pages; the full-res
    # sampling fast path — ops/paged_texture.py)
    from ..ops.paged_texture import pack_paged_pool
    if texture_compress is None:
        from ..utils.cvar import cvars
        texture_compress = bool(cvars.get("r.texture.compress"))
    if texture_pool is not None and texture_pool.textures:
        np_tex = np.clip(np.stack(texture_pool.textures) * 255.0 + 0.5,
                         0, 255).astype(np.uint8)
        tex_pages, tex_meta, _ = pack_paged_pool(
            np_tex, texture_pool.mip_sizes, texture_pool.mip_offsets,
            compress=texture_compress)
    else:
        tex_pages, tex_meta, _ = pack_paged_pool(
            np.full((1, 1, 4), 255, np.uint8), (1,), (0,),
            compress=texture_compress)
    pools = MeshletScenePools(
        positions=jnp.asarray(np.concatenate(pos_l)),
        normals=jnp.asarray(np.concatenate(nrm_l)),
        uv0=jnp.asarray(np.concatenate(uv_l)),
        tri_indices=jnp.asarray(tri_all),
        mv_posT=jnp.asarray(mv_posT),
        mv_attrT=jnp.asarray(mv_attrT),
        meshlet_sphere=jnp.asarray(np.concatenate(sph_l)),
        meshlet_cone=jnp.asarray(np.concatenate(cone_l)),
        meshlet_tri_count=jnp.asarray(np.concatenate(cnt_l)),
        meshlet_error=jnp.asarray(np.concatenate(err_l)),
        meshlet_parent_error=jnp.asarray(np.concatenate(perr_l)),
        meshlet_lod_sphere=jnp.asarray(np.concatenate(lsph_l)),
        meshlet_parent_sphere=jnp.asarray(np.concatenate(psph_l)),
        meshlet_lod=jnp.asarray(np.concatenate(lvl_l)),
        pair_object=jnp.asarray(pair_object),
        pair_meshlet=jnp.asarray(pair_meshlet),
        pair_valid=jnp.asarray(pair_valid),
        pair_cull=jnp.asarray(pair_cull),
        mat_base_color=jnp.asarray(
            np.array([m.base_color for m in mats], np.float32)),
        mat_metal_rough=jnp.asarray(
            np.array([[m.metallic, m.roughness] for m in mats], np.float32)),
        mat_emissive=jnp.asarray(
            np.array([m.emissive for m in mats], np.float32)),
        mat_base_tex=jnp.asarray(
            np.array([m.base_color_texture for m in mats], np.int32)),
        mat_normal_tex=jnp.asarray(
            np.array([m.normal_texture for m in mats], np.int32)),
        mat_normal_scale=jnp.asarray(
            np.array([m.normal_scale for m in mats], np.float32)),
        mat_mr_tex=jnp.asarray(
            np.array([m.metal_rough_texture for m in mats], np.int32)),
        mat_emissive_tex=jnp.asarray(
            np.array([m.emissive_texture for m in mats], np.int32)),
        mat_alpha_cutoff=jnp.asarray(
            np.array([m.alpha_cutoff for m in mats], np.float32)),
        tex_pool=(texture_pool.device_array()
                  if texture_pool is not None else _empty_tex_pool()),
        tex_pages=tex_pages,
        tex_meta=tex_meta,
    )
    log.info("MeshletScenePools: %d meshes, %d meshlets, %d pairs, %d verts",
             len(builder.meshes), m_base, n_pairs, v_base)
    return pools
