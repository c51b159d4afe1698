"""Array RHI: the GPU scene as flat HBM pools.

TPU-native equivalent of the reference GPUScene + BindlessManager pair
(reference: source/renderer/gpu_scene.h:21-171 — persistent slot-allocated
GPU pools for primitive data / primitive detail / material, scatter-uploaded
each frame; source/graphics/bindless.h — one global descriptor set indexed by
uint ids).  TPUs have no descriptors, so "bindless buffer id + element id"
(shader BATL/BATS macros, install/resource/shader/bindless.hlsli:35-62)
becomes *gather from a stacked array at an int32 offset*.

Pools (all device arrays, static after scene load):
    positions (V,3) f32   object-local vertex positions
    normals   (V,3) f32   object-local normals
    uv0       (V,2) f32
    indices   (T,3) i32   global (pool-space) vertex indices
    tri_object (T,) i32   per-triangle object slot (flat path; the meshlet
                          path replaces this with meshlet tables)
    materials             SoA material table

Per-frame dynamic data (rebuilt on host each frame, tiny):
    object_to_tw      (O,4,4) f32  local → translated-world (camera-rebased)
    object_prev_to_tw (O,4,4) f32  previous frame (motion vectors)
    object_material   (O,)    i32
    object_sphere     (O,4)   f32  bounding sphere in translated world
    object_aabb_local (O,2,3) f32  local AABB (for OBB frustum culling)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import chex
import jax.numpy as jnp
import numpy as np

from ..utils.allocator import SpanAllocator, Span
from ..utils.log import get_logger

log = get_logger("rhi")


def _pad_rows(a: np.ndarray, multiple: int, fill=0) -> np.ndarray:
    n = a.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return a
    pad_block = np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad_block], axis=0)


@dataclass
class MeshData:
    """CPU-side mesh: the unit registered into the pools (the analog of one
    GLTF primitive, reference: asset/gltf/asset_gltf.h:260-287)."""

    positions: np.ndarray          # (V,3) f32 local space
    indices: np.ndarray            # (T,3) i32 local vertex indices
    normals: Optional[np.ndarray] = None   # (V,3) f32
    uv0: Optional[np.ndarray] = None       # (V,2) f32
    # optional streams at reference parity (asset/gltf/asset_gltf.h:
    # 260-287 carries tangents + optional uv1/color0). The deferred
    # shading path derives its tangent frame per pixel (Schüler cotangent
    # frame, ops/shading.py) so stored tangents are not consumed by the
    # hot path — they are preserved for tooling/export and validated
    # against the cotangent frame by tests/test_tangent.py.
    tangents: Optional[np.ndarray] = None  # (V,4) f32 xyz + handedness w
    uv1: Optional[np.ndarray] = None       # (V,2) f32 second uv set
    color0: Optional[np.ndarray] = None    # (V,4) f32 vertex color
    name: str = ""

    def __post_init__(self) -> None:
        self.positions = np.ascontiguousarray(self.positions, np.float32)
        self.indices = np.ascontiguousarray(self.indices, np.int32).reshape(-1, 3)
        if self.normals is None:
            self.normals = compute_vertex_normals(self.positions, self.indices)
        self.normals = np.ascontiguousarray(self.normals, np.float32)
        if self.uv0 is None:
            self.uv0 = np.zeros((len(self.positions), 2), np.float32)
        self.uv0 = np.ascontiguousarray(self.uv0, np.float32)
        for f in ("tangents", "uv1", "color0"):
            v = getattr(self, f)
            if v is not None:
                setattr(self, f, np.ascontiguousarray(v, np.float32))

    @property
    def num_vertices(self) -> int:
        return len(self.positions)

    @property
    def num_triangles(self) -> int:
        return len(self.indices)

    def local_aabb(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.positions.min(0), self.positions.max(0)


def compute_vertex_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    p = positions.astype(np.float64)
    i0, i1, i2 = indices[:, 0], indices[:, 1], indices[:, 2]
    fn = np.cross(p[i1] - p[i0], p[i2] - p[i0])
    n = np.zeros_like(p)
    for k, idx in enumerate((i0, i1, i2)):
        np.add.at(n, idx, fn)
    length = np.linalg.norm(n, axis=1, keepdims=True)
    n = np.where(length > 1e-20, n / np.maximum(length, 1e-20), [0.0, 1.0, 0.0])
    return n.astype(np.float32)


@dataclass
class MaterialData:
    """GLTF metallic-roughness material constants (reference:
    shader/gltf.h GLTFMaterialGPUData)."""

    base_color: Tuple[float, float, float, float] = (0.8, 0.8, 0.8, 1.0)
    metallic: float = 0.0
    roughness: float = 0.8
    emissive: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    base_color_texture: int = -1   # id into the texture stack, -1 = none
    normal_texture: int = -1       # tangent-space normal map layer, -1 = none
    normal_scale: float = 1.0      # glTF normalTexture.scale
    metal_rough_texture: int = -1  # glTF MR map (G=roughness, B=metallic)
    emissive_texture: int = -1     # sRGB emissive map
    two_sided: bool = False
    # glTF alphaMode: "opaque" | "mask" | "blend" (the reference buckets
    # raster pipelines by alphaMode the same way, pipeline_filter.hlsl /
    # mesh_raster.cpp:54-56; its raster loops draw only opaque+masked —
    # the TPU build also renders one depth-peeled blend layer)
    alpha_mode: str = "opaque"
    alpha_cutoff: float = 0.5
    name: str = ""


@chex.dataclass(frozen=True)
class ScenePools:
    """Device-resident geometry + material pools (jax pytree)."""

    positions: jnp.ndarray     # (V,3) f32
    normals: jnp.ndarray       # (V,3) f32
    uv0: jnp.ndarray           # (V,2) f32
    vertex_object: jnp.ndarray # (V,) i32  object slot per vertex
    indices: jnp.ndarray       # (T,3) i32 pool-space
    tri_object: jnp.ndarray    # (T,) i32  object slot per triangle
    tri_valid: jnp.ndarray     # (T,) bool padding mask
    mat_base_color: jnp.ndarray   # (M,4) f32
    mat_metal_rough: jnp.ndarray  # (M,2) f32
    mat_emissive: jnp.ndarray     # (M,3) f32

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]


@chex.dataclass(frozen=True)
class FrameInstances:
    """Per-frame object table in translated world (jax pytree) — the analog
    of the GLTFObjectInfo upload (reference: renderer/renderer.cpp:224-263)."""

    object_to_tw: jnp.ndarray        # (O,4,4) f32 row-vector
    object_prev_to_tw: jnp.ndarray   # (O,4,4) f32
    object_normal_mat: jnp.ndarray   # (O,3,3) f32  n' = n @ NM
    object_material: jnp.ndarray     # (O,) i32
    object_two_sided: jnp.ndarray    # (O,) f32 0/1 (material doubleSided)
    object_masked: jnp.ndarray       # (O,) f32 0/1 (material alphaMode==mask)
    object_blend: jnp.ndarray        # (O,) f32 0/1 (material alphaMode==blend)
    object_sphere_tw: jnp.ndarray    # (O,4) f32 center.xyz + radius, translated world
    object_obb_tw: jnp.ndarray       # (O,12) f32 OBB: center.xyz + 3 world
                                     # half-axis vectors (local AABB through
                                     # the instance transform — the
                                     # reference's per-object OBB,
                                     # instance_culling.hlsl:48-131)
    object_valid: jnp.ndarray        # (O,) bool


class SceneBuilder:
    """Assembles MeshData + materials + instances into device pools.

    Keeps the span-allocator discipline of GPUScene (stable slots, pools can
    be rebuilt incrementally) but for round-1 the common path is build-once.
    """

    def __init__(self) -> None:
        self.meshes: List[MeshData] = []
        self.materials: List[MaterialData] = [MaterialData(name="default")]
        # instances: (mesh_id, material_id, local_to_world f64 4x4)
        self.instances: List[Tuple[int, int, np.ndarray]] = []
        self._vspans: List[Span] = []
        self._valloc = SpanAllocator()
        self._talloc = SpanAllocator()

    def add_mesh(self, mesh: MeshData) -> int:
        self.meshes.append(mesh)
        self._vspans.append(self._valloc.allocate(mesh.num_vertices))
        self._talloc.allocate(mesh.num_triangles)
        return len(self.meshes) - 1

    def add_material(self, mat: MaterialData) -> int:
        self.materials.append(mat)
        return len(self.materials) - 1

    def add_instance(self, mesh_id: int, material_id: int = 0,
                     local_to_world: Optional[np.ndarray] = None) -> int:
        if local_to_world is None:
            local_to_world = np.eye(4, dtype=np.float64)
        self.instances.append((mesh_id, material_id,
                               np.asarray(local_to_world, np.float64)))
        return len(self.instances) - 1

    # -- device build ------------------------------------------------------

    def build_pools(self, pad_multiple: int = 128) -> ScenePools:
        """Concatenate per-instance geometry into flat pools.

        Note: round-1 flattens *per instance* (duplicating shared meshes) so
        tri_object is a plain array; the meshlet path (ops.cull) replaces
        this with shared geometry + per-instance meshlet draws, matching the
        reference's instancing model.
        """
        pos, nrm, uv, idx, tobj, vobj = [], [], [], [], [], []
        vbase = 0
        self._inst_mesh = []
        for oid, (mesh_id, mat_id, _m) in enumerate(self.instances):
            mesh = self.meshes[mesh_id]
            pos.append(mesh.positions)
            nrm.append(mesh.normals)
            uv.append(mesh.uv0)
            idx.append(mesh.indices + vbase)
            tobj.append(np.full(mesh.num_triangles, oid, np.int32))
            vobj.append(np.full(mesh.num_vertices, oid, np.int32))
            vbase += mesh.num_vertices
            self._inst_mesh.append(mesh_id)

        positions = _pad_rows(np.concatenate(pos), pad_multiple)
        normals = _pad_rows(np.concatenate(nrm), pad_multiple)
        uv0 = _pad_rows(np.concatenate(uv), pad_multiple)
        vertex_object_np = _pad_rows(np.concatenate(vobj), pad_multiple)
        indices_np = np.concatenate(idx)
        tri_object_np = np.concatenate(tobj)
        n_tris = len(indices_np)
        indices_np = _pad_rows(indices_np, pad_multiple)
        tri_object_np = _pad_rows(tri_object_np, pad_multiple)
        tri_valid = np.zeros(len(indices_np), bool)
        tri_valid[:n_tris] = True

        mats = self.materials
        mbc = np.array([m.base_color for m in mats], np.float32)
        mmr = np.array([[m.metallic, m.roughness] for m in mats], np.float32)
        mem = np.array([m.emissive for m in mats], np.float32)

        log.info("ScenePools: %d instances, %d verts, %d tris (%d padded), %d materials",
                 len(self.instances), vbase, n_tris, len(indices_np), len(mats))
        return ScenePools(
            positions=jnp.asarray(positions),
            normals=jnp.asarray(normals),
            uv0=jnp.asarray(uv0),
            vertex_object=jnp.asarray(vertex_object_np),
            indices=jnp.asarray(indices_np),
            tri_object=jnp.asarray(tri_object_np),
            tri_valid=jnp.asarray(tri_valid),
            mat_base_color=jnp.asarray(mbc),
            mat_metal_rough=jnp.asarray(mmr),
            mat_emissive=jnp.asarray(mem),
        )

    def frame_instances(self, camera, prev_matrices: Optional[Dict[int, np.ndarray]] = None
                        ) -> FrameInstances:
        """Rebase instance transforms to the camera (translated world) —
        the per-frame host hot loop (reference: scene/scene.cpp:107-137
        perviewPerframeCollect)."""
        from ..utils import math as cmath

        n = len(self.instances)
        m_tw = np.zeros((n, 4, 4), np.float32)
        m_prev = np.zeros((n, 4, 4), np.float32)
        nmat = np.zeros((n, 3, 3), np.float32)
        mat_ids = np.zeros(n, np.int32)
        two_sided = np.zeros(n, np.float32)
        masked = np.zeros(n, np.float32)
        blend = np.zeros(n, np.float32)
        spheres = np.zeros((n, 4), np.float32)
        obbs = np.zeros((n, 12), np.float32)

        for oid, (mesh_id, mat_id, l2w) in enumerate(self.instances):
            m = camera.rebase_matrix(l2w)
            m_tw[oid] = m
            pm = prev_matrices.get(oid) if prev_matrices else None
            m_prev[oid] = pm if pm is not None else m
            nmat[oid] = cmath.normal_matrix(l2w).astype(np.float32)
            mat_ids[oid] = mat_id
            two_sided[oid] = 1.0 if self.materials[mat_id].two_sided else 0.0
            mode = self.materials[mat_id].alpha_mode
            masked[oid] = 1.0 if mode == "mask" else 0.0
            blend[oid] = 1.0 if mode == "blend" else 0.0
            amin, amax = self.meshes[mesh_id].local_aabb()
            center_l = (amin + amax) * 0.5
            # conservative sphere: transform center, scale radius by max axis scale
            radius_l = float(np.linalg.norm(amax - amin) * 0.5)
            c = np.append(center_l, 1.0).astype(np.float64) @ l2w
            c_tw = (c[:3] / c[3]) - camera.position
            scale = float(np.max(np.linalg.norm(l2w[:3, :3], axis=1)))
            spheres[oid] = np.append(c_tw.astype(np.float32), radius_l * scale)
            # OBB: local AABB half-extents through the row-vector transform
            half_l = (amax - amin) * 0.5
            axes = (half_l[:, None] * l2w[:3, :3]).astype(np.float32)  # (3,3)
            obbs[oid, 0:3] = c_tw.astype(np.float32)
            obbs[oid, 3:12] = axes.reshape(9)

        return FrameInstances(
            object_to_tw=jnp.asarray(m_tw),
            object_prev_to_tw=jnp.asarray(m_prev),
            object_normal_mat=jnp.asarray(nmat),
            object_material=jnp.asarray(mat_ids),
            object_two_sided=jnp.asarray(two_sided),
            object_masked=jnp.asarray(masked),
            object_blend=jnp.asarray(blend),
            object_sphere_tw=jnp.asarray(spheres),
            object_obb_tw=jnp.asarray(obbs),
            object_valid=jnp.ones(n, bool),
        )
