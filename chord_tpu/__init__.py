"""chord_tpu — a TPU-native real-time rendering engine.

A ground-up rebuild of the capabilities of qiutang98/chord (a modern Vulkan
renderer: GPU-driven bindless scene, Nanite-style cluster-LOD virtualized
geometry, visibility-buffer deferred shading, screen-probe GI, cascaded
shadows + PCSS, precomputed atmosphere, TSR/bloom/auto-exposure, ACEScg
wide-gamut pipeline, large-world coordinates) re-designed TPU-first:

- The Vulkan frame (reference: source/renderer/renderer.cpp:142) becomes a
  single jitted XLA computation `render_frame(scene, view, history)` over
  HBM-resident arrays. No command lists, no barriers, no descriptors.
- Bindless descriptor indexing (reference: source/graphics/bindless.h) becomes
  flat stacked HBM pools + int32 offset tables (`chord_tpu.rhi`).
- The hardware mesh-shader rasterizer (reference:
  install/resource/shader/mesh_raster.hlsl) becomes a binned, tiled software
  visibility-buffer rasterizer (`chord_tpu.ops.raster`), with Pallas kernels
  on the hot path.
- GPU-driven culling + Nanite DAG-cut LOD selection (reference:
  install/resource/shader/instance_culling.hlsl, nanite_shared.hlsli) become
  vectorized masked kernels with prefix-sum compaction (`chord_tpu.ops.cull`).

Package layout:
    utils/     — cvars, logging, timers, math, camera, slot allocators
    rhi/       — "array RHI": scene pools, framebuffers, history
    asset/     — glTF import, meshlet/Nanite builders (C++ native + py), textures
    scene/     — scene graph, components, per-frame collection
    ops/       — the kernels: raster, cull, hzb, shading, post, gi, atmosphere
    renderer/  — the deferred renderer frame function
    parallel/  — multi-chip sharding of the frame over a jax Mesh
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry math (vertex transforms, color matrices, barycentrics) needs true
# f32: TPU matmuls default to bf16 MXU passes, which is visibly wrong for
# edge equations and depth planes. Hot kernels opt into lower precision
# explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")
