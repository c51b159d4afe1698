"""Kernel library: the TPU-native render passes.

raster      tiled software visibility-buffer rasterizer (Pallas)
mesh_shader fused draw expansion + triangle setup (Pallas)
cull        frustum/cone/Nanite-LOD/HZB culling + compaction
hzb         hierarchical-Z pyramid + occlusion tests
shading     gbuffer resolve + GGX deferred lighting
shadow      cascaded shadow maps + PCSS
atmosphere  transmittance/multi-scatter/sky-view LUTs
gi          world radiance cache (SH cascades) + SSAO
ssr         screen-space reflections
post        auto-exposure, bloom, TSR
colorspace  ACEScg pipeline, ACES tonemap, sRGB/HDR10 outputs
texture     stacked flat-mip pool sampling
brdf_lut    split-sum environment BRDF
"""
