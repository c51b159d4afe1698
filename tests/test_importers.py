"""Importers: glTF/GLB + PMX roundtrips (reference: asset/gltf/, asset/pmx/)."""

import struct

import numpy as np
import pytest

from chord_tpu.asset.gltf import load_gltf
from chord_tpu.asset.pmx import load_pmx


def test_glb_reference_sphere():
    """The reference repo ships one GLB — load it through our importer."""
    path = "/root/reference/install/resource/mesh/low_sphere.glb"
    try:
        scene = load_gltf(path)
    except FileNotFoundError:
        pytest.skip("reference GLB not mounted")
    assert scene.total_triangles > 10
    mesh = scene.meshes[0]
    # sphere-ish: vertices near constant radius from centroid
    c = mesh.positions.mean(0)
    r = np.linalg.norm(mesh.positions - c, axis=1)
    assert r.std() / r.mean() < 0.1


def _write_minimal_pmx(path):
    """Synthesize a tiny PMX 2.0: 3 verts, 1 triangle, 1 material."""
    out = bytearray()
    out += b"PMX "
    out += struct.pack("<f", 2.0)
    out += struct.pack("<B", 8)
    # globals: enc=1(utf8), addUV=0, vtx=1, tex=1, mat=1, bone=1, morph=1, rb=1
    out += bytes([1, 0, 1, 1, 1, 1, 1, 1])
    for s in (b"tri", b"tri", b"", b""):     # names/comments
        out += struct.pack("<i", len(s)) + s
    out += struct.pack("<i", 3)              # vertex count
    for p, n, uv in [((0, 0, 0), (0, 0, -1), (0, 0)),
                     ((1, 0, 0), (0, 0, -1), (1, 0)),
                     ((0, 1, 0), (0, 0, -1), (0, 1))]:
        out += struct.pack("<3f", *p) + struct.pack("<3f", *n)
        out += struct.pack("<2f", *uv)
        out += struct.pack("<B", 0)          # BDEF1
        out += struct.pack("<b", 0)          # bone index
        out += struct.pack("<f", 1.0)        # edge scale
    out += struct.pack("<i", 3)              # index count
    out += struct.pack("<BBB", 0, 1, 2)      # u8 vertex indices
    out += struct.pack("<i", 0)              # no textures
    out += struct.pack("<i", 1)              # one material
    for s in (b"mat", b""):
        out += struct.pack("<i", len(s)) + s
    out += struct.pack("<4f", 0.8, 0.2, 0.2, 1.0)    # diffuse
    out += struct.pack("<3f", 1, 1, 1) + struct.pack("<f", 32.0)
    out += struct.pack("<3f", 0.1, 0.1, 0.1)
    out += struct.pack("<B", 0)
    out += struct.pack("<4f", 0, 0, 0, 1) + struct.pack("<f", 1.0)
    out += struct.pack("<b", -1)             # texture
    out += struct.pack("<b", -1)             # sphere
    out += struct.pack("<B", 0)              # sphere mode
    out += struct.pack("<B", 0)              # shared toon = 0
    out += struct.pack("<b", -1)             # toon texture
    out += struct.pack("<i", 0)              # memo
    out += struct.pack("<i", 3)              # face index count
    path.write_bytes(bytes(out))


def test_pmx_minimal(tmp_path):
    p = tmp_path / "tri.pmx"
    _write_minimal_pmx(p)
    model = load_pmx(p)
    assert model.name == "tri"
    assert len(model.meshes) == 1
    mesh = model.meshes[0]
    assert mesh.num_triangles == 1 and mesh.num_vertices == 3
    # z negated (left->right handed)
    np.testing.assert_allclose(mesh.positions[:, 2], 0.0)
    assert model.materials[0].base_color[0] == pytest.approx(0.8)
    # winding flipped to CCW
    assert mesh.indices.tolist() == [[2, 1, 0]]


def test_gltf_texture_import(tmp_path):
    """Materials pull baseColor (sRGB) + normal (linear) textures into the
    TexturePool and carry the layer ids + normalTexture.scale."""
    import base64
    import io
    import json

    from PIL import Image

    from chord_tpu.asset.texture import TexturePool

    def png_uri(rgb):
        img = Image.new("RGBA", (8, 8), rgb)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return ("data:image/png;base64," +
                base64.b64encode(buf.getvalue()).decode())

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    bin_data = pos.tobytes() + idx.tobytes() + b"\x00\x00"
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}], "scene": 0,
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "baseColorFactor": [1, 1, 1, 1]},
            "normalTexture": {"index": 1, "scale": 0.5},
            "emissiveTexture": {"index": 2}}],
        "textures": [{"source": 0}, {"source": 1}, {"source": 2}],
        "images": [{"uri": png_uri((188, 0, 0, 255))},      # sRGB red
                   {"uri": png_uri((128, 128, 255, 255))},   # flat normal
                   {"uri": png_uri((0, 255, 0, 255))}],      # emissive
        "buffers": [{
            "byteLength": len(bin_data),
            "uri": "data:application/octet-stream;base64," +
                   base64.b64encode(bin_data).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"}],
    }
    p = tmp_path / "tex.gltf"
    p.write_text(json.dumps(doc))

    tp = TexturePool(16)
    scene = load_gltf(p, texture_pool=tp)
    m = scene.materials[0]
    assert m.base_color_texture == 0
    assert m.normal_texture == 1
    assert m.normal_scale == pytest.approx(0.5)
    assert m.emissive_texture == 2
    assert m.metal_rough_texture == -1
    assert len(tp.textures) == 3
    # sRGB decode applied to baseColor: 188/255 -> ~0.5 linear
    assert abs(tp.textures[0][0, 0] - 0.5) < 0.02
    # normal map stays linear: 128/255 ~ 0.502 raw
    assert abs(tp.textures[1][0, 0] - 128 / 255) < 0.01

    # no pool -> ids stay -1, no crash
    scene2 = load_gltf(p)
    assert scene2.materials[0].base_color_texture == -1


def test_nanite_stress_scene_builds():
    """BASELINE config #3 scene: source-tri scale and instancing sanity."""
    from chord_tpu.asset.procedural import build_nanite_stress

    b = build_nanite_stress(spheres=9, rings=16)
    per_instance = sum(b.meshes[m].num_triangles for m, _, _ in b.instances)
    assert per_instance > 9 * 2 * 16 * 16 * 0.8   # ~2*rings^2 per sphere
    assert len(b.instances) == 10                 # 9 spheres + floor


# ---------------------------------------------------------------------------
# Real-asset end-to-end (VERDICT r2 item 7): a disk GLB with multiple
# meshes, an interleaved vertex buffer, u16+u32 indices, embedded PNG
# textures (sRGB/linear), masked foliage, node hierarchy -> AssetManager-
# style import -> nanite build -> full frame -> independent oracle SSIM.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def demo_glb(tmp_path_factory):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.make_demo_gltf import build_demo

    p = tmp_path_factory.mktemp("demo") / "street.glb"
    build_demo(p)
    return p


def _demo_scene(demo_glb, with_textures=True, skip_masked=False):
    from chord_tpu.asset.gltf import into_builder, load_gltf
    from chord_tpu.asset.texture import TexturePool
    from chord_tpu.rhi import SceneBuilder
    from chord_tpu.utils.camera import Camera

    tp = TexturePool(256) if with_textures else None
    scene = load_gltf(demo_glb, texture_pool=tp)
    if skip_masked:
        # drop foliage cards: two-sided masked semantics are gated by
        # their own oracle tests (test_masked.py); the geometry SSIM
        # gate compares the opaque content
        keep = [i for i, (mid, _) in enumerate(scene.instances)
                if scene.materials[scene.mesh_material[mid]].alpha_mode
                != "mask"]
        scene.instances = [scene.instances[i] for i in keep]
    b = SceneBuilder()
    if tp is not None:
        b.texture_pool = tp
    into_builder(scene, b)
    cam = Camera(width=192, height=108)
    cam.position = np.array([-16.0, 7.0, 13.0])
    cam.look_at(np.array([0.0, 2.5, 0.0]))
    return scene, b, cam


def test_demo_glb_import_structure(demo_glb):
    scene, b, cam = _demo_scene(demo_glb)
    assert len(scene.meshes) == 6
    assert scene.total_triangles > 1000
    assert len(scene.instances) == 15          # hierarchy flattened
    modes = {m.name: m.alpha_mode for m in scene.materials}
    assert modes["leaf"] == "mask"
    # textures imported: 4 sRGB baseColor + 1 linear metal-rough
    layers = {m.base_color_texture for m in scene.materials}
    assert len(layers - {-1}) == 4
    assert any(m.metal_rough_texture >= 0 for m in scene.materials)
    # interleaved building accessors decoded: unit-ish normals
    bld = scene.meshes[0]
    n = np.linalg.norm(bld.normals, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


@pytest.mark.slow   # 51s: interpret-mode frame over the disk GLB
def test_demo_glb_full_frame(demo_glb):
    """Textured + masked + nanite full frame over the disk asset."""
    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools

    scene, b, cam = _demo_scene(demo_glb)
    pools = build_meshlet_pools(b, nanite=True)
    assert pools.num_meshlets >= 15
    inst = b.frame_instances(cam)
    r = MeshletRenderer(
        RendererConfig(width=192, height=108, pair_capacity=8192,
                       big_capacity=256, interpret=True,
                       enable_bloom=False, enable_tsr=False),
        MeshletFrameConfig(draw_capacity=2048, occlusion=False,
                           textured=True, alpha_masked=True))
    img, stats = r.render(pools, inst, cam.view_uniform(0))
    img = np.asarray(img).astype(np.float32)
    assert int(np.asarray(stats["bin_overflow"])) == 0
    assert img.std() > 8.0
    # content sanity: brick walls red-dominant somewhere, foliage
    # green-dominant somewhere (textures actually sampled)
    redish = (img[..., 0] > img[..., 1] + 12) & (img[..., 0] > 40)
    greenish = (img[..., 1] > img[..., 0] + 8) & (img[..., 1] > 40)
    assert redish.mean() > 0.004, "no brick-textured pixels"
    assert greenish.mean() > 0.002, "no leaf-masked pixels"


@pytest.mark.slow
def test_demo_glb_matches_oracle(demo_glb):
    """Untextured geometry+shading SSIM vs the independent NumPy oracle
    on the imported disk asset (BASELINE SSIM gate on real content)."""
    from oracle_frame import render_oracle
    from test_golden import ssim

    from chord_tpu.renderer.deferred import RendererConfig
    from chord_tpu.renderer.meshlet_frame import (MeshletFrameConfig,
                                                  MeshletRenderer)
    from chord_tpu.rhi.meshlet_scene import build_meshlet_pools
    from chord_tpu.utils.cvar import cvars

    scene, b, cam = _demo_scene(demo_glb, with_textures=False,
                                skip_masked=True)
    w, h = 256, 144
    cam.width, cam.height = w, h
    oracle = render_oracle(b, cam, w, h, exposure=1.0)
    pools = build_meshlet_pools(b, nanite=False)
    inst = b.frame_instances(cam)
    cvars.set("r.exposure.fix", 1.0)
    try:
        r = MeshletRenderer(
            RendererConfig(width=w, height=h, pair_capacity=8192,
                           big_capacity=256, interpret=True,
                           enable_bloom=False, enable_tsr=False),
            MeshletFrameConfig(draw_capacity=2048, occlusion=False))
        img, stats = r.render(pools, inst, cam.view_uniform(0))
    finally:
        cvars.set("r.exposure.fix", -1.0)
    assert int(np.asarray(stats["bin_overflow"])) == 0
    s = ssim(np.asarray(img), oracle)
    assert s >= 0.98, f"disk-glTF SSIM vs oracle: {s:.4f}"
