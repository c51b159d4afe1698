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
