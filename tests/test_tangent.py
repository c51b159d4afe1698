"""Importer stream parity + tangent-frame validation (VERDICT r4 #9).

The reference's glTF importer carries mikktspace TANGENT plus optional
TEXCOORD_1 / COLOR_0 vertex streams (reference:
asset/gltf/asset_gltf.h:260-287); ours previously read
POSITION/NORMAL/uv0 only, silently dropping the rest on import.

The deferred shading path does NOT consume stored tangents — it builds a
Schüler cotangent frame per pixel from screen-space derivatives
(ops/shading.py:292-332). That substitute was never validated against
stored tangents; the second test here bounds its error against analytic
ground-truth tangents on a curved parametrized sheet.
"""

import base64
import json

import numpy as np


def _b64(arr: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode()


def test_gltf_reads_tangent_uv1_color0(tmp_path):
    """A constructed glTF with TANGENT/TEXCOORD_1/COLOR_0 round-trips all
    three streams (u8 colors normalized, VEC3 color alpha-padded)."""
    from chord_tpu.asset.gltf import load_gltf

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile([0, 0, 1], (3, 1)).astype(np.float32)
    uv0 = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    uv1 = np.array([[0, 1], [1, 1], [0, 0]], np.float32)
    tan = np.array([[1, 0, 0, 1]] * 3, np.float32)
    col = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([0, 1, 2], np.uint16)

    buffers = [pos, nrm, uv0, uv1, tan, col, idx]
    blob = b"".join(np.ascontiguousarray(b).tobytes() for b in buffers)
    views, accs, off = [], [], 0
    comp = {np.float32: 5126, np.uint8: 5121, np.uint16: 5123}
    types = {1: "SCALAR", 2: "VEC2", 3: "VEC3", 4: "VEC4"}
    for b in buffers:
        n = b.tobytes()
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(n)})
        c = b.shape[-1] if b.ndim > 1 else 1
        accs.append({"bufferView": len(views) - 1, "componentType":
                     comp[b.dtype.type], "count": len(b),
                     "type": types[c],
                     **({"normalized": True} if b.dtype == np.uint8
                        else {})})
        off += len(n)
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64," +
                            base64.b64encode(blob).decode()}],
        "bufferViews": views,
        "accessors": accs,
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2,
                           "TEXCOORD_1": 3, "TANGENT": 4, "COLOR_0": 5},
            "indices": 6}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    p = tmp_path / "t.gltf"
    p.write_text(json.dumps(doc))
    scene = load_gltf(p)
    m = scene.meshes[0]
    np.testing.assert_allclose(m.tangents, tan)
    np.testing.assert_allclose(m.uv1, uv1)
    assert m.color0.shape == (3, 4)
    np.testing.assert_allclose(m.color0[:, :3],
                               col.astype(np.float32) / 255.0, atol=1e-6)
    np.testing.assert_allclose(m.color0[:, 3], 1.0)


def _cotangent_frame(pos, uv, nrm):
    """The exact screen-space cotangent-frame construction from
    ops/shading.py:305-325 (shifted differences, perp cross products),
    in numpy."""
    def ddx(a):
        return a - np.roll(a, 1, axis=1)

    def ddy(a):
        return a - np.roll(a, 1, axis=0)

    dp1 = ddx(pos)
    dp2 = ddy(pos)
    du1 = ddx(uv)
    du2 = ddy(uv)
    dp2perp = np.cross(nrm, dp2)
    dp1perp = np.cross(dp1, nrm)
    t = dp2perp * du1[..., 0:1] + dp1perp * du2[..., 0:1]
    b = dp2perp * du1[..., 1:2] + dp1perp * du2[..., 1:2]
    # the engine normalizes by the shared max magnitude (preserves the
    # t:b aspect for anisotropy); for DIRECTION comparison normalize
    # each to unit length
    t = t / np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return t, b


def test_cotangent_frame_matches_stored_tangents():
    """On a curved parametrized sheet viewed as a (H,W) g-buffer, the
    per-pixel cotangent frame must align with the ANALYTIC stored
    tangent (d pos / d u) to a few degrees away from the derivative
    seams — the evidence that the TPU build's tangent-free normal
    mapping substitutes for the reference's mikktspace vertex
    tangents."""
    h, w = 64, 96
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    u = xs / w
    v = ys / h
    # curved sheet: position = (u*4, sin-hill height, v*3)
    pos = np.stack([u * 4.0,
                    0.6 * np.sin(u * 3.0) * np.cos(v * 2.0),
                    v * 3.0], -1)
    uv = np.stack([u, v], -1)
    # analytic tangent d pos/d u (normalized), normal via cross
    dpu = np.stack([np.full_like(u, 4.0),
                    0.6 * 3.0 * np.cos(u * 3.0) * np.cos(v * 2.0),
                    np.zeros_like(u)], -1)
    dpv = np.stack([np.zeros_like(u),
                    -0.6 * 2.0 * np.sin(u * 3.0) * np.sin(v * 2.0),
                    np.full_like(u, 3.0)], -1)
    nrm = np.cross(dpv, dpu)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    t_ref = dpu / np.linalg.norm(dpu, axis=-1, keepdims=True)

    t_cot, b_cot = _cotangent_frame(pos, uv, nrm)
    interior = np.zeros((h, w), bool)
    interior[2:-2, 2:-2] = True
    cosang = np.clip((t_cot * t_ref).sum(-1), -1.0, 1.0)[interior]
    mean_deg = np.degrees(np.arccos(cosang)).mean()
    p95_deg = np.percentile(np.degrees(np.arccos(cosang)), 95)
    assert mean_deg < 3.0, mean_deg
    assert p95_deg < 8.0, p95_deg
    # bitangent must be orthogonal-ish to tangent and follow +v
    dot_tb = np.abs((t_cot * b_cot).sum(-1))[interior].mean()
    assert dot_tb < 0.15, dot_tb
    cos_b = (b_cot * (dpv / np.linalg.norm(dpv, axis=-1, keepdims=True))
             ).sum(-1)[interior]
    assert np.degrees(np.arccos(np.clip(cos_b, -1, 1))).mean() < 12.0
