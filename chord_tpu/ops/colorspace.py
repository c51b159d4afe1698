"""Wide-gamut ACEScg color pipeline.

TPU-native equivalent of the reference's colorspace stack (reference:
install/resource/shader/colorspace.h:9-112 — sRGB/AP0/AP1/Rec2020 primary
matrices + D60<->D65 Bradford CATs; install/resource/shader/tonemapping.hlsl
:34-136 — film curve applied in AP1 with pre/post desaturation;
install/resource/shader/aces.hlsli — ACES RRT/ODT fit).

All lighting in the engine happens in **ACEScg (AP1, D60)** linear space, as
in the reference (SURVEY.md §8.9). Matrices below are the standard published
ACES/ITU primaries derived via CIE XYZ with Bradford chromatic adaptation;
they match the reference's colorspace.h constants (same sources).

Convention: colors are (..., 3) arrays; matrices are applied as
`c @ M` with M stored so rows are source-primary coordinates (row-vector,
matching the engine-wide convention in chord_tpu.utils.math).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# --- Primary matrices (row-vector: c_out = c_in @ M) -----------------------
# sRGB (D65) <-> ACEScg/AP1 (D60), Bradford-adapted. Standard values as used
# by ACES (reference colorspace.h:42-70 sRGB_2_AP1 / AP1_2_sRGB).

SRGB_TO_AP1 = np.array([
    [0.61309732, 0.07019422, 0.02061560],
    [0.33952285, 0.91635557, 0.10956983],
    [0.04737928, 0.01345021, 0.86981512],
], dtype=np.float32)

AP1_TO_SRGB = np.array([
    [1.70505099, -0.13025642, -0.02400336],
    [-0.62179212, 1.14080474, -0.12896898],
    [-0.08325883, -0.01054832, 1.15297234],
], dtype=np.float32)

# AP0 (ACES2065-1) <-> AP1 (ACEScg), both D60 (colorspace.h AP0_2_AP1).
AP0_TO_AP1 = np.array([
    [1.4514393161, -0.0765537734, 0.0083161484],
    [-0.2365107469, 1.1762296998, -0.0060324498],
    [-0.2149285693, -0.0996759264, 0.9977163014],
], dtype=np.float32)

AP1_TO_AP0 = np.array([
    [0.6954522414, 0.0447945634, -0.0055258826],
    [0.1406786965, 0.8596711185, 0.0040252103],
    [0.1638690622, 0.0955343182, 1.0015006723],
], dtype=np.float32)

# AP1 luminance weights (ACES Y coefficients, colorspace.h AP1 luminance).
AP1_LUMA = np.array([0.2722287168, 0.6740817658, 0.0536895174], np.float32)

# Rec.2020 (D65) <-> AP1 for the HDR10 output path (colorspace.h:90-112).
AP1_TO_REC2020 = np.array([
    [1.02582475, -0.00223437, -0.00501335],
    [-0.02005319, 1.00458650, -0.02529023],
    [-0.00577156, -0.00235213, 1.03030358],
], dtype=np.float32)


def srgb_to_acescg(c: jnp.ndarray) -> jnp.ndarray:
    """Linear sRGB -> linear ACEScg (AP1)."""
    return c @ jnp.asarray(SRGB_TO_AP1)


def acescg_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Linear ACEScg (AP1) -> linear sRGB."""
    return c @ jnp.asarray(AP1_TO_SRGB)


def luminance_ap1(c: jnp.ndarray) -> jnp.ndarray:
    """AP1 relative luminance -> (...,) (reference tonemapping.hlsl + the
    exposure histogram both key off AP1 luminance)."""
    return c @ jnp.asarray(AP1_LUMA)


def srgb_eotf_inv(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB-encoded (the OETF applied before 8-bit quantize)."""
    c = jnp.clip(c, 0.0, 1.0)
    lo = c * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-7), 1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def srgb_eotf(c: jnp.ndarray) -> jnp.ndarray:
    """sRGB-encoded -> linear."""
    lo = c / 12.92
    hi = jnp.power((c + 0.055) / 1.055, 2.4)
    return jnp.where(c <= 0.04045, lo, hi)


def pq_oetf(c_nits: jnp.ndarray) -> jnp.ndarray:
    """ST.2084 PQ encode; input in absolute nits (reference HDR10 swapchain
    path, swapchain.h:14 / tonemapping.hlsl ST2084 output)."""
    m1, m2 = 0.1593017578125, 78.84375
    c1, c2, c3 = 0.8359375, 18.8515625, 18.6875
    y = jnp.clip(c_nits / 10000.0, 0.0, 1.0)
    yp = jnp.power(y, m1)
    return jnp.power((c1 + c2 * yp) / (1.0 + c3 * yp), m2)


# --- ACES filmic tonemap (fitted RRT+ODT) ----------------------------------
# Stephen Hill's fit of the ACES output transform, operating on AP1 inputs —
# the same curve family the reference's aces.hlsli uses for its film curve
# (tonemapping.hlsl:80-136 "film curve in AP1 with pre/post desaturate").

_RRT_SAT = 0.96


def aces_film_ap1(c: jnp.ndarray) -> jnp.ndarray:
    """AP1 linear HDR -> AP1 [0,1] display-linear via the fitted RRT+ODT
    rational curve, with the RRT global desaturation."""
    luma = luminance_ap1(c)[..., None]
    c = luma + _RRT_SAT * (c - luma)              # pre-desaturate (RRT_SAT)
    a = c * (c + 0.0245786) - 0.000090537
    b = c * (0.983729 * c + 0.4329510) + 0.238081
    out = a / b
    return jnp.clip(out, 0.0, 1.0)


def tonemap_display(hdr_ap1: jnp.ndarray, exposure: jnp.ndarray,
                    output: str = "srgb8") -> jnp.ndarray:
    """Full output transform: exposure -> film curve (AP1) -> display.

    output == "srgb8":  returns sRGB-encoded floats in [0,1] (quantize with
    `to_u8`); == "hdr10": returns PQ-encoded Rec.2020 signal (1000-nit peak
    mapping), matching the reference's two swapchain formats.
    """
    c = hdr_ap1 * exposure
    filmic = aces_film_ap1(c)
    if output == "srgb8":
        srgb = jnp.clip(acescg_to_srgb(filmic), 0.0, 1.0)
        return srgb_eotf_inv(srgb)
    elif output == "hdr10":
        rec2020 = jnp.clip(filmic @ jnp.asarray(AP1_TO_REC2020), 0.0, 1.0)
        return pq_oetf(rec2020 * 1000.0)
    raise ValueError(f"unknown output transform {output!r}")


def to_u8(encoded: jnp.ndarray) -> jnp.ndarray:
    """Encoded [0,1] floats -> uint8 with rounding."""
    return jnp.clip(encoded * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
