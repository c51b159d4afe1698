"""Low-discrepancy per-pixel noise for stochastic passes.

TPU-native replacement for the reference's spatio-temporal blue-noise
texture set (reference: graphics/bluenoise.cpp loads STBN 128x128x64
textures published via GPUBasicData.STBN ids; pcss.hlsl and the GI
passes sample them per pixel per frame). On this device a texture-based
STBN would mean one random gather per pixel — the scarcest resource —
so the noise is COMPUTED in-register instead: interleaved gradient
noise (Jimenez, "Next Generation Post Processing in Call of Duty") with
a golden-ratio-style temporal shift. IGN's spectrum is blue-ish over
3x3 neighborhoods, which is exactly the property the temporal
accumulators (TSR, temporal shadow mask, GI) need to converge fast.
"""

from __future__ import annotations

import jax.numpy as jnp


def interleaved_gradient_noise(h: int, w: int, frame=0) -> jnp.ndarray:
    """-> (h, w) f32 in [0, 1). `frame` may be a traced i32 scalar; the
    per-frame shift walks each pixel through 64 distinct phases."""
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    fj = (jnp.asarray(frame, jnp.int32) % 64).astype(jnp.float32)
    # temporal extension: shift the gradient by 5.588238 px per frame
    xo = x + 5.588238 * fj
    v = 52.9829189 * ((0.06711056 * xo + 0.00583715 * y) % 1.0)
    return v % 1.0
