"""Texture pipeline: import, mip chain, device texture pool.

TPU-native equivalent of the reference's texture importer
(reference: source/asset/texture/asset_texture_helper.cpp:24-216 — stb
load, mip chain build, CPU BC1/3/4/5 block compression via jobsystem
parallelFor, srgb/linear + channel remap configs, bindless registration).

TPU divergences (documented, deliberate):
- No BC formats: TPUs sample plain arrays, so storage is bf16 linear —
  the BC encoder's job (GPU memory footprint) is covered by bf16 (2B/ch)
  and zlib in the asset container on disk.
- "Bindless texture id" becomes a LAYER INDEX into a fixed-size stacked
  atlas array (N, S, S, 4) + a flattened mip pyramid, the same
  flat-pool-plus-integer-id scheme the whole engine uses (SURVEY §7
  bindless -> flat arrays).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.log import get_logger

log = get_logger("asset.texture")


def load_image(path, srgb: bool = True) -> np.ndarray:
    """File -> (H,W,4) f32 linear RGBA."""
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    a = np.asarray(img, np.float32) / 255.0
    if srgb:
        rgb = a[..., :3]
        lin = np.where(rgb <= 0.04045, rgb / 12.92,
                       ((rgb + 0.055) / 1.055) ** 2.4)
        a = np.concatenate([lin, a[..., 3:]], -1)
    return a


def build_mips(img: np.ndarray) -> List[np.ndarray]:
    """Full mip chain by 2x2 box filter (reference builds the same chain
    before BC encode, asset_texture_helper.cpp)."""
    mips = [img]
    cur = img
    while min(cur.shape[0], cur.shape[1]) > 1:
        h, w = cur.shape[:2]
        if h % 2 or w % 2:
            cur = np.pad(cur, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
            h, w = cur.shape[:2]
        cur = cur.reshape(h // 2, 2, w // 2, 2, -1).mean((1, 3))
        mips.append(cur)
    return mips


def _resize_pow2(img: np.ndarray, size: int) -> np.ndarray:
    """Nearest-ratio box resample to (size, size) (import normalization)."""
    from PIL import Image

    if img.shape[0] == size and img.shape[1] == size:
        return img
    # resize channels independently (PIL premultiplies RGBA by alpha)
    chans = []
    for c in range(img.shape[-1]):
        u8 = np.clip(img[..., c] * 255.0, 0, 255).astype(np.uint8)
        out = Image.fromarray(u8, mode="L").resize((size, size),
                                                   Image.LANCZOS)
        chans.append(np.asarray(out, np.float32) / 255.0)
    return np.stack(chans, axis=-1)


@dataclass
class TextureDesc:
    name: str
    layer: int            # id handed to materials (the bindless id analog)
    src_size: Tuple[int, int]


class TexturePool:
    """Fixed-size stacked texture array + flattened mip pyramid.

    All textures are normalized to (size, size); `flat()` returns
    (layers, total_texels, 4) bf16 where each layer's mips are
    concatenated with static offsets (same trick as ops/hzb.py) so a
    runtime-chosen mip is plain index arithmetic.
    """

    def __init__(self, size: int = 512):
        assert size & (size - 1) == 0, "pool size must be a power of two"
        self.size = size
        self.textures: List[np.ndarray] = []   # flattened mip stacks
        self.descs: Dict[str, TextureDesc] = {}
        # static mip layout
        self.mip_sizes: List[int] = []
        self.mip_offsets: List[int] = []
        off, s = 0, size
        while s >= 1:
            self.mip_sizes.append(s)
            self.mip_offsets.append(off)
            off += s * s
            s //= 2
        self.total_texels = off

    def add(self, name: str, img: np.ndarray) -> int:
        """-> layer id."""
        if name in self.descs:
            return self.descs[name].layer
        src = img.shape[:2]
        img = _resize_pow2(img, self.size)
        mips = build_mips(img)
        flat = np.concatenate([m.reshape(-1, img.shape[-1]) for m in mips])
        assert flat.shape[0] == self.total_texels
        self.textures.append(flat.astype(np.float32))
        layer = len(self.textures) - 1
        self.descs[name] = TextureDesc(name=name, layer=layer, src_size=src)
        log.info("texture '%s' -> layer %d (%dx%d, %d mips)", name, layer,
                 self.size, self.size, len(mips))
        return layer

    def device_array(self):
        """-> (layers, total_texels, 4) u8 jnp array (empty-safe).

        u8 unorm: the standard 8-bit texture quantization — 1/4 the HBM
        footprint of the round-1 bf16 pool (still 4x BC1; block
        compression has no TPU decode path, the remaining deliberate
        divergence). Values are sRGB-encoded as imported; decode happens
        after sampling (ops/texture.py)."""
        import jax.numpy as jnp

        if not self.textures:
            return jnp.zeros((1, self.total_texels, 4), jnp.uint8)
        stack = np.stack(self.textures)
        return jnp.asarray(np.clip(stack * 255.0 + 0.5, 0, 255).astype(
            np.uint8))
