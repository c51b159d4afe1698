"""HZB pyramid: min+max mips and the valid-depth min/max reduction
(reference: shader/hzb.hlsl:11-19, hzb_one.hlsl — one-pass SPD downsample
producing min AND max pyramids plus the valid-depth reduce consumed by
cascade_setup.hlsl)."""

import jax.numpy as jnp
import numpy as np

from chord_tpu.ops.hzb import build_hzb, hzb_layout, valid_depth_range


def _np_reduce2(x, op):
    h, w = x.shape
    if h % 2 or w % 2:
        x = np.pad(x, ((0, h % 2), (0, w % 2)))
    h, w = x.shape
    return op(op(x[0::2, 0::2], x[1::2, 0::2]),
              op(x[0::2, 1::2], x[1::2, 1::2]))


def test_max_pyramid_oracle():
    rng = np.random.default_rng(0)
    depth = rng.uniform(0, 1, (37, 61)).astype(np.float32)
    depth[depth < 0.3] = 0.0   # empty pixels
    pyr = build_hzb(jnp.asarray(depth), with_max=True)
    assert pyr.flat_max is not None
    ws, hs, offs = hzb_layout(61, 37)
    cur_min = _np_reduce2(depth, np.minimum)
    cur_max = _np_reduce2(depth, np.maximum)
    for lvl, (lw, lh, off) in enumerate(zip(ws, hs, offs)):
        got_min = np.asarray(pyr.flat[off:off + lw * lh]).reshape(lh, lw)
        got_max = np.asarray(pyr.flat_max[off:off + lw * lh]).reshape(lh, lw)
        np.testing.assert_allclose(got_min, cur_min, err_msg=f"min L{lvl}")
        np.testing.assert_allclose(got_max, cur_max, err_msg=f"max L{lvl}")
        if lw == 1 and lh == 1:
            break
        cur_min = _np_reduce2(cur_min, np.minimum)
        cur_max = _np_reduce2(cur_max, np.maximum)
    # default build carries no max pyramid (no cost when unused)
    assert build_hzb(jnp.asarray(depth)).flat_max is None


def test_valid_depth_range_oracle():
    z_near = jnp.float32(0.001)
    depth = np.zeros((16, 16), np.float32)
    depth[3, 4] = 0.001 / 2.0      # view z = 2
    depth[9, 9] = 0.001 / 37.5     # view z = 37.5
    rng = valid_depth_range(jnp.asarray(depth), z_near)
    np.testing.assert_allclose(np.asarray(rng), [2.0, 37.5], rtol=1e-5)


def test_valid_depth_range_empty_frame():
    rng = valid_depth_range(jnp.zeros((8, 8), jnp.float32),
                            jnp.float32(0.001))
    near, far = np.asarray(rng)
    assert near > far, "empty frame must read as no-valid-range"
