"""Slot-indexed row-table Pallas kernel vs the XLA gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from chord_tpu.ops.row_gather import gather_rows, pack_table


def _oracle(table_nxc, slot):
    rows = np.asarray(table_nxc)[np.maximum(np.asarray(slot), 0)]
    return np.moveaxis(rows, -1, 0)


def _cm(table_nxc):
    return pack_table([table_nxc[:, c] for c in range(16)])


def test_rows_bit_exact_coherent():
    """Draw-coherent slots (the real visibility-buffer shape)."""
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(1000, 16)).astype(np.float32))
    base = rng.integers(0, 900, (6, 10))
    slot = np.repeat(np.repeat(base, 16, 0), 16, 1).astype(np.int32)
    slot += rng.integers(0, 64, slot.shape).astype(np.int32)
    out = gather_rows(_cm(table), jnp.asarray(slot), interpret=True)
    got = np.asarray(jax.lax.bitcast_convert_type(out, jnp.float32))
    np.testing.assert_array_equal(got, _oracle(table, slot))


def test_rows_bit_exact_adversarial():
    """Every lane a different bank (the old palette-sweep overflow
    case): the bitmap enumeration is exact regardless."""
    rng = np.random.default_rng(2)
    n = 6144
    table = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    slot = (np.arange(16 * 128).reshape(16, 128) * 37 % n).astype(np.int32)
    out = gather_rows(_cm(table), jnp.asarray(slot), interpret=True)
    got = np.asarray(jax.lax.bitcast_convert_type(out, jnp.float32))
    np.testing.assert_array_equal(got, _oracle(table, slot))


def test_rows_invalid_slots_clamp_to_zero():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    slot = rng.integers(-1, 256, (16, 140)).astype(np.int32)
    out = gather_rows(_cm(table), jnp.asarray(slot), interpret=True)
    got = np.asarray(jax.lax.bitcast_convert_type(out, jnp.float32))
    np.testing.assert_array_equal(got, _oracle(table, slot))


def test_rows_int_table_roundtrip():
    """int32 channels (texture ids etc.) ride bit-exact."""
    rng = np.random.default_rng(3)
    table = np.asarray(rng.integers(-5, 1 << 20, (512, 16)), np.int32)
    cm = pack_table([jnp.asarray(table[:, c]) for c in range(16)])
    slot = rng.integers(0, 512, (24, 200)).astype(np.int32)
    out = gather_rows(cm, jnp.asarray(slot), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _oracle(table, slot))


def test_rows_large_table_many_words():
    """Tables above 4096 rows need >1 presence word (the frame's
    combined draw table is ~8.7k rows)."""
    rng = np.random.default_rng(4)
    n = 8704
    table = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    slot = rng.integers(0, n, (16, 130)).astype(np.int32)
    out = gather_rows(_cm(table), jnp.asarray(slot), interpret=True)
    got = np.asarray(jax.lax.bitcast_convert_type(out, jnp.float32))
    np.testing.assert_array_equal(got, _oracle(table, slot))
