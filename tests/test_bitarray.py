"""Unit tests for 2-bit/4-bit packing (reference semantics TwoBitArray.h:30-49)."""
import numpy as np
import jax.numpy as jnp

from volumerenderer_tpu.utils import bitarray as ba


def reference_twobit_set(codes):
    """Literal transliteration of the reference setter (TwoBitArray.h:35-39)."""
    bits = np.zeros((len(codes) + 3) // 4, dtype=np.uint8)
    for i, value in enumerate(codes):
        b = int(bits[i // 4])
        pos = i & 3
        mask = (~(3 << (pos * 2))) & 0xFF
        bits[i // 4] = (b & mask) | ((value << (pos * 2)) & 0xFF)
    return bits


def reference_twobit_get(bits, n):
    out = []
    for i in range(n):
        b = int(bits[i // 4])
        pos = i & 3
        out.append((b >> (pos * 2)) & 3)
    return np.array(out, dtype=np.uint8)


def test_pack2_matches_reference_layout():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 4, 5, 17, 64, 1001]:
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        ref = reference_twobit_set(codes)
        ours = ba.pack2_np(codes)
        np.testing.assert_array_equal(ref, ours)
        np.testing.assert_array_equal(reference_twobit_get(ours, n), codes)
        np.testing.assert_array_equal(ba.unpack2_np(ours, n), codes)


def test_pack2_roundtrip_device():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=256).astype(np.uint8)
    packed = np.asarray(ba.pack2(jnp.asarray(codes)))
    np.testing.assert_array_equal(packed, ba.pack2_np(codes))
    np.testing.assert_array_equal(np.asarray(ba.unpack2(jnp.asarray(packed))), codes)


def test_pack4_roundtrip():
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 16, size=130).astype(np.uint8)
    np.testing.assert_array_equal(ba.unpack4_np(ba.pack4_np(vals), 130), vals)
    v = vals[:128]
    np.testing.assert_array_equal(np.asarray(ba.unpack4(ba.pack4(jnp.asarray(v)))), v)


def test_packed_nbytes():
    assert ba.packed2_nbytes(0) == 0
    assert ba.packed2_nbytes(1) == 1
    assert ba.packed2_nbytes(4) == 1
    assert ba.packed2_nbytes(5) == 2
