"""Exhaustive bit-domain codec tests.

Mirrors the reference test tiers (TestCodesSx.cpp:8-159): all nibbles x all
1-bit errors corrected / 2-bit errors detected for Hamming(8,4); 1-bit
correction for Hamming(7,4); 1-bit detection for both parity codes;
interleaver round-trip identity for all PPM 7-12 x RDD 0-4 — plus
whitening/CRC equivalence between the vectorized JAX ops and the scalar
bit reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lora_tpu.ops import codes
from lora_tpu.ops import _bitref as ref


def test_hamming84_exhaustive():
    for nib in range(16):
        enc = ref.encode_hamming84(nib)
        dec, err, bad = ref.decode_hamming84(enc)
        assert dec == nib and not err and not bad
        for bit in range(8):
            dec, err, bad = ref.decode_hamming84(enc ^ (1 << bit))
            assert dec == nib, f"nib {nib} bit {bit}"
            assert err and not bad
        for b0 in range(8):
            for b1 in range(b0 + 1, 8):
                _, err, bad = ref.decode_hamming84(enc ^ (1 << b0) ^ (1 << b1))
                assert err and bad, f"nib {nib} bits {b0},{b1}"


def test_hamming84_luts_match_scalar():
    x = jnp.arange(16, dtype=jnp.int32)
    enc = codes.fec_encode(x, 4)
    expected = [ref.encode_hamming84(n) for n in range(16)]
    np.testing.assert_array_equal(np.asarray(enc), expected)

    all_bytes = jnp.arange(256, dtype=jnp.int32)
    nib, err, bad = codes.fec_decode(all_bytes, 4)
    for c in range(256):
        v, e, b = ref.decode_hamming84(c)
        assert int(nib[c]) == v and int(err[c]) == int(e) and int(bad[c]) == int(b)


def test_hamming74_single_bit_correction():
    for nib in range(16):
        enc = ref.encode_hamming74(nib)
        dec, err = ref.decode_hamming74(enc)
        assert dec == nib and not err
        for bit in range(7):
            dec, err = ref.decode_hamming74(enc ^ (1 << bit))
            assert dec == nib and err


def test_parity_codes_detect_single_bit():
    for nib in range(16):
        enc5 = ref.encode_parity54(nib)
        v, e = ref.check_parity54(enc5)
        assert v == nib and not e
        for bit in range(5):
            _, e = ref.check_parity54(enc5 ^ (1 << bit))
            assert e

        enc6 = ref.encode_parity64(nib)
        v, e = ref.check_parity64(enc6)
        assert v == nib and not e
        for bit in range(6):
            _, e = ref.check_parity64(enc6 ^ (1 << bit))
            assert e


def test_interleaver_roundtrip(rng):
    # all PPM 7-12 x RDD 0-4 x 1-3 blocks.  One jit program holding every
    # combo's (tiny) gather pair compiles once; per-combo programs cost
    # ~90 separate compiles (~2 min of suite wall time on this 1-core box)
    import jax

    combos = [
        (ppm, rdd, nblocks)
        for ppm in range(7, 13)
        for rdd in range(5)
        for nblocks in (1, 2, 3)
    ]
    cws = [
        jnp.asarray(
            rng.integers(0, 256, size=(4, nblocks * ppm)).astype(np.int32)
            & ((1 << (4 + rdd)) - 1)
        )
        for ppm, rdd, nblocks in combos
    ]

    @jax.jit
    def roundtrip(cw_list):
        syms = [
            codes.interleave(cw, ppm, rdd)
            for cw, (ppm, rdd, _) in zip(cw_list, combos)
        ]
        backs = [
            codes.deinterleave(sym, ppm, rdd)
            for sym, (ppm, rdd, _) in zip(syms, combos)
        ]
        return syms, backs

    syms, backs = roundtrip(cws)
    for (ppm, rdd, _), cw, symbols, back in zip(combos, cws, syms, backs):
        cw = np.asarray(cw)
        np.testing.assert_array_equal(np.asarray(back), cw)
        # cross-check against the scalar reference implementation
        sym_ref = ref.diagonal_interleave(list(cw[0]), ppm, rdd)
        np.testing.assert_array_equal(np.asarray(symbols[0]), sym_ref)
        cw_ref = ref.diagonal_deinterleave(sym_ref, ppm, rdd)
        np.testing.assert_array_equal(cw_ref, cw[0])


def test_gray_roundtrip():
    x = jnp.arange(1 << 12, dtype=jnp.int32)
    g = codes.binary_to_gray(x)
    np.testing.assert_array_equal(np.asarray(codes.gray_to_binary(g)), np.asarray(x))
    # adjacent values differ by one bit in gray space
    g_np = np.asarray(g)
    diff = g_np[1:] ^ g_np[:-1]
    assert np.all(np.bitwise_count(diff.astype(np.uint32)) == 1)


@pytest.mark.parametrize("rdd", range(5))
def test_whitening_matches_scalar_and_is_involution(rdd, rng):
    data = rng.integers(0, 1 << (4 + rdd), size=(3, 40)).astype(np.int32)
    for bit_ofs in (0, 1, 5, 17):
        w = codes.whiten(jnp.asarray(data), bit_ofs, rdd)
        w_ref = ref.whiten(list(data[1]), bit_ofs, rdd)
        np.testing.assert_array_equal(np.asarray(w[1]), w_ref)
        # involution
        np.testing.assert_array_equal(
            np.asarray(codes.whiten(w, bit_ofs, rdd)), data
        )
        # traced rdd path agrees with the static path
        w_dyn = codes.whiten(jnp.asarray(data), bit_ofs, jnp.int32(rdd))
        np.testing.assert_array_equal(np.asarray(w_dyn), np.asarray(w))


def test_crc16_matches_scalar(rng):
    for length in (0, 1, 2, 8, 64, 255):
        data = rng.integers(0, 256, size=(5, length)).astype(np.int32)
        crc = codes.sx1272_data_checksum(jnp.asarray(data))
        for b in range(5):
            assert int(crc[b]) == ref.sx1272_data_checksum(list(data[b]))


def test_header_checksum_matches_scalar(rng):
    h0 = rng.integers(0, 256, size=64).astype(np.int32)
    h1 = rng.integers(0, 16, size=64).astype(np.int32)
    out = codes.header_checksum(jnp.asarray(h0), jnp.asarray(h1))
    for i in range(64):
        assert int(out[i]) == ref.header_checksum(int(h0[i]), int(h1[i]))


def test_fec_decode_traced_rdd(rng):
    cw = rng.integers(0, 256, size=32).astype(np.int32)
    for rdd in range(5):
        mask = [0xF, 0x1F, 0x3F, 0x7F, 0xFF][rdd]
        nib_s, err_s, bad_s = codes.fec_decode(jnp.asarray(cw & mask), rdd)
        nib_d, err_d, bad_d = codes.fec_decode(jnp.asarray(cw & mask), jnp.int32(rdd))
        np.testing.assert_array_equal(np.asarray(nib_s), np.asarray(nib_d))
        np.testing.assert_array_equal(np.asarray(err_s), np.asarray(err_d))
        np.testing.assert_array_equal(np.asarray(bad_s), np.asarray(bad_d))
