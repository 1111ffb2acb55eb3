"""Encoder -> decoder byte-exact sweep (mirrors test_encoder_to_decoder,
TestLoopback.cpp:14-64: SF 7-12 x CR 4/4-4/8, random packets) plus golden
bit-exact symbol checks against the reference oracle
(tests/golden/golden.json, produced by tools/gen_golden.cpp)."""

import json
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.models.encoder import encode
from lora_tpu.models.decoder import decode, OK

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "golden.json").read_text()
)


def roundtrip(payload, cfg):
    symbols = encode(jnp.asarray(payload), cfg)
    return decode(symbols.astype(jnp.int32), cfg)


@pytest.mark.parametrize("sf", range(7, 13))
@pytest.mark.parametrize("cr", ["4/4", "4/5", "4/6", "4/7", "4/8"])
def test_encoder_to_decoder_sweep(sf, cr, rng):
    # every (sf, cr) combo at one payload length; the length axis is
    # covered separately below (each (cfg, length) is its own compile —
    # the former 30 x 4 grid spent minutes compiling duplicates)
    cfg = LoRaConfig(sf=sf, cr=cr)
    length = 37
    payload = rng.integers(0, 256, size=(3, length)).astype(np.uint8)
    res = roundtrip(payload, cfg)
    assert np.all(np.asarray(res.status) == OK), f"len {length}"
    np.testing.assert_array_equal(np.asarray(res.offset), 3)
    np.testing.assert_array_equal(np.asarray(res.length), length)
    out = np.asarray(res.data)[:, 3 : 3 + length]
    np.testing.assert_array_equal(out, payload)


@pytest.mark.parametrize("sf,cr", [(7, "4/8"), (12, "4/5")])
def test_encoder_to_decoder_length_sweep(sf, cr, rng):
    cfg = LoRaConfig(sf=sf, cr=cr)
    for length in (1, 8, 37, 128):
        payload = rng.integers(0, 256, size=(3, length)).astype(np.uint8)
        res = roundtrip(payload, cfg)
        assert np.all(np.asarray(res.status) == OK), f"len {length}"
        np.testing.assert_array_equal(np.asarray(res.offset), 3)
        np.testing.assert_array_equal(np.asarray(res.length), length)
        out = np.asarray(res.data)[:, 3 : 3 + length]
        np.testing.assert_array_equal(out, payload)


def test_reduced_symbol_set_roundtrip(rng):
    # relay/client examples run PPM = SF-2 (SURVEY.md §2.3)
    cfg = LoRaConfig(sf=11, ppm=9, cr="4/7")
    payload = rng.integers(0, 256, size=(2, 33)).astype(np.uint8)
    res = roundtrip(payload, cfg)
    assert np.all(np.asarray(res.status) == OK)
    np.testing.assert_array_equal(
        np.asarray(res.data)[:, 3:36], payload
    )


def test_implicit_mode_roundtrip(rng):
    length = 16
    cfg = LoRaConfig(
        sf=9, cr="4/6", explicit_header=False, crc=True,
        crc_check=True, data_length=length,
    )
    payload = rng.integers(0, 256, size=(2, length)).astype(np.uint8)
    res = roundtrip(payload, cfg)
    assert np.all(np.asarray(res.status) == OK)
    np.testing.assert_array_equal(np.asarray(res.offset), 0)
    # implicit+crcc output includes the two zeroed CRC bytes
    np.testing.assert_array_equal(np.asarray(res.length), length + 2)
    np.testing.assert_array_equal(np.asarray(res.data)[:, :length], payload)
    np.testing.assert_array_equal(np.asarray(res.data)[:, length : length + 2], 0)


def test_decoder_detects_corruption(rng):
    cfg = LoRaConfig(sf=10, cr="4/8", crc_check=True, error_check=True)
    payload = rng.integers(0, 256, size=(1, 24)).astype(np.uint8)
    symbols = np.asarray(encode(jnp.asarray(payload), cfg)).astype(np.int32)
    # flipping one symbol's low bits beyond Hamming correction drops the frame
    corrupted = symbols.copy()
    corrupted[0, 9] ^= 0x3F
    res = decode(jnp.asarray(corrupted), cfg)
    assert int(res.status[0]) != OK


def test_header_rdd_overrides_configured_fec(rng):
    # decoder configured CR only drives deinterleave; the announced CR picks
    # the FEC decoder (LoRaDecoder.cpp:296) — same-CR case must still agree.
    cfg = LoRaConfig(sf=8, cr="4/5")
    payload = rng.integers(0, 256, size=(1, 12)).astype(np.uint8)
    res = roundtrip(payload, cfg)
    assert int(res.rdd[0]) == 1
    assert np.all(np.asarray(res.status) == OK)


# ---------------------------------------------------------------------------
# Golden bit-exact checks against the compiled reference oracle
# ---------------------------------------------------------------------------

def test_golden_whitening_streams():
    from lora_tpu.ops import codes

    for rdd in range(5):
        table = GOLDEN[f"whiten_table_rdd{rdd}"]
        lfsr = GOLDEN[f"whiten_lfsr_rdd{rdd}"]
        assert table == lfsr  # both reference generators agree
        mine = np.asarray(
            codes.whiten(jnp.zeros((len(lfsr),), jnp.int32), 0, rdd)
        )
        np.testing.assert_array_equal(mine, lfsr)
    for ofs in (1, 7, 12):
        lfsr = GOLDEN[f"whiten_lfsr_rdd4_ofs{ofs}"]
        mine = np.asarray(
            codes.whiten(jnp.zeros((len(lfsr),), jnp.int32), ofs, 4)
        )
        np.testing.assert_array_equal(mine, lfsr)


def test_golden_crc16():
    from lora_tpu.ops import codes

    for i, length in enumerate([0, 1, 2, 5, 16, 64, 255]):
        data = jnp.asarray(GOLDEN[f"crc_payload_len{length}"], jnp.int32)
        crc = int(codes.sx1272_data_checksum(data[None])[0])
        assert crc & 0xFF == GOLDEN["crc_lo"][i]
        assert crc >> 8 == GOLDEN["crc_hi"][i]


def test_golden_header_checksum():
    from lora_tpu.ops import codes

    expected = GOLDEN["header_checksums"]
    got = []
    for h0 in range(0, 256, 7):
        for h1 in range(0, 16, 3):
            got.append(int(codes.header_checksum(jnp.int32(h0), jnp.int32(h1))))
    assert got == expected


def test_golden_fec_tables():
    from lora_tpu.ops import codes

    nibs = jnp.arange(16, dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(codes.fec_encode(nibs, 4)), GOLDEN["enc_hamming84"]
    )
    np.testing.assert_array_equal(
        np.asarray(codes.fec_encode(nibs, 3)), GOLDEN["enc_hamming74"]
    )
    np.testing.assert_array_equal(
        np.asarray(codes.fec_encode(nibs, 1)), GOLDEN["enc_parity54"]
    )
    np.testing.assert_array_equal(
        np.asarray(codes.fec_encode(nibs, 2)), GOLDEN["enc_parity64"]
    )


def test_golden_interleaver():
    from lora_tpu.ops import codes

    # 30 distinct (ppm, rdd) shapes: one jit program holding all 30 tiny
    # gathers compiles once (~2s) — separate compiles (or eager per-op
    # compiles under disable_jit) cost ~26s on this 1-core box
    combos = [(ppm, rdd) for ppm in range(7, 13) for rdd in range(5)]
    cws = [
        jnp.asarray(GOLDEN[f"il_cw_ppm{ppm}_rdd{rdd}"], jnp.int32)
        for ppm, rdd in combos
    ]

    @jax.jit
    def all_combos(cw_list):
        return [
            codes.interleave(cw[None], ppm, rdd)[0]
            for cw, (ppm, rdd) in zip(cw_list, combos)
        ]

    for (ppm, rdd), sym in zip(combos, all_combos(cws)):
        np.testing.assert_array_equal(
            np.asarray(sym), GOLDEN[f"il_sym_ppm{ppm}_rdd{rdd}"]
        )


@pytest.mark.parametrize("sf", range(7, 13))
@pytest.mark.parametrize("rdd", range(5))
def test_golden_encoder_symbols(sf, rdd):
    payload = np.asarray(GOLDEN["enc_payload"], np.uint8)
    cr = f"4/{4+rdd}"
    cfg = LoRaConfig(sf=sf, cr=cr)
    symbols = np.asarray(encode(jnp.asarray(payload[None]), cfg)[0])
    np.testing.assert_array_equal(symbols, GOLDEN[f"enc_symbols_sf{sf}_rdd{rdd}"])


def test_golden_encoder_variants():
    payload = np.asarray(GOLDEN["enc_payload"], np.uint8)[None]

    cfg = LoRaConfig(sf=11, ppm=9, cr="4/7")
    np.testing.assert_array_equal(
        np.asarray(encode(jnp.asarray(payload), cfg)[0]),
        GOLDEN["enc_symbols_sf11_ppm9_rdd3"],
    )
    cfg = LoRaConfig(sf=10, cr="4/8", explicit_header=False, crc=False)
    np.testing.assert_array_equal(
        np.asarray(encode(jnp.asarray(payload), cfg)[0]),
        GOLDEN["enc_symbols_implicit_nocrc"],
    )
    cfg = LoRaConfig(sf=10, cr="4/8", whitening=False)
    np.testing.assert_array_equal(
        np.asarray(encode(jnp.asarray(payload), cfg)[0]),
        GOLDEN["enc_symbols_nowhiten"],
    )
    cfg = LoRaConfig(sf=10, cr="4/5")
    np.testing.assert_array_equal(
        np.asarray(encode(jnp.asarray(payload), cfg)[0]),
        GOLDEN["enc_symbols_rdd1"],
    )


def test_truncated_frame_tail_decodes_as_whitening_stream():
    """The reference zero-fills its over-counted codeword tail BEFORE
    dewhitening (LoRaDecoder.cpp:211,224,243), so when a header-announced
    length reaches past the real symbols, the missing bytes decode as the
    raw whitening stream — not as zeros.  Values cross-checked against a
    direct port of the reference decoder (first tail byte 227)."""
    import jax.numpy as jnp
    from lora_tpu import api

    cfg = LoRaConfig(sf=7, cr="4/4", crc=False, error_check=False, ampl=1.0)
    payload = np.arange(18, dtype=np.uint8)
    sym = np.asarray(api.encode(jnp.asarray(payload[None]), cfg))
    assert sym.shape[-1] == 28
    dec = api.decode(jnp.asarray(sym[:, :24], jnp.int32), cfg)  # truncated
    assert int(dec.status[0]) == 0
    data = np.asarray(dec.data)[0]
    np.testing.assert_array_equal(data[3:18], payload[:15])
    np.testing.assert_array_equal(data[18:21], [227, 198, 141])
