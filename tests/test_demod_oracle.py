"""Frame-level interop against the REFERENCE demodulator FSM.

tools/gen_demod_golden compiles /root/reference/LoRaDemod.cpp — the actual
5-state sample-consuming demod (FRAMESYNC retiming walk, fine-CFO rotator
table, downchirp CFO, quarter-chirp, per-symbol data state) — against the
minimal Pothos stub and drives it over a cf32 file.  These tests feed the
SAME waveforms (produced by this framework's modulator) to both
demodulators and require identical frame recovery: the strongest parity
statement available short of real radios (our TX ↔ their RX interop, and
our block-parallel RX re-derivation of their FSM behavior).
"""

import json
import pathlib
import shutil
import subprocess

import numpy as np
import pytest
import jax.numpy as jnp

import lora_tpu
from lora_tpu import api
from lora_tpu.ops import cplx
from lora_tpu.sim import channel as ch

ROOT = pathlib.Path(__file__).resolve().parent.parent
ORACLE = ROOT / "tools" / "gen_demod_golden"
REF = pathlib.Path("/root/reference")


def _build_oracle() -> bool:
    if ORACLE.exists():
        return True
    if shutil.which("make") is None or not REF.exists():
        return False
    r = subprocess.run(
        ["make", "gen_demod_golden"], cwd=ROOT / "tools",
        capture_output=True, text=True,
    )
    return r.returncode == 0 and ORACLE.exists()


def _run_oracle(x: np.ndarray, cfg, tmp_path, thresh=-30.0) -> dict:
    buf = np.empty(2 * x.size, np.float32)
    buf[0::2] = x.real
    buf[1::2] = x.imag
    f = tmp_path / "oracle_in.cf32"
    f.write_bytes(buf.tobytes())
    out = subprocess.run(
        [str(ORACLE), str(f), str(cfg.sf), hex(cfg.sync), str(thresh),
         str(cfg.mtu)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


def _tx(cfg, payload: bytes, delay: int, rng, noise=0.0, cfo_bins=0.0):
    msg = np.frombuffer(payload, np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(msg[None]), cfg), cfg)
    T = lora_tpu.required_samples(cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, T + delay - iq.shape[-1]))))
    iq = ch.time_offset(iq[0], delay).reshape(1, -1)[:, :T]
    if cfo_bins:
        iq = ch.cfo(iq, cfo_bins, cfg.N)
    if noise:
        nz = noise * rng.standard_normal((2, 1, T)).astype(np.float32)
        iq = cplx.IQ(iq.re + nz[0], iq.im + nz[1])
    return iq


needs_oracle = pytest.mark.skipif(
    not _build_oracle(), reason="reference repo / toolchain unavailable"
)


@needs_oracle
def test_clean_frame_symbols_match_reference_fsm(tmp_path, rng):
    """Clean delayed frame: the reference FSM and our block-parallel
    demodulator must recover byte-identical symbol streams, and agree on
    the coarse CFO signal (LoRaDemod.cpp:246-269)."""
    cfg = lora_tpu.LoRaConfig(sf=8, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(16) + 4)
    iq = _tx(cfg, b"oracle-interop!!", 3 * cfg.N + 37, rng)
    ref = _run_oracle(
        np.asarray(cplx.to_complex(iq[0])).astype(np.complex64), cfg,
        tmp_path,
    )
    dem = lora_tpu.demodulate(iq, cfg)
    assert bool(dem.found[0]) and len(ref["packets"]) == 1
    ours = np.asarray(dem.symbols)[0][: int(dem.count[0])]
    theirs = np.asarray(ref["packets"][0], np.int16)
    np.testing.assert_array_equal(ours, theirs[: ours.size])
    assert int(dem.freq_error[0]) == int(ref["signals"][0]["error"])
    # both squelch at the frame's end: identical symbol counts
    assert int(dem.count[0]) == theirs.size


@needs_oracle
def test_noisy_cfo_frame_matches_reference_fsm(tmp_path, rng):
    """Noisy frame with fractional CFO: both demodulators recover the
    SAME symbol stream and coarse CFO, and the reference FSM's symbols
    decode to the sent payload through our decoder (TX-ours -> RX-theirs
    -> decode-ours interop)."""
    cfg = lora_tpu.LoRaConfig(sf=8, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(16) + 4)
    iq = _tx(
        cfg, b"noisy cfo frame.", 2 * cfg.N + 101, rng,
        noise=0.15, cfo_bins=0.3,
    )
    ref = _run_oracle(
        np.asarray(cplx.to_complex(iq[0])).astype(np.complex64), cfg,
        tmp_path,
    )
    dem = lora_tpu.demodulate(iq, cfg)
    assert bool(dem.found[0]) and len(ref["packets"]) == 1
    theirs = np.asarray(ref["packets"][0], np.int16)
    ours = np.asarray(dem.symbols)[0][: int(dem.count[0])]
    # compare the frame's real data symbols; mtu-padding windows past the
    # frame detect pure noise whose argmax is a numerical lottery on a
    # flat spectrum (the noise floor sits above the -30 dB squelch)
    n_data = cfg.num_symbols(16)
    np.testing.assert_array_equal(ours[:n_data], theirs[:n_data])
    assert int(dem.freq_error[0]) == int(ref["signals"][0]["error"])

    def decode_bytes(sym):
        pad = np.zeros(cfg.mtu, np.int16)
        pad[: sym.size] = sym
        res = api.decode(jnp.asarray(pad[None], jnp.int32), cfg)
        return api.extract_payloads(res)[0]

    assert decode_bytes(theirs) == b"noisy cfo frame."
    assert decode_bytes(ours) == b"noisy cfo frame."


MOD_ORACLE = ROOT / "tools" / "gen_mod_golden"


def _build_mod_oracle() -> bool:
    if MOD_ORACLE.exists():
        return True
    if shutil.which("make") is None or not REF.exists():
        return False
    r = subprocess.run(
        ["make", "gen_mod_golden"], cwd=ROOT / "tools",
        capture_output=True, text=True,
    )
    return r.returncode == 0 and MOD_ORACLE.exists()


@pytest.mark.skipif(
    not _build_mod_oracle(), reason="reference repo / toolchain unavailable"
)
def test_reference_mod_waveform_demodulates_byte_exact(tmp_path):
    """Reverse interop: the REFERENCE modulator FSM (LoRaMod.cpp's 9-state
    per-symbol waveform generator with its continuous phase accumulator)
    renders a frame from OUR encoder's symbols; our demodulator must
    recover every data symbol exactly and decode the payload byte-exactly
    (their-TX -> our-RX)."""
    cfg = lora_tpu.LoRaConfig(sf=8, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(16) + 4)
    msg = np.frombuffer(b"ref-tx to our-rx", np.uint8)
    syms = np.asarray(
        api.encode(jnp.asarray(msg[None]), cfg)
    )[0].astype(np.uint16)
    sym_f = tmp_path / "syms.u16"
    sym_f.write_bytes(syms.tobytes())
    wav_f = tmp_path / "refmod.cf32"
    subprocess.run(
        [str(MOD_ORACLE), str(sym_f), str(wav_f), str(cfg.sf),
         hex(cfg.sync), "1", "1", "1.0"],
        capture_output=True, text=True, check=True,
    )
    raw = np.fromfile(wav_f, np.float32)
    x = raw[0::2] + 1j * raw[1::2]
    T = lora_tpu.required_samples(cfg)
    buf = np.zeros(T, np.complex64)
    buf[: min(x.size, T)] = x[:T]
    dem = lora_tpu.demodulate(
        cplx.from_complex(jnp.asarray(buf[None])), cfg
    )
    assert bool(dem.found[0]) and int(dem.freq_error[0]) == 0
    ours = np.asarray(dem.symbols)[0][: syms.size].astype(np.uint16)
    np.testing.assert_array_equal(ours, syms)
    res = api.decode(dem.symbols.astype(jnp.int32), cfg)
    assert api.extract_payloads(res)[0] == b"ref-tx to our-rx"


DEC_ORACLE = ROOT / "tools" / "gen_dec_golden"


def _build_dec_oracle() -> bool:
    if DEC_ORACLE.exists():
        return True
    if shutil.which("make") is None or not REF.exists():
        return False
    r = subprocess.run(
        ["make", "gen_dec_golden"], cwd=ROOT / "tools",
        capture_output=True, text=True,
    )
    return r.returncode == 0 and DEC_ORACLE.exists()


def _run_dec_oracle(syms, cfg, tmp_path, errchk):
    f = tmp_path / "dec_syms.u16"
    f.write_bytes(np.asarray(syms, np.uint16).tobytes())
    out = subprocess.run(
        [str(DEC_ORACLE), str(f), str(cfg.sf), str(0), cfg.cr,
         "1" if cfg.whitening else "0", "1" if cfg.crc else "0",
         "1" if cfg.hdr else "0", "1" if errchk else "0",
         "1" if cfg.explicit_header else "0", str(cfg.data_length)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


@pytest.mark.skipif(
    not _build_dec_oracle(), reason="reference repo / toolchain unavailable"
)
def test_decoder_matches_reference_block(tmp_path, rng):
    """Decoder parity against the compiled reference LoRaDecoder block:
    clean symbols decode to identical bytes; a corrupted symbol drops on
    both sides with error_check on, and FEC-corrects to identical bytes
    on both sides with error_check off (LoRaDecoder.cpp:293-384)."""
    cfg = lora_tpu.LoRaConfig(sf=8, cr="4/7", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(16) + 4)
    payload = b"decoder parity!!"
    msg = np.frombuffer(payload, np.uint8)
    syms = np.asarray(
        api.encode(jnp.asarray(msg[None]), cfg)
    )[0].astype(np.uint16)

    def ours(arr, error_check):
        pad = np.pad(arr, (0, cfg.mtu - arr.size))[None].astype(np.int32)
        res = api.decode(
            jnp.asarray(pad), cfg.replace(error_check=error_check)
        )
        return api.extract_payloads(res)[0], int(res.status[0])

    # clean: byte-identical output packets
    ref = _run_dec_oracle(syms, cfg, tmp_path, errchk=True)
    got, status = ours(syms, True)
    assert [bytes(p) for p in ref["packets"]] == [payload]
    assert got == payload and status == 0 and ref["dropped"] == 0

    # one corrupted symbol, error_check on: both drop
    bad = syms.copy()
    bad[10] ^= 0x80
    refb = _run_dec_oracle(bad, cfg, tmp_path, errchk=True)
    gotb, statusb = ours(bad, True)
    assert refb["packets"] == [] and refb["dropped"] == 1
    assert gotb is None and statusb != 0

    # error_check off: both FEC-correct to the same payload
    refc = _run_dec_oracle(bad, cfg, tmp_path, errchk=False)
    gotc, statusc = ours(bad, False)
    assert [bytes(p) for p in refc["packets"]] == [payload]
    assert gotc == payload and statusc == 0


@needs_oracle
def test_sensitivity_paired_not_worse_than_reference(tmp_path):
    """Near the SNR threshold, on IDENTICAL noisy samples (paired, seeded),
    our demodulator recovers at least as many frames as the compiled
    reference FSM (tools/bench_sensitivity.py's claim, pinned small).
    The circular-median run alignment is what holds this margin: a single
    noise-flipped argmax must not blind the sync scan."""
    cfg = lora_tpu.LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(16) + 4)
    T = lora_tpu.required_samples(cfg)
    N = cfg.N
    P, noise = 12, 1.7
    rng = np.random.default_rng(20260818)
    payloads = rng.integers(0, 256, (P, 16), np.uint8)
    payloads[:, 0] = np.arange(P)
    delays = rng.integers(0, 2 * N, P)
    clean = api.modulate(api.encode(jnp.asarray(payloads), cfg), cfg)
    cre, cim = np.asarray(clean.re), np.asarray(clean.im)
    bank_re = np.zeros((P, T), np.float32)
    bank_im = np.zeros((P, T), np.float32)
    L = cre.shape[-1]
    for p in range(P):
        d = int(delays[p])
        k = min(L, T - d)
        bank_re[p, d : d + k] = cre[p, :k]
        bank_im[p, d : d + k] = cim[p, :k]
    bank_re += noise * rng.standard_normal((P, T)).astype(np.float32)
    bank_im += noise * rng.standard_normal((P, T)).astype(np.float32)

    dem = lora_tpu.demodulate(
        cplx.IQ(jnp.asarray(bank_re), jnp.asarray(bank_im)), cfg
    )
    dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
    got = api.extract_payloads(dec)
    ours = sum(
        1 for i in range(P)
        if bool(np.asarray(dem.found)[i])
        and got[i] == bytes(payloads[i].tolist())
    )

    stream = (bank_re + 1j * bank_im).astype(np.complex64).reshape(-1)
    ref = _run_oracle(stream, cfg, tmp_path, thresh=cfg.thresh)
    sent = {bytes(p.tolist()) for p in payloads}
    seen = set()
    for pkt in ref["packets"]:
        sym = np.zeros(cfg.mtu, np.int32)
        k = min(len(pkt), cfg.mtu)
        sym[:k] = np.asarray(pkt[:k], np.int32)
        pl = api.extract_payloads(api.decode(jnp.asarray(sym[None]), cfg))[0]
        if pl is not None and pl in sent:
            seen.add(pl)

    assert ours >= len(seen), (ours, len(seen))
    assert ours >= P // 2, f"sensitivity collapsed: {ours}/{P}"
