"""Fused demodulator-stage kernels (ops/pallas_demod) vs the XLA reference
path, in interpreter mode on CPU.  The same kernels are cross-checked on
real TPU hardware by tools/tpu_smoke.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lora_tpu
from lora_tpu import api
from lora_tpu.models.demodulator import demodulate, required_samples
from lora_tpu.ops import cplx, detect as det_ops, pallas_demod
from lora_tpu.ops import shift as shift_ops
from lora_tpu.sim import channel as ch


@pytest.mark.parametrize(
    "N,mtu,tiled",
    [
        (128, 20, False),   # flat kernel, direct DFT, PC > 1
        (512, 136, False),  # flat kernel, four-step, PC > 1
        (1024, 20, False),  # flat kernel, four-step
        (512, 136, True),   # tiled fallback, two tiles (next-block context)
    ],
)
def test_payload_kernel_matches_shift_plus_detect(N, mtu, tiled, rng):
    if tiled:
        rp = pallas_demod.payload_geometry(N, mtu)[2]
    else:
        assert pallas_demod.payload_flat_geometry(N, mtu) is not None
        rp = pallas_demod.payload_rows(N, mtu)
    assert rp >= mtu + 1
    B = 5  # deliberately not a multiple of the flat kernel's PC
    g = cplx.IQ(
        jnp.asarray(rng.standard_normal((B, rp, N)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, rp, N)), jnp.float32),
    )
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe = jnp.asarray(rng.standard_normal(B) * 0.4, jnp.float32)
    win = shift_ops.shift_windows(g, rs, mtu)
    ref = det_ops.dechirp_detect(
        win, ferr=fe[:, None], want_f_index=False, fft_impl="xla"
    )
    if tiled:
        val, pwr, nse = pallas_demod._payload_tiled(
            g, rs, fe, mtu, interpret=True
        )
    else:
        val, pwr, nse = pallas_demod.payload_detect(
            g, rs, fe, mtu, interpret=True
        )
    np.testing.assert_array_equal(np.asarray(ref.value), np.asarray(val))
    np.testing.assert_allclose(
        np.asarray(ref.power), np.asarray(pwr), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ref.noise), np.asarray(nse), atol=2e-2
    )


@pytest.mark.parametrize(
    "N,mtu,B", [(128, 20, 1), (128, 20, 6), (512, 40, 6)]
)
def test_payload_direct_matches_gather_plus_flat(N, mtu, B, rng):
    """The gather-free direct kernel (VMEM row selection from the whole
    [B, W, N] buffer view) is bit-identical to gather_rows + the flat
    payload kernel, including at the row-clamp boundary (where the
    8-aligned slice start saturates and the remainder roll absorbs up to
    8 rows)."""
    rp = pallas_demod.payload_rows(N, mtu)
    W = rp + 16  # (W - rp) % 8 == 0: the direct route's Mosaic gate
    pc = pallas_demod.payload_direct_pc(N, mtu, W, B)
    assert pc is not None and B % pc == 0
    x3 = cplx.IQ(
        jnp.asarray(rng.standard_normal((B, W, N)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, W, N)), jnp.float32),
    )
    q = np.asarray(rng.integers(0, W - rp + 1, B), np.int32)
    q[0] = 0
    if B > 1:
        q[1] = W - rp       # clamp boundary
        q[2] = W + 5        # past the end -> clamped like gather_rows
    q = jnp.asarray(q)
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe = jnp.asarray(rng.standard_normal(B) * 0.4, jnp.float32)
    x = x3.reshape(B, W * N)
    g = shift_ops.gather_rows(x, q, rp, N)
    ref = pallas_demod.payload_detect(g, rs, fe, mtu, interpret=True)
    out = pallas_demod.payload_detect_direct(
        x3, q, rs, fe, mtu, interpret=True
    )
    for r, o, name in zip(ref, out, ("value", "power", "noise")):
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(o), err_msg=name
        )


def test_track_direct_matches_gather_plus_track(rng, monkeypatch):
    """The gather-free direct track kernel (VMEM row selection from the
    whole [B, W, N] buffer view) is bit-identical to gather_rows + the
    flat track kernel, including at the row-clamp boundary.  TC is pinned
    to 8 so B=16 spans two grid cells (the natural pick would be one);
    N=128 only — track's detect closure is the same _detect_args closure
    the payload kernel tests cover at the four-step sizes, and the
    track-specific logic (rolls, scan, row selection) is N-independent."""
    N, B = 128, 16
    R = pallas_demod.TRACK_ROWS
    W = 32  # W % 8 == 0: the direct track route's Mosaic gate
    assert pallas_demod.track_direct_tc(N, W, B) == 16
    monkeypatch.setattr(pallas_demod, "track_direct_tc", lambda *a: 8)
    x3 = cplx.IQ(
        jnp.asarray(rng.standard_normal((B, W, N)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, W, N)), jnp.float32),
    )
    q = np.asarray(rng.integers(0, W - R + 1, B), np.int32)
    q[0] = 0
    q[1] = W - R            # clamp boundary
    q[2] = W + 5            # past the end -> clamped like gather_rows
    q = jnp.asarray(q)
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    x = x3.reshape(B, W * N)
    rows = shift_ops.gather_rows(x, q, R, N)
    ref = pallas_demod.track(rows, rs, 0x34, -12.0, interpret=True)
    out = pallas_demod.track_direct(x3, q, rs, 0x34, -12.0, interpret=True)
    assert set(ref) == set(out)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(out[k]), err_msg=k
        )


def test_track_direct_tc_geometry():
    """TC is always a multiple of 8 dividing B (Mosaic sublane-aligned
    (TC, 1) output blocks); oversized row views, W not on the 8-row grid
    (the 8-aligned dynamic-slice legality gate) and non-multiple-of-8
    banks fall back to the gather path (None)."""
    R = pallas_demod.TRACK_ROWS
    for N in (128, 256, 512, 1024):
        for W in (24, 32, 40, 48):
            for B in (8, 16, 4096):
                tc = pallas_demod.track_direct_tc(N, W, B)
                if tc is not None:
                    assert tc % 8 == 0 and B % tc == 0
                    assert tc * W * N * 16 <= 12 * (1 << 20)
    assert pallas_demod.track_direct_tc(128, 16, 8) is None      # short view
    assert pallas_demod.track_direct_tc(128, 26, 8) is None      # W % 8 != 0
    assert pallas_demod.track_direct_tc(128, 24, 5) is None      # B indiv.
    assert pallas_demod.track_direct_tc(4096, 40, 4096) is None  # VMEM
    # traffic gate: reading all W rows beats the 3-pass gather only when
    # W <= 3*TRACK_ROWS (long payload-sized banks keep the gather);
    # 48 is the largest W on the 8-row grid under that bound
    assert pallas_demod.track_direct_tc(128, 48, 8) is not None
    assert pallas_demod.track_direct_tc(128, 56, 8) is None
    rp = pallas_demod.payload_rows(128, 20)
    assert pallas_demod.payload_direct_pc(128, 20, 3 * rp, 8) is not None
    assert pallas_demod.payload_direct_pc(128, 20, 3 * rp + 1, 8) is None
    assert pallas_demod.payload_direct_pc(128, 20, rp + 12, 8) is None  # grid
    # the headline bench shape (lora_tpu/benchmarks.py: SF10, 32-byte
    # payloads, B=4096) must keep the gather-free payload route — a gate
    # regression here would silently slow the benchmark
    bench_cfg = lora_tpu.LoRaConfig(sf=10, cr="4/8", ampl=1.0)
    bench_cfg = bench_cfg.replace(mtu=bench_cfg.num_symbols(32) + 4)
    Wb = required_samples(bench_cfg) // bench_cfg.N
    assert (
        pallas_demod.payload_direct_pc(bench_cfg.N, bench_cfg.mtu, Wb, 4096)
        is not None
    )


def _impaired_bank(cfg, rng, B, payload_bytes=6, noise=0.2, cfo_bins=2.3):
    payload = jnp.asarray(
        rng.integers(0, 256, (B, payload_bytes), dtype=np.uint8)
    )
    iq = api.modulate(api.encode(payload, cfg), cfg)
    need = required_samples(cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, need - iq.shape[-1]))))[:, :need]
    rows = []
    for i in range(B):
        d = int(rng.integers(0, 3 * cfg.N))
        rows.append(ch.time_offset(iq[i], d)[..., :need])
    bank = cplx.IQ(
        jnp.stack([r.re for r in rows]), jnp.stack([r.im for r in rows])
    )
    if cfo_bins:
        bank = ch.cfo(bank, cfo_bins, cfg.N)
    return ch.awgn(jax.random.PRNGKey(7), bank, noise)


def test_fused_demod_bit_identical_sf7(rng):
    """fused="interpret" is bit-identical to the XLA path; "interpret-bf16"
    recovers identical packets (symbols, framing, timing) with dB outputs
    within the documented bf16 bounds.  One shared bank + one XLA reference
    compile for both checks (full-demod CPU compiles dominate the suite).
    B=8 routes BOTH gather-free direct kernels (track_direct_tc and
    payload_direct_pc need B divisible by their cell size)."""
    cfg = lora_tpu.LoRaConfig(sf=7, cr="4/7", ampl=1.0, mtu=24)
    bank = _impaired_bank(cfg, rng, B=8)
    ref = demodulate(bank, cfg, fused="off")
    assert bool(np.all(np.asarray(ref.found)))
    for mode, f_atol, snr_atol in (
        ("interpret", 1e-5, 1e-4),
        ("interpret-bf16", 0.05, 0.1),
    ):
        fus = demodulate(bank, cfg, fused=mode)
        for f in (
            "found",
            "t_sync",
            "freq_error",
            "count",
            "consumed",
            "payload_complete",
        ):
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, f)), np.asarray(getattr(fus, f)),
                err_msg=f"{mode}:{f}",
            )
        sym_diff = (
            np.asarray(ref.symbols) != np.asarray(fus.symbols)
        ).sum(axis=-1)
        if mode == "interpret":
            assert int(sym_diff.sum()) == 0, sym_diff
        else:
            # bf16 rounding may flip a near-tie FFT bin in 0.2-sigma noise
            # (both decisions are valid reads of the same peak); framing
            # stays exact and flips are isolated
            assert int(sym_diff.max()) <= 1, sym_diff
        np.testing.assert_allclose(
            np.asarray(ref.fine_freq), np.asarray(fus.fine_freq), atol=f_atol
        )
        np.testing.assert_allclose(
            np.asarray(ref.snr), np.asarray(fus.snr), atol=snr_atol
        )


@pytest.mark.parametrize("N,mtu", [(128, 20), (1024, 20)])
def test_payload_kernel_bf16_same_decisions(N, mtu, rng):
    """bf16 MXU casts keep symbol decisions identical and move dB outputs
    by well under the 0.05 dB documented bound (ops/pallas_detect._mxu_dot)
    on signal-bearing windows (pure-noise windows have near-tie peaks whose
    argmax legitimately differs at bf16 precision)."""
    B, rp = 4, pallas_demod.payload_rows(N, mtu)
    n = np.arange(N)
    # distinct chirp symbols per row + mild noise: realistic peak margins
    sym = rng.integers(0, N, (B, rp))
    ph = 2 * np.pi * ((sym[..., None] + n) ** 2 % (2 * N)) / (2 * N)
    g = cplx.IQ(
        jnp.asarray(np.cos(ph) + 0.1 * rng.standard_normal((B, rp, N)),
                    jnp.float32),
        jnp.asarray(np.sin(ph) + 0.1 * rng.standard_normal((B, rp, N)),
                    jnp.float32),
    )
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe = jnp.asarray(rng.standard_normal(B) * 0.4, jnp.float32)
    val32, pwr32, _ = pallas_demod.payload_detect(g, rs, fe, mtu,
                                                  interpret=True)
    val16, pwr16, _ = pallas_demod.payload_detect(g, rs, fe, mtu,
                                                  interpret=True, bf16=True)
    np.testing.assert_array_equal(np.asarray(val32), np.asarray(val16))
    np.testing.assert_allclose(
        np.asarray(pwr32), np.asarray(pwr16), atol=0.05
    )


def test_payload_kernel_dense_bf16_same_decisions(rng, monkeypatch):
    """The opt-in dense bf16 DFT branch (LORA_MAX_DENSE_BF16_N; off by
    default after it measured slower than the four-step on the v5e —
    ops/pallas_demod._detect_args) stays decision-identical to f32 at
    N=1024.  jit caches key on static args + shapes only, so the branch
    flip needs a cache clear around the monkeypatched constant."""
    from lora_tpu.ops import pallas_detect
    N, mtu, B = 1024, 20, 4
    rp = pallas_demod.payload_rows(N, mtu)
    n = np.arange(N)
    sym = rng.integers(0, N, (B, rp))
    ph = 2 * np.pi * ((sym[..., None] + n) ** 2 % (2 * N)) / (2 * N)
    g = cplx.IQ(
        jnp.asarray(np.cos(ph) + 0.1 * rng.standard_normal((B, rp, N)),
                    jnp.float32),
        jnp.asarray(np.sin(ph) + 0.1 * rng.standard_normal((B, rp, N)),
                    jnp.float32),
    )
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe = jnp.asarray(rng.standard_normal(B) * 0.4, jnp.float32)
    val32, _, _ = pallas_demod.payload_detect(g, rs, fe, mtu, interpret=True)
    jax.clear_caches()
    monkeypatch.setattr(pallas_detect, "MAX_DENSE_BF16_N", 1024)
    monkeypatch.setattr(pallas_demod, "MAX_DENSE_BF16_N", 1024)
    try:
        vald, pwrd, _ = pallas_demod.payload_detect(
            g, rs, fe, mtu, interpret=True, bf16=True
        )
        np.testing.assert_array_equal(np.asarray(val32), np.asarray(vald))
        assert np.isfinite(np.asarray(pwrd)).all()
    finally:
        jax.clear_caches()  # drop the dense-branch traces before restore


def test_fused_demod_multiframe(rng):
    cfg = lora_tpu.LoRaConfig(sf=7, cr="4/5", ampl=1.0, mtu=16)
    payload = jnp.asarray(rng.integers(0, 256, (2, 4), dtype=np.uint8))
    iq = api.modulate(api.encode(payload, cfg), cfg)
    L = iq.shape[-1]
    need = required_samples(cfg)
    T = 2 * need
    re = jnp.zeros((1, T), jnp.float32)
    im = jnp.zeros((1, T), jnp.float32)
    off0, off1 = 100, need + 5 * cfg.N
    re = re.at[0, off0 : off0 + L].set(iq.re[0])
    re = re.at[0, off1 : off1 + L].set(iq.re[1])
    im = im.at[0, off0 : off0 + L].set(iq.im[0])
    im = im.at[0, off1 : off1 + L].set(iq.im[1])
    buf = ch.awgn(jax.random.PRNGKey(1), cplx.IQ(re, im), 0.15)
    ref = demodulate(buf, cfg, max_frames=3, fused="off")
    fus = demodulate(buf, cfg, max_frames=3, fused="interpret")
    assert np.asarray(ref.found).tolist() == [[True, True, False]]
    for f in ("found", "t_sync", "count", "consumed", "symbols"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(fus, f)), err_msg=f
        )


def test_debug_taps_include_raw(rng):
    cfg = lora_tpu.LoRaConfig(sf=7, cr="4/5", ampl=1.0, mtu=16)
    bank = _impaired_bank(cfg, rng, B=2, payload_bytes=4, cfo_bins=0.0)
    dem = demodulate(bank, cfg, debug=True)
    assert dem.raw is not None and dem.dec is not None
    assert dem.raw.shape == (2, cfg.mtu, cfg.N)
    # the raw tap is the pre-dechirp input copy: dechirping it must
    # reproduce the dec tap (LoRaDemod.cpp:81 raw vs :82 dec ports)
    dec2 = det_ops.dechirp(dem.raw, ferr=dem.fine_freq[..., None])
    np.testing.assert_allclose(
        np.asarray(dec2.re), np.asarray(dem.dec.re), atol=1e-6
    )


def test_payload_complete_flags_truncated_frame(rng):
    # a frame whose payload extends past the buffer: found may be True but
    # payload_complete must be False (the ADVICE.md centralized fit check)
    cfg = lora_tpu.LoRaConfig(sf=7, cr="4/5", ampl=1.0, mtu=16)
    payload = jnp.asarray(rng.integers(0, 256, (1, 4), dtype=np.uint8))
    iq = api.modulate(api.encode(payload, cfg), cfg)
    need = required_samples(cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, need - iq.shape[-1]))))[:, :need]
    # shift the frame late enough that data_start + payload rows overrun
    late = ch.time_offset(iq[0], 10 * cfg.N)[..., :need].reshape(1, -1)
    dem = demodulate(late, cfg)
    ok = demodulate(iq, cfg)
    assert bool(np.asarray(ok.found)[0]) and bool(
        np.asarray(ok.payload_complete)[0]
    )
    if bool(np.asarray(dem.found)[0]):
        assert not bool(np.asarray(dem.payload_complete)[0])


def test_kernel_grid_geometry_mosaic_legal():
    """Mosaic lowering requires 8-row-aligned blocks; interpret-mode tests
    don't enforce it, so pin the static geometry for every supported N
    (caught live: _track_tc(4096) == 4 failed to lower on hardware)."""
    from lora_tpu.ops.pallas_demod import (
        _track_tc,
        payload_direct_pc,
        payload_flat_geometry,
        payload_geometry,
        TRACK_ROWS,
    )

    for sf in range(7, 13):
        N = 1 << sf
        tc = _track_tc(N)
        assert tc % 8 == 0 and tc >= 8, (N, tc)
        # double-buffered input blocks + rolled-row scratches under the
        # 40 MB kernel VMEM limit
        vmem = 2 * 2 * tc * TRACK_ROWS * N * 4 + 2 * TRACK_ROWS * tc * N * 4
        assert vmem < 40 * 1024 * 1024, (N, tc, vmem)
        for mtu in (7, 16, 33, 64, 129, 256):
            flat = payload_flat_geometry(N, mtu)
            if flat is not None:
                Rp, pc = flat
                M = pc * Rp
                assert Rp % 8 == 0 and Rp > mtu, (N, mtu, Rp)
                assert M % 8 == 0 and pc >= 1, (N, mtu, pc)
                # double-buffered IQ blocks under the 14 MB kernel limit
                assert 2 * 2 * M * N * 4 < 14 * 1024 * 1024, (N, mtu, M)
            TWM, tiles, Rp = payload_geometry(N, mtu)
            assert TWM % 8 == 0 and TWM >= 8, (N, mtu, TWM)
            assert TWM * tiles >= mtu + 1 or TWM * tiles > mtu, (N, mtu)
            assert Rp >= mtu + 1, (N, mtu, Rp)
            # direct kernel: representative demod buffer width
            rows = 8 * (mtu // 8 + 1)
            W = 4 + 10 + 5 + max(mtu + 1, rows) + 1
            for B in (1, 5, 2048):
                pcd = payload_direct_pc(N, mtu, W, B)
                if pcd is None:
                    continue
                assert B % pcd == 0 and pcd * rows <= 1024, (N, mtu, B, pcd)
                # double-buffered (pc, W, N) IQ inputs under the 24 MB limit
                assert 2 * 2 * pcd * W * N * 4 < 17 * 1024 * 1024, (
                    N, mtu, B, pcd,
                )
                assert (pcd * rows) % 8 == 0, (N, mtu, B, pcd)

@pytest.mark.parametrize(
    "N,mtu,route",
    [
        (128, 20, "flat"),    # direct DFT: natural bin order
        (512, 40, "flat"),    # four-step: group-major + de-perm
        (512, 136, "tiled"),  # tiled fallback, two tiles
        (128, 20, "direct"),  # gather-free kernel
        (512, 40, "direct"),
    ],
)
def test_payload_kernel_mag2_matches_xla(N, mtu, route, rng):
    """want_mag2: the fused payload kernels emit the |FFT|^2 windows the
    soft-decision decoder consumes; after the natural-order restore they
    match the XLA path's spectra (phase factors of the roll-free
    alignment drop under |.|^2)."""
    B = 4
    if route == "direct":
        rp = pallas_demod.payload_rows(N, mtu)
        W = rp + 16
        assert pallas_demod.payload_direct_pc(N, mtu, W, B) is not None
        x3 = cplx.IQ(
            jnp.asarray(rng.standard_normal((B, W, N)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, W, N)), jnp.float32),
        )
        q = jnp.asarray(rng.integers(0, W - rp + 1, B), jnp.int32)
        rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
        fe = jnp.asarray(rng.standard_normal(B) * 0.4, jnp.float32)
        g = shift_ops.gather_rows(x3.reshape(B, W * N), q, rp, N)
        out = pallas_demod.payload_detect_direct(
            x3, q, rs, fe, mtu, interpret=True, want_mag2=True
        )
    else:
        rp = (
            pallas_demod.payload_geometry(N, mtu)[2] if route == "tiled"
            else pallas_demod.payload_rows(N, mtu)
        )
        g = cplx.IQ(
            jnp.asarray(rng.standard_normal((B, rp, N)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, rp, N)), jnp.float32),
        )
        rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
        fe = jnp.asarray(rng.standard_normal(B) * 0.4, jnp.float32)
        if route == "tiled":
            raw = pallas_demod._payload_tiled(
                g, rs, fe, mtu, interpret=True, want_mag2=True
            )
            out = raw[:3] + (pallas_demod._natural_mag2(raw[3], N, False),)
        else:
            assert pallas_demod.payload_flat_geometry(N, mtu) is not None
            out = pallas_demod.payload_detect(
                g, rs, fe, mtu, interpret=True, want_mag2=True
            )
    win = shift_ops.shift_windows(g, rs, mtu)
    ref = det_ops.dechirp_detect(
        win, ferr=fe[:, None], want_mag2=True, fft_impl="xla"
    )
    val, pwr, nse, m2 = out
    np.testing.assert_array_equal(np.asarray(ref.value), np.asarray(val))
    rm2 = np.asarray(ref.mag2)
    om2 = np.asarray(m2)
    assert om2.shape == (B, mtu, N)
    np.testing.assert_allclose(om2, rm2, rtol=2e-3, atol=2e-4 * rm2.max())
    # the argmax bin's evidence is exactly the detect's peak: decisions
    # derived from the emitted spectra agree with the hard path
    np.testing.assert_array_equal(om2.argmax(-1), np.asarray(ref.value))


def test_fused_soft_path_decode_identical(rng):
    """demodulate(spectra=True) now keeps the fused kernels; decode_soft
    over their spectra reproduces the XLA path's soft decode exactly at a
    noisy operating point (the round-4 verdict's soft-RX fusion item)."""
    cfg = lora_tpu.LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(8) + 2)
    B = 6
    p = rng.integers(0, 256, (B, 8)).astype(np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(p), cfg), cfg)
    T = required_samples(cfg)
    iq = cplx.pad(iq, ((0, 0), (0, T - iq.shape[-1])))
    iq = ch.awgn(jax.random.PRNGKey(3), iq, 1.2)

    dem_x = demodulate(iq, cfg, spectra=True, fused="off")
    dem_f = demodulate(iq, cfg, spectra=True, fused="interpret")
    assert dem_f.fft_mag2 is not None
    np.testing.assert_array_equal(
        np.asarray(dem_x.found), np.asarray(dem_f.found)
    )
    np.testing.assert_array_equal(
        np.asarray(dem_x.symbols), np.asarray(dem_f.symbols)
    )
    dec_x = api.decode_soft(dem_x.fft_mag2, cfg)
    dec_f = api.decode_soft(dem_f.fft_mag2, cfg)
    np.testing.assert_array_equal(
        np.asarray(dec_x.status), np.asarray(dec_f.status)
    )
    np.testing.assert_array_equal(
        np.asarray(dec_x.data), np.asarray(dec_f.data)
    )
    assert api.extract_payloads(dec_f) == api.extract_payloads(dec_x)
