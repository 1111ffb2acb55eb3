"""Hardware smoke test: cross-backend parity on the real TPU.

THE HARDWARE GATE (round-2 lesson): no kernel, geometry, or dispatch-route
change lands without this script green on the chip.  Interpret mode proves
value semantics only — Mosaic legality (layouts, sublane alignment,
lowering) can only fail on real hardware, and round 2 shipped a compile-
broken default route by skipping exactly this run.  The runbook
(tools/tpu_runbook.sh) runs it first and every dispatch branch is covered:
direct + gather-fed payload/track kernels, the batched detector, the
multi-frame route, spectra (soft-RX) mode, bf16 decisions, the XLA
tracking fallback, channelizer, and the matmul FFT.

The pytest suite runs on the virtual CPU mesh; this script validates the
TPU-specific code paths (Pallas detector/shift kernels, planar transfers)
against the CPU reference path on identical inputs.  Because backend
routing is process-wide, the CPU reference runs in a child process with
JAX_PLATFORMS=cpu and the parent compares on the TPU:

    python tools/tpu_smoke.py          # needs the axon TPU grant

Prints one JSON line per check; exits non-zero on any mismatch.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

SF_LIST = (7, 10, 12)


def build_and_reference(path: str) -> None:
    """Child (CPU): build inputs, compute reference outputs, save npz."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import channelizer as chz
    from lora_tpu.ops import cplx

    rng = np.random.default_rng(0xC0FE)
    out = {}
    for sf in SF_LIST:
        cfg = LoRaConfig(sf=sf, cr="4/7", ampl=1.0)
        cfg = cfg.replace(mtu=cfg.num_symbols(16) + 4)
        B = 16
        payload = rng.integers(0, 256, (B, 16), dtype=np.uint8)
        iq = api.modulate(api.encode(jnp.asarray(payload), cfg), cfg)
        T = required_samples(cfg)
        iq = cplx.pad(iq, ((0, 0), (0, max(0, T - iq.shape[-1]))))[:, :T]
        nz = 0.2 * rng.standard_normal((2, B, T)).astype(np.float32)
        iq = cplx.IQ(iq.re + nz[0], iq.im + nz[1])
        dem = api.demodulate(iq, cfg)
        out[f"re{sf}"] = np.asarray(iq.re)
        out[f"im{sf}"] = np.asarray(iq.im)
        out[f"payload{sf}"] = payload
        out[f"found{sf}"] = np.asarray(dem.found)
        # compare only the frame's real symbols: mtu-padding windows beyond
        # the frame detect pure noise, whose argmax is legitimately
        # precision-dependent across backends
        out[f"symbols{sf}"] = np.asarray(dem.symbols)[:, : cfg.num_symbols(16)]
        out[f"tsync{sf}"] = np.asarray(dem.t_sync)

    # multi-frame dispatch branch (max_frames=2 routes the gather-fed
    # fused kernels): two frames per buffer with a gap
    cfgm = LoRaConfig(sf=7, cr="4/7", ampl=1.0)
    cfgm = cfgm.replace(mtu=cfgm.num_symbols(8) + 2)
    Bm = 8
    Tm = 3 * required_samples(cfgm)
    pm = rng.integers(0, 256, (2 * Bm, 8), dtype=np.uint8)
    fiq = api.modulate(api.encode(jnp.asarray(pm), cfgm), cfgm)
    fre, fim = np.asarray(fiq.re), np.asarray(fiq.im)
    Lm = fre.shape[-1]
    mre = np.zeros((Bm, Tm), np.float32)
    mim = np.zeros((Bm, Tm), np.float32)
    for b in range(Bm):
        d0 = 64 * b
        d1 = d0 + Lm + 512
        mre[b, d0 : d0 + Lm] = fre[2 * b]
        mim[b, d0 : d0 + Lm] = fim[2 * b]
        mre[b, d1 : d1 + Lm] = fre[2 * b + 1]
        mim[b, d1 : d1 + Lm] = fim[2 * b + 1]
    mre += 0.15 * rng.standard_normal((Bm, Tm)).astype(np.float32)
    mim += 0.15 * rng.standard_normal((Bm, Tm)).astype(np.float32)
    dmm = api.demodulate(
        cplx.IQ(jnp.asarray(mre), jnp.asarray(mim)), cfgm, max_frames=2
    )
    out["mf_re"], out["mf_im"] = mre, mim
    out["mf_found"] = np.asarray(dmm.found)
    out["mf_tsync"] = np.asarray(dmm.t_sync)
    out["mf_symbols"] = np.asarray(dmm.symbols)[
        :, :, : cfgm.num_symbols(8)
    ]

    K, M = 16, 256
    wide = rng.standard_normal((2, 2, K * M)).astype(np.float32)
    y, _ = chz.channelize(cplx.IQ(jnp.asarray(wide[0]), jnp.asarray(wide[1])), K)
    out["wide_re"], out["wide_im"] = wide[0], wide[1]
    out["chan_re"], out["chan_im"] = np.asarray(y.re), np.asarray(y.im)

    # synthesis bank (TX combiner): K channel streams -> wideband
    u = rng.standard_normal((2, 2, K, M)).astype(np.float32)
    xs, _ = chz.synthesize(cplx.IQ(jnp.asarray(u[0]), jnp.asarray(u[1])))
    out["syn_re"], out["syn_im"] = u[0], u[1]
    out["syn_out_re"] = np.asarray(xs.re)
    out["syn_out_im"] = np.asarray(xs.im)

    # direct payload kernel: random row offsets covering every sublane
    # alignment (q % 8 in 0..7) — stresses the scalar-prefetched dynamic
    # sublane slice on real Mosaic; reference = XLA gather + detect
    from lora_tpu.ops import detect as det_ops
    from lora_tpu.ops import pallas_demod
    from lora_tpu.ops import shift as shift_ops

    Nd, mtud, Bd = 1024, 20, 32
    rpd = pallas_demod.payload_rows(Nd, mtud)
    Wd = rpd + 24  # (Wd - rpd) % 8 == 0: the direct route's Mosaic gate
    assert pallas_demod.payload_direct_pc(Nd, mtud, Wd, Bd) is not None
    dx = rng.standard_normal((2, Bd, Wd * Nd)).astype(np.float32)
    # q sweep: every sublane alignment (0..7), the top clamp band where
    # the 8-aligned slice start saturates (W - rp - 7 .. W - rp), random
    dq = np.concatenate(
        [np.arange(8, dtype=np.int32),
         Wd - rpd - np.arange(8, dtype=np.int32),
         rng.integers(0, Wd - rpd + 1, Bd - 16).astype(np.int32)]
    )
    drs = rng.integers(0, Nd, Bd).astype(np.int32)
    dfe = (0.4 * rng.standard_normal(Bd)).astype(np.float32)
    dg = shift_ops.gather_rows(
        cplx.IQ(jnp.asarray(dx[0]), jnp.asarray(dx[1])), jnp.asarray(dq),
        rpd, Nd,
    )
    dwin = shift_ops.shift_windows(dg, jnp.asarray(drs), mtud)
    dref = det_ops.dechirp_detect(
        dwin, ferr=jnp.asarray(dfe)[:, None], want_f_index=False,
        fft_impl="xla",
    )
    out["dir_re"], out["dir_im"] = dx[0], dx[1]
    out["dir_q"], out["dir_rs"], out["dir_fe"] = dq, drs, dfe
    out["dir_value"] = np.asarray(dref.value)
    out["dir_power"] = np.asarray(dref.power)

    # direct track kernel: same scalar-prefetched sublane-slice pattern,
    # row offsets covering every sublane alignment; reference = the
    # gather-fed flat track kernel in interpreter mode (itself pinned to
    # the XLA scan path by tests/test_pallas_demod.py)
    Nt, Bt = 1024, 16
    Rt = pallas_demod.TRACK_ROWS
    Wt = 40  # W % 8 == 0: the direct track route's Mosaic gate
    assert pallas_demod.track_direct_tc(Nt, Wt, Bt) is not None
    tx = rng.standard_normal((2, Bt, Wt, Nt)).astype(np.float32)
    tq = np.concatenate(
        [np.arange(8, dtype=np.int32),
         Wt - Rt - np.arange(8, dtype=np.int32)]
    ).astype(np.int32)
    trs = rng.integers(0, Nt, Bt).astype(np.int32)
    tg = shift_ops.gather_rows(
        cplx.IQ(jnp.asarray(tx[0].reshape(Bt, -1)),
                jnp.asarray(tx[1].reshape(Bt, -1))),
        jnp.asarray(tq), Rt, Nt,
    )
    tref = pallas_demod.track(
        tg, jnp.asarray(trs), 0x34, -12.0, interpret=True
    )
    out["trk_re"], out["trk_im"] = tx[0], tx[1]
    out["trk_q"], out["trk_rs"] = tq, trs
    for k, v in tref.items():
        out[f"trk_{k}"] = np.asarray(v)

    # matmul-FFT windows (the XLA four-step path: the track-scan fallback
    # at N >= 2048 and debug taps); reference = host numpy FFT
    fx = rng.standard_normal((2, 4, 4096)).astype(np.float32)
    out["fft_in_re"], out["fft_in_im"] = fx[0], fx[1]  # parent checks
    np.savez(path, **out)                              # vs host np.fft



def main() -> int:
    if "--cpu-ref" in sys.argv:
        build_and_reference(sys.argv[-1])
        return 0

    ref_path = os.path.join(tempfile.mkdtemp(), "ref.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-ref", ref_path],
        check=True,
        env=env,
    )
    ref = np.load(ref_path)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.ops import channelizer as chz
    from lora_tpu.ops import cplx

    if jax.default_backend() == "cpu":
        print(json.dumps({"check": "devices", "ok": False,
                          "err": "no accelerator visible"}))
        return 1
    ok_all = True

    def report(name, ok, **kw):
        nonlocal ok_all
        ok_all &= bool(ok)
        print(json.dumps({"check": name, "ok": bool(ok), **kw}))

    for sf in SF_LIST:
        cfg = LoRaConfig(sf=sf, cr="4/7", ampl=1.0)
        cfg = cfg.replace(mtu=cfg.num_symbols(16) + 4)
        x = cplx.IQ(jnp.asarray(ref[f"re{sf}"]), jnp.asarray(ref[f"im{sf}"]))
        dem = api.demodulate(x, cfg)
        dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
        f_eq = np.array_equal(np.asarray(dem.found), ref[f"found{sf}"])
        s_eq = np.array_equal(
            np.asarray(dem.symbols)[:, : cfg.num_symbols(16)],
            ref[f"symbols{sf}"],
        )
        t_eq = np.array_equal(np.asarray(dem.t_sync), ref[f"tsync{sf}"])
        want = [bytes(p.tolist()) for p in ref[f"payload{sf}"]]
        p_ok = api.extract_payloads(dec) == want
        report(
            f"demod_parity_sf{sf}", f_eq and s_eq and t_eq and p_ok,
            found=f_eq, symbols=s_eq, t_sync=t_eq, payloads=p_ok,
        )
        # bf16 MXU mode: same decisions (found/symbols/t_sync) as the CPU
        # f32 reference — settles whether the headline bench may use it
        demb = api.demodulate(x, cfg, fused="bf16")
        b_eq = (
            np.array_equal(np.asarray(demb.found), ref[f"found{sf}"])
            and np.array_equal(
                np.asarray(demb.symbols)[:, : cfg.num_symbols(16)],
                ref[f"symbols{sf}"],
            )
            and np.array_equal(np.asarray(demb.t_sync), ref[f"tsync{sf}"])
        )
        report(f"demod_bf16_decisions_sf{sf}", b_eq)
        if sf in (SF_LIST[0], 10):
            # production soft RX on hardware: spectra-mode demod — now the
            # FUSED payload kernel emitting |FFT|^2 from VMEM (round-5) —
            # + ML soft decode, payload-exact vs the CPU reference bank.
            # sf=10 exercises the four-step detect's group-major spectrum
            # + the natural-order restore gather on real Mosaic.
            dsp = api.demodulate(x, cfg, spectra=True)
            sdec = api.decode_soft(dsp.fft_mag2, cfg)
            sp_ok = api.extract_payloads(sdec) == want
            report(f"demod_soft_payloads_sf{sf}", sp_ok)
        if cfg.N >= 2048:
            # the XLA-tracking fallback (the production demod route at
            # N >= 2048 with B > 64 — demodulate()'s dispatch note): the
            # coarse + payload detects ride the stable batched detector
            # kernel and the batched sync scan issues one flat [M, 2, N]
            # pallas detect per step inside lax.scan.  Exercise that
            # composition on real Mosaic — interpret-mode CPU tests
            # cannot catch lowering/layout faults in it.
            demo = api.demodulate(x, cfg, fused="off")
            o_eq = (
                np.array_equal(np.asarray(demo.found), ref[f"found{sf}"])
                and np.array_equal(
                    np.asarray(demo.symbols)[:, : cfg.num_symbols(16)],
                    ref[f"symbols{sf}"],
                )
                and np.array_equal(
                    np.asarray(demo.t_sync), ref[f"tsync{sf}"]
                )
            )
            report(f"demod_xla_path_sf{sf}", o_eq)

    # multi-frame dispatch branch on real Mosaic (gather-fed fused route)
    cfgm = LoRaConfig(sf=7, cr="4/7", ampl=1.0)
    cfgm = cfgm.replace(mtu=cfgm.num_symbols(8) + 2)
    dmm = api.demodulate(
        cplx.IQ(jnp.asarray(ref["mf_re"]), jnp.asarray(ref["mf_im"])),
        cfgm, max_frames=2,
    )
    mf_ok = (
        np.array_equal(np.asarray(dmm.found), ref["mf_found"])
        and np.array_equal(np.asarray(dmm.t_sync), ref["mf_tsync"])
        and np.array_equal(
            np.asarray(dmm.symbols)[:, :, : cfgm.num_symbols(8)],
            ref["mf_symbols"],
        )
    )
    report("demod_multiframe_parity", mf_ok,
           frames=int(ref["mf_found"].sum()))

    y, _ = chz.channelize(
        cplx.IQ(jnp.asarray(ref["wide_re"]), jnp.asarray(ref["wide_im"])), 16
    )
    err = float(
        max(
            np.abs(np.asarray(y.re) - ref["chan_re"]).max(),
            np.abs(np.asarray(y.im) - ref["chan_im"]).max(),
        )
    )
    report("channelizer_parity", err < 1e-3, max_err=err)

    # fused Pallas filterbank (ops/pallas_channelize) vs the XLA pipeline
    # ON THE SAME TPU: f32 mode must match to summation order (both run
    # HIGHEST-precision MXU contractions); bf16 mode to ~3 digits.  The
    # K=64 case exercises tile seams (Q > TQ) and the lookahead row.
    wiq = cplx.IQ(jnp.asarray(ref["wide_re"]), jnp.asarray(ref["wide_im"]))
    for Kc, lbl in ((16, "k16"), (64, "k64")):
        Tc = (wiq.shape[-1] // Kc) * Kc
        wc = wiq[..., :Tc]
        yx, _ = chz.channelize(wc, Kc, impl="xla")
        yp, _ = chz.channelize(wc, Kc, impl="pallas")
        ef = float(
            max(
                np.abs(np.asarray(yx.re - yp.re)).max(),
                np.abs(np.asarray(yx.im - yp.im)).max(),
            )
        )
        report(f"filterbank_kernel_f32_{lbl}", ef < 1e-4, max_err=ef)
        yb, _ = chz.channelize(wc, Kc, impl="pallas", bf16=True)
        eb = float(
            max(
                np.abs(np.asarray(yx.re - yb.re)).max(),
                np.abs(np.asarray(yx.im - yb.im)).max(),
            )
        )
        report(f"filterbank_kernel_bf16_{lbl}", eb < 3e-2, max_err=eb)

    # factorized FIR+IDFT filterbank (round-5; the auto route at K=64) vs
    # the XLA pipeline ON THE SAME TPU: channel-major output, transposed
    # dot, lookahead FIR rows — all on real Mosaic
    from lora_tpu.ops.pallas_channelize import fir_geometry

    for Kc in (64, 128):
        if not fir_geometry(Kc, 8):
            continue
        Tc = (wiq.shape[-1] // Kc) * Kc
        wc = wiq[..., :Tc]
        yx, _ = chz.channelize(wc, Kc, impl="xla")
        yf, _ = chz.channelize(wc, Kc, impl="fir")
        ef = float(
            max(
                np.abs(np.asarray(yx.re - yf.re)).max(),
                np.abs(np.asarray(yx.im - yf.im)).max(),
            )
        )
        report(f"filterbank_fir_f32_k{Kc}", ef < 1e-4, max_err=ef)
        yb, _ = chz.channelize(wc, Kc, impl="fir", bf16=True)
        eb = float(
            max(
                np.abs(np.asarray(yx.re - yb.re)).max(),
                np.abs(np.asarray(yx.im - yb.im)).max(),
            )
        )
        report(f"filterbank_fir_bf16_k{Kc}", eb < 3e-2, max_err=eb)

    # synthesis bank (TX combiner) vs the CPU reference
    xs, _ = chz.synthesize(
        cplx.IQ(jnp.asarray(ref["syn_re"]), jnp.asarray(ref["syn_im"]))
    )
    es = float(
        max(
            np.abs(np.asarray(xs.re) - ref["syn_out_re"]).max(),
            np.abs(np.asarray(xs.im) - ref["syn_out_im"]).max(),
        )
    )
    report("synthesis_bank_parity", es < 1e-3, max_err=es)

    from lora_tpu.ops import pallas_demod
    from lora_tpu.ops import shift as shift_ops

    # direct (gather-free) payload kernel vs the gather-fed flat kernel ON
    # THE SAME TPU: this isolates exactly what the direct path changes —
    # the in-VMEM 8-aligned row selection + remainder roll — and the
    # contract is BIT-exactness (the detect arithmetic is shared code).
    # A CPU XLA-FFT reference is the wrong oracle for the noise inputs
    # here: near-tied noise bins legitimately flip argmax across FFT
    # algorithms (the end-to-end demod_parity checks above cover
    # cross-backend decisions on real frames).
    Nd, mtud, Bd = 1024, 20, 32
    Wd = ref["dir_re"].shape[-1] // Nd
    rpd = pallas_demod.payload_rows(Nd, mtud)
    x3 = cplx.IQ(
        jnp.asarray(ref["dir_re"].reshape(Bd, Wd, Nd)),
        jnp.asarray(ref["dir_im"].reshape(Bd, Wd, Nd)),
    )
    dg = shift_ops.gather_rows(
        x3.reshape(Bd, Wd * Nd), jnp.asarray(ref["dir_q"]), rpd, Nd
    )
    flat = pallas_demod.payload_detect(
        dg, jnp.asarray(ref["dir_rs"]), jnp.asarray(ref["dir_fe"]), mtud
    )
    direct = pallas_demod.payload_detect_direct(
        x3, jnp.asarray(ref["dir_q"]), jnp.asarray(ref["dir_rs"]),
        jnp.asarray(ref["dir_fe"]), mtud,
    )
    eqs = {
        k: bool(np.array_equal(np.asarray(a), np.asarray(b)))
        for k, a, b in zip(("value", "power", "noise"), direct, flat)
    }
    report("payload_direct_vs_gather_bitexact", all(eqs.values()), **eqs)
    # ... and the gather-fed flat kernel vs the CPU XLA reference with a
    # cross-backend dB tolerance (values on noise may tie-flip; power is
    # the stable scalar)
    p_err = float(np.abs(np.asarray(flat[1]) - ref["dir_power"]).max())
    report("payload_kernel_vs_cpu", p_err < 0.05, max_power_err_db=p_err)

    # track kernels: gather-free direct vs gather-fed flat on the TPU
    # (bit-exact contract), flat vs the CPU interpreter reference with
    # exact int decisions and a 0.05 dB cross-backend tolerance
    Nt, Bt = 1024, 16
    Rt = pallas_demod.TRACK_ROWS
    Wt = ref["trk_re"].shape[1]
    xt3 = cplx.IQ(jnp.asarray(ref["trk_re"]), jnp.asarray(ref["trk_im"]))
    tg = shift_ops.gather_rows(
        xt3.reshape(Bt, Wt * Nt), jnp.asarray(ref["trk_q"]), Rt, Nt
    )
    tflat = pallas_demod.track(tg, jnp.asarray(ref["trk_rs"]), 0x34, -12.0)
    tdirect = pallas_demod.track_direct(
        xt3, jnp.asarray(ref["trk_q"]), jnp.asarray(ref["trk_rs"]),
        0x34, -12.0,
    )
    eqs = {
        k: bool(np.array_equal(np.asarray(tdirect[k]), np.asarray(v)))
        for k, v in tflat.items()
    }
    report("track_direct_vs_gather_bitexact", all(eqs.values()), **eqs)
    errs = {}
    okt = True
    for k, v in tflat.items():
        got, want = np.asarray(v), ref[f"trk_{k}"]
        if got.dtype.kind in "ib":
            e_ok = np.array_equal(got, want)
            errs[k] = bool(e_ok)
        else:
            e = float(np.abs(got - want).max())
            e_ok = e < 0.05
            errs[k] = e
        okt &= bool(e_ok)
    report("track_kernel_vs_cpu", okt, **errs)

    from lora_tpu.ops import fft as fft_ops

    for n in (2048, 4096):
        xi = cplx.IQ(
            jnp.asarray(ref["fft_in_re"][:, :n]),
            jnp.asarray(ref["fft_in_im"][:, :n]),
        )
        sp = fft_ops.fft(xi, impl="matmul")
        want = np.fft.fft(ref["fft_in_re"][:, :n] + 1j * ref["fft_in_im"][:, :n])
        errf = float(
            max(
                np.abs(np.asarray(sp.re) - want.real).max(),
                np.abs(np.asarray(sp.im) - want.imag).max(),
            )
        )
        # f32 four-step over n-point windows: O(sqrt(n)*eps) growth
        report(f"fft_matmul_parity_n{n}", errf < 2e-2 * np.sqrt(n),
               max_err=errf)

    print(json.dumps({"check": "ALL", "ok": bool(ok_all)}))
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
