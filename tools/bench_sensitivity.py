"""Head-to-head RX sensitivity: our demodulator vs the compiled REFERENCE
demodulator on IDENTICAL noisy sample streams.

The strongest "matches or beats" statement available without radios: every
trial builds one noisy waveform bank (our TX + AWGN, seeded), then feeds
the SAME samples to
  (a) this framework's block-parallel demodulator (+ decoder), and
  (b) the reference's LoRaDemod.cpp 5-state FSM, compiled unmodified
      against the Pothos stub (tools/gen_demod_golden), whose recovered
      symbol packets run through the same decoder.
A frame counts as recovered iff its unique payload decodes byte-exactly
(error_check on).  Because the comparison is paired (identical noise
realizations), FER differences are attributable to the demodulators
alone, not to sampling luck.

Runs entirely on CPU (force with --cpu off-box).  Writes one JSON row per
(sf, cr, noise) point:
  {"sf", "cr", "noise_ampl", "snr_db", "n", "recovered_ours",
   "recovered_ref", "fer_ours", "fer_ref"}

Usage:
  python tools/bench_sensitivity.py [--packets 40] [--out docs/...json]
                                    [--sf 7 10] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import subprocess
import sys
import tempfile

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
ORACLE = ROOT / "tools" / "gen_demod_golden"

# noise grids bracketing each SF's FER transition (docs/ber_sweep.json)
GRIDS = {
    7: (1.4, 1.7, 2.0, 2.3, 2.6),
    8: (1.8, 2.2, 2.6, 3.0, 3.4),
    10: (4.0, 4.8, 5.6, 6.4, 7.2),
    12: (8.0, 9.6, 11.2, 12.8, 14.4),
}
PAYLOAD_LEN = 16


def build_oracle() -> bool:
    if ORACLE.exists():
        return True
    if shutil.which("make") is None or not pathlib.Path("/root/reference").exists():
        return False
    r = subprocess.run(
        ["make", "gen_demod_golden"], cwd=ROOT / "tools",
        capture_output=True, text=True,
    )
    return r.returncode == 0 and ORACLE.exists()


def run_oracle(x: np.ndarray, cfg, tmp: pathlib.Path) -> dict:
    """Drive the compiled reference demod FSM over complex64 samples."""
    buf = np.empty(2 * x.size, np.float32)
    buf[0::2] = x.real
    buf[1::2] = x.imag
    f = tmp / "sens_in.cf32"
    f.write_bytes(buf.tobytes())
    out = subprocess.run(
        [str(ORACLE), str(f), str(cfg.sf), hex(cfg.sync), str(cfg.thresh),
         str(cfg.mtu)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=int, nargs="+", default=[7, 10])
    ap.add_argument("--cr", nargs="+", default=["4/8"],
                    help="coding rates to sweep (paired per (sf, cr))")
    ap.add_argument("--rotate", type=float, default=0.0,
                    help="static channel phase rotation in radians applied "
                         "to the shared noisy banks (both RX paths see the "
                         "rotated samples) — the reference simulation "
                         "topology's impairment, pi/1.2345 in "
                         "lora_simulation.pth")
    ap.add_argument("--packets", type=int, default=40)
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--out", default=str(ROOT / "docs" / "sensitivity_vs_reference.json"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (off-box runs)")
    ap.add_argument("--noise", type=float, nargs="+", default=None,
                    help="override the per-SF noise grid")
    ap.add_argument("--soft", action="store_true",
                    help="also run the soft-decision decoder "
                         "(api.decode_soft) on the same banks")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if not build_oracle():
        print("reference oracle unavailable; aborting", file=sys.stderr)
        raise SystemExit(1)

    import jax.numpy as jnp
    import lora_tpu
    from lora_tpu import api
    from lora_tpu.ops import cplx
    from lora_tpu.sim import channel as ch

    tmp = pathlib.Path(tempfile.mkdtemp())
    rows = []
    P = args.packets
    for sf in args.sf:
      for cr in args.cr:
        cfg = lora_tpu.LoRaConfig(sf=sf, cr=cr, ampl=1.0)
        cfg = cfg.replace(mtu=cfg.num_symbols(PAYLOAD_LEN) + 4)
        T = lora_tpu.required_samples(cfg)
        N = cfg.N
        grid = args.noise or GRIDS.get(sf)
        if grid is None:
            raise SystemExit(f"no noise grid for SF{sf}; pass --noise")
        for noise in grid:
            rng = np.random.default_rng((args.seed, sf, int(noise * 1000)))
            payloads = rng.integers(0, 256, (P, PAYLOAD_LEN), np.uint8)
            payloads[:, 0] = np.arange(P)  # unique per frame
            delays = rng.integers(0, 2 * N, P)
            clean = api.modulate(
                api.encode(jnp.asarray(payloads), cfg), cfg
            )
            bank_re = np.zeros((P, T), np.float32)
            bank_im = np.zeros((P, T), np.float32)
            cre = np.asarray(clean.re)
            cim = np.asarray(clean.im)
            L = cre.shape[-1]
            for p in range(P):
                d = int(delays[p])
                k = min(L, T - d)
                bank_re[p, d : d + k] = cre[p, :k]
                bank_im[p, d : d + k] = cim[p, :k]
            bank_re += noise * rng.standard_normal((P, T)).astype(np.float32)
            bank_im += noise * rng.standard_normal((P, T)).astype(np.float32)
            if args.rotate:
                # static channel rotation applied to the SHARED bank:
                # both RX paths demodulate the rotated samples (the
                # reference simulation topology's channel impairment)
                c, s = np.cos(args.rotate), np.sin(args.rotate)
                bank_re, bank_im = (
                    (c * bank_re - s * bank_im).astype(np.float32),
                    (s * bank_re + c * bank_im).astype(np.float32),
                )
            iq = cplx.IQ(jnp.asarray(bank_re), jnp.asarray(bank_im))

            sent = {bytes(p.tolist()) for p in payloads}

            # (a) ours: one batched demod + decode
            dem = api.demodulate(iq, cfg, spectra=args.soft)
            dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
            got = api.extract_payloads(dec)
            fnd = np.asarray(dem.found)
            ours = sum(
                1 for i, g in enumerate(got)
                if bool(fnd[i]) and g == bytes(payloads[i].tolist())
            )
            soft = None
            if args.soft:
                sdec = api.decode_soft(dem.fft_mag2, cfg)
                sgot = api.extract_payloads(sdec)
                soft = sum(
                    1 for i, g in enumerate(sgot)
                    if bool(fnd[i]) and g == bytes(payloads[i].tolist())
                )

            # (b) reference FSM: the same bank as one continuous stream
            stream = (bank_re + 1j * bank_im).astype(np.complex64).reshape(-1)
            ref = run_oracle(stream, cfg, tmp)
            ref_ok = 0
            seen = set()
            for pkt in ref["packets"]:
                sym = np.zeros(cfg.mtu, np.int32)
                k = min(len(pkt), cfg.mtu)
                sym[:k] = np.asarray(pkt[:k], np.int32)
                r = api.decode(jnp.asarray(sym[None]), cfg)
                pl = api.extract_payloads(r)[0]
                if pl is not None and pl in sent and pl not in seen:
                    seen.add(pl)
                    ref_ok += 1

            snr_db = float(-10 * np.log10(2 * noise * noise))
            row = {
                "sf": sf, "cr": cr, "noise_ampl": noise,
                "snr_db": round(snr_db, 2), "n": P,
                "recovered_ours": int(ours), "recovered_ref": int(ref_ok),
                "fer_ours": round(1 - ours / P, 4),
                "fer_ref": round(1 - ref_ok / P, 4),
            }
            if args.rotate:
                row["rotate"] = round(args.rotate, 4)
            if soft is not None:
                row["recovered_soft"] = int(soft)
                row["fer_soft"] = round(1 - soft / P, 4)
            rows.append(row)
            print(json.dumps(row))

    out = pathlib.Path(args.out)
    out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
