"""Soft-decision RX cost at bank scale (the round-4 verdict's item 3).

The soft path is the repo's flagship beyond-reference capability
(models/softdec, ~1.5 dB payload sensitivity); round 4 left it on the
unfused XLA payload path with an unmeasured bank-scale cost.  Round 5
fused it: demodulate(spectra=True) keeps the Pallas kernels, which emit
the payload |FFT|^2 windows from VMEM as an extra output.

Times, chained-dispatch, SF10 x B channels:
  (a) hard RX   — demodulate + decode (one jit program)
  (b) soft RX   — demodulate(spectra=True) + decode_soft (one jit program)
  (c) soft RX, fused="off" — the round-4 fallback, for attribution

and prints the soft/hard ratio (target: <= 1.5x) plus a correctness gate:
both paths must decode every bench frame byte-exactly before timing.

Run: python tools/bench_soft.py [--B 2048]   (CPU smoke: --cpu --B 4)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--B", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import cplx

    B = args.B if not args.cpu else 4
    sf = 10 if not args.cpu else 7
    cfg = LoRaConfig(sf=sf, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(32) + 4)
    T = required_samples(cfg)
    rng = np.random.default_rng(0)
    pay_np = rng.integers(0, 256, (B, 32), dtype=np.uint8)
    payload = jnp.asarray(pay_np)
    iq = api.modulate(api.encode(payload, cfg), cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, T - iq.shape[-1]))))[:, :T]
    kr, ki = jax.random.split(jax.random.PRNGKey(0))
    iq = cplx.IQ(
        iq.re + 0.1 * jax.random.normal(kr, (B, T), jnp.float32),
        iq.im + 0.1 * jax.random.normal(ki, (B, T), jnp.float32),
    )
    jax.block_until_ready(iq)

    # chain discipline: everything per rep inside ONE jit; the host loop
    # passes device scalars only (see tools/bench_decode.py)
    def hard_fn(fused):
        @jax.jit
        def f(x, eps):
            x = cplx.IQ(x.re + eps, x.im)
            d = api.demodulate(x, cfg, fused=fused)
            dec = api.decode(d.symbols.astype(jnp.int32), cfg)
            return (dec.status, dec.data, dec.offset, dec.length), (
                dec.status.ravel()[0] * 0
            ).astype(jnp.float32)

        return f

    def soft_fn(fused):
        @jax.jit
        def f(x, eps):
            x = cplx.IQ(x.re + eps, x.im)
            d = api.demodulate(x, cfg, spectra=True, fused=fused)
            dec = api.decode_soft(d.fft_mag2, cfg)
            return (dec.status, dec.data, dec.offset, dec.length), (
                dec.status.ravel()[0] * 0
            ).astype(jnp.float32)

        return f

    want = [bytes(p.tolist()) for p in pay_np]

    def check(out, tag):
        status, data, off, length = (np.asarray(a) for a in out)
        ok = (status == 0).all()
        got = [
            bytes(data[i, off[i]: off[i] + length[i]].tolist())
            for i in range(B)
        ]
        assert ok and got == want, f"{tag}: bench frames must decode clean"

    def chain(fn, tag):
        out, eps = fn(iq, jnp.float32(0))
        check(out, tag)
        out, eps = fn(iq, jnp.float32(0))
        np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, eps = fn(iq, eps)
        np.asarray(out[0])
        return (time.perf_counter() - t0) / args.reps

    s_hard = chain(hard_fn("auto"), "hard")
    print(json.dumps({
        "path": "hard (demod+decode)", "ms": round(s_hard * 1e3, 1),
        "Gsamp/s": round(B * T / s_hard / 1e9, 2),
    }), flush=True)
    s_soft = chain(soft_fn("auto"), "soft-fused")
    print(json.dumps({
        "path": "soft fused (spectra demod + ML decode)",
        "ms": round(s_soft * 1e3, 1),
        "Gsamp/s": round(B * T / s_soft / 1e9, 2),
        "soft_vs_hard": round(s_soft / s_hard, 2),
    }), flush=True)
    s_off = chain(soft_fn("off"), "soft-unfused")
    print(json.dumps({
        "path": "soft unfused (round-4 fallback, fused=off)",
        "ms": round(s_off * 1e3, 1),
        "Gsamp/s": round(B * T / s_off / 1e9, 2),
        "fused_speedup": round(s_off / s_soft, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
