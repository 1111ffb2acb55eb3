"""Marginal cost of the on-device decoder at bank scale (config-5 found
the demod+decode slab program ~10x slower than demod alone).

Times, chained-dispatch: (a) demodulate only, (b) demodulate+decode,
(c) decode alone on resident symbols.  SF10, B channels, 32-byte frames.

Run: python tools/bench_decode.py [--B 2048]   (CPU smoke: --cpu --B 4)
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
    payload = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    iq = api.modulate(api.encode(payload, cfg), cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, T - iq.shape[-1]))))[:, :T]
    iq = cplx.IQ(
        iq.re + jnp.asarray(0.05 * rng.standard_normal((B, T)), np.float32),
        iq.im + jnp.asarray(0.05 * rng.standard_normal((B, T)), np.float32),
    )
    jax.block_until_ready(iq)

    # Chain discipline (hard-won on this backend): EVERYTHING per rep must
    # live inside ONE jit — an eager big-array add costs ~600 ms/rep, and
    # even eager SCALAR derivations (ravel()[0] * 0) pay remote eager-op
    # compiles that swamped a 53 ms step as 700-3000 ms.  Each jit returns
    # (big_out, eps_next) so the host loop only passes device scalars.
    @jax.jit
    def demod_only(x, eps):
        x = cplx.IQ(x.re + eps, x.im)
        d = api.demodulate(x, cfg)
        return d.symbols, (d.symbols.ravel()[0] * 0).astype(jnp.float32)

    @jax.jit
    def demod_decode(x, eps):
        x = cplx.IQ(x.re + eps, x.im)
        d = api.demodulate(x, cfg)
        dec = api.decode(d.symbols.astype(jnp.int32), cfg)
        return dec.status, (dec.status.ravel()[0] * 0).astype(jnp.float32)

    @jax.jit
    def decode_only(sym, eps):
        dec = api.decode(sym + eps, cfg)
        return dec.status, dec.status.ravel()[0] * 0

    def chain(fn, x0, zero):
        out, eps = fn(x0, zero)
        np.asarray(out)
        out, eps = fn(x0, zero)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, eps = fn(x0, eps)
        np.asarray(out)
        return (time.perf_counter() - t0) / args.reps

    s_dem = chain(demod_only, iq, jnp.float32(0))
    print(json.dumps({"stage": "demod only", "ms": round(s_dem * 1e3, 1)}),
          flush=True)
    s_both = chain(demod_decode, iq, jnp.float32(0))
    print(json.dumps({"stage": "demod+decode", "ms": round(s_both * 1e3, 1)}),
          flush=True)
    sym = api.demodulate(iq, cfg).symbols.astype(jnp.int32)
    jax.block_until_ready(sym)
    s_dec = chain(decode_only, sym, jnp.int32(0))
    print(json.dumps({
        "stage": "decode only", "ms": round(s_dec * 1e3, 1),
        "us_per_frame": round(s_dec / B * 1e6, 1),
        "marginal_decode_ms": round((s_both - s_dem) * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
