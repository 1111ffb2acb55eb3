"""Stage-level time attribution for the demod step (where do the ~67 ms
of a B=2048 SF10 step go?).

The roofline table (tools/bench_roofline.py) times the fused kernels in
isolation: payload 10.7 ms + track 9.1 ms + coarse detect 19.3 ms leaves
~27 ms of the full step unattributed (gathers, alignment epilogue,
payload epilogue, fusion losses).  This harness times each jitted
sub-stage with the same chained-dispatch method (K dependent dispatches,
one readback — amortizes the ~24 ms tunnel RPC) so the gap has an owner.

Stages (models/demodulator.py):
  coarse    _coarse_detect (batched, outside the vmap) + vmapped
            _align_frame epilogue -> (t_cand, t0, found_pre)
  trackg    gather_rows of the TRACK_ROWS scan block
  track     fused sync-scan + CFO kernel (incl. its gather)
  head      _head_stage = coarse + trackg + track
  paylg     gather_rows of the payload rows
  payload   _payload_stage = paylg + fused detect + epilogue
  full      _demod_whole (head + payload in one program)

Run on the real chip: python tools/bench_stages.py [--B 2048] [--sf 10]
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
    ap.add_argument("--B", type=int, default=2048)
    ap.add_argument("--sf", type=int, default=10)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--payload", type=int, default=32,
                    help="payload bytes (32 = headline; 16 = config-3)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models import demodulator as dm
    from lora_tpu.ops import cplx, pallas_demod, shift as shift_ops
    from lora_tpu.ops.cplx import IQ

    B = args.B if not args.cpu else 4
    cfg = LoRaConfig(sf=args.sf, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(args.payload) + 4)
    T = dm.required_samples(cfg)
    N = cfg.N

    rng = np.random.default_rng(0)
    payload = jnp.asarray(
        rng.integers(0, 256, (B, args.payload), dtype=np.uint8)
    )
    iq = api.modulate(api.encode(payload, cfg), cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, T - iq.shape[-1]))))[:, :T]
    iq = IQ(
        iq.re + jnp.asarray(0.1 * rng.standard_normal((B, T)), jnp.float32),
        iq.im + jnp.asarray(0.1 * rng.standard_normal((B, T)), jnp.float32),
    )
    jax.block_until_ready(iq)
    fused = "off" if args.cpu else "auto"

    # reference head outputs (concrete, reused as payload-stage inputs)
    xb_p, head, fine_total, t0v = dm._head_stage(iq, cfg, 1, fused)
    jax.block_until_ready(t0v)

    rows = []

    def add(name, s):
        rows.append({"stage": name, "ms": round(s * 1e3, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # Chain discipline: the ENTIRE rep lives in one jit — the input
    # perturbation, the stage, and the next-eps derivation.  Eager ops in
    # the loop (the old dep()/jnp.max carries) serialize against pending
    # work and pay per-op tunnel RPCs; big-array step outputs additionally
    # made the final readback pull hundreds of MB through the ~30 MB/s
    # tunnel (the old gather rows printed 290-936 ms for <5 ms stages).
    def chained(stage_of, base=None):
        """stage_of(x) -> probe array, or (probe, keep) where `keep` is a
        big intermediate returned as an (unfetched) jit output so XLA
        cannot DCE its HBM write out of the measured stage."""
        src = iq if base is None else base

        @jax.jit
        def f(eps):
            out = stage_of(IQ(src.re + eps, src.im))
            probe, keep = out if isinstance(out, tuple) else (out, ())
            return probe, (probe.ravel()[0] * 0).astype(jnp.float32), keep

        return f

    def timeit(f):
        out, eps, _ = f(jnp.float32(0))
        np.asarray(out)
        out, eps, _ = f(jnp.float32(0))
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out, eps, _ = f(eps)
        np.asarray(out)
        return (time.perf_counter() - t0) / args.reps

    def _coarse_align(x):
        cv, csnr, cpwr = dm._coarse_detect(x, cfg, False)
        out = jax.vmap(
            lambda v, s, p: dm._align_frame(v, s, p, cfg, x.shape[-1])
        )(cv, csnr, cpwr)
        return out[1]

    add("coarse(align)", timeit(chained(_coarse_align)))

    def _trackg(x):
        g = shift_ops.gather_rows(x, t0v // N, pallas_demod.TRACK_ROWS, N)
        return g.re[:, 0, :1], g

    add("track-gather", timeit(chained(_trackg)))

    add("head(total)", timeit(chained(
        lambda x: dm._head_stage(x, cfg, 1, fused)[3]
    )))

    dstart = head.consumed

    def _paylg(x):
        g = shift_ops.gather_rows(x, dstart // N, dm._payload_gather_rows(cfg), N)
        return g.re[:, 0, :1], g

    add("payload-gather", timeit(chained(_paylg, base=xb_p)))

    add("payload(total)", timeit(chained(
        lambda x: dm._payload_stage(
            x, head, fine_total, t0v, cfg, False, 1, fused
        ).symbols,
        base=xb_p,
    )))

    s_full = timeit(chained(
        lambda x: dm._demod_whole(x, cfg, False, 1, fused).symbols
    ))
    add("full-step", s_full)

    gsps = B * T / s_full / 1e9
    print(json.dumps({
        "B": B, "sf": args.sf, "T": T,
        "full_Gsamp/s": round(gsps, 2),
        "attribution": rows,
    }))


if __name__ == "__main__":
    main()
