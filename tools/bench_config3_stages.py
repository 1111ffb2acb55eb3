"""Config-3 integration attribution (VERDICT r3 item 2): where does the
fused filterbank's standalone rate go when the K-channel demod bank is
attached?

Times, with the SAME depth-1 pipelined loop bench_scale's config-3 row
uses (independent dispatches, previous readback overlapped — wall/iter
== device time per program once the tunnel RPC is hidden; a chained
variant was abandoned: the carry add + the wrapper's eager post-jit
reshapes serialize the chain and over-report by ~2x):

  fb        polyphase filterbank + IDFT alone (ops/channelizer.channelize)
  demod     the demod bank alone on a PRE-channelized [S*K, M] input
  fused     the combined one-dispatch program (api.channelized_demodulate)

All at the config-3 operating point: SF7, K = 64 channels/stream,
S wideband streams (default 128 -> 8192 channels).  Every row reports
wide-samples/s so the integration loss has an owner: fused should
approach 1 / (1/fb + 1/demod); any shortfall is dispatch/fusion loss.

Run on the real chip: python tools/bench_config3_stages.py [--S 128]
CPU smoke: --cpu (tiny shapes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_pipe(step, reps: int) -> float:
    """Wall/iter over `reps` independent dispatches, depth-1 pipelined
    readback (the bench_scale / bench.py steady-state loop)."""
    out = step()
    np.asarray(out)  # compile + settle
    out = step()
    np.asarray(out)
    t0 = time.perf_counter()
    pending = None
    for _ in range(reps):
        out = step()
        if pending is not None:
            np.asarray(pending)
        pending = out
    np.asarray(pending)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--S", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--mode", default="bf16", choices=("auto", "bf16"),
                    help="demod dispatch mode for the timed programs")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import demodulate, required_samples
    from lora_tpu.ops import channelizer as chz
    from lora_tpu.ops.cplx import IQ

    on_tpu = jax.default_backend() != "cpu"
    S = args.S if on_tpu else 2
    reps = args.reps if on_tpu else 2
    mode = args.mode if on_tpu else "off"
    K = 64
    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(16) + 2)
    M = required_samples(cfg)  # per-channel samples for one demod window
    T = M * K                  # wideband samples per stream
    rng = np.random.default_rng(0)
    r2 = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    wide = IQ(r2((S, T)), r2((S, T)))
    jax.block_until_ready(wide)
    bf16 = mode == "bf16"

    rows = []

    def add(name, s_per, samples):
        rows.append({
            "stage": name, "ms": round(s_per * 1e3, 2),
            "Gwide-samp/s": round(samples / s_per / 1e9, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    # ---- filterbank alone --------------------------------------------------
    @jax.jit
    def fb(x):
        y, _ = chz.channelize(x, K, bf16=bf16)
        return y

    # readback must be TINY: pulling the full [S, K, M] output through the
    # ~30 MB/s dev tunnel costs seconds/call and would swamp the timing
    @jax.jit
    def fb_probe(x):
        y = fb(x)
        return y.re[:, 0, 0]

    add("fb(channelize)", _timed_pipe(lambda: fb_probe(wide), reps), S * T)

    # ---- demod bank alone (pre-channelized input) --------------------------
    y0 = fb(wide)
    bank = IQ(y0.re.reshape(S * K, M), y0.im.reshape(S * K, M))
    jax.block_until_ready(bank)

    @jax.jit
    def dem(b):
        d = demodulate(b, cfg, fused=mode)
        return d.symbols, d.found

    add("demod(bank)", _timed_pipe(lambda: dem(bank)[1], reps), S * T)

    # ---- fused combined program --------------------------------------------
    s_fused = _timed_pipe(
        lambda: api.channelized_demodulate(wide, K, cfg, fused=mode)[0].found,
        reps,
    )
    add("fused(channelized_demodulate)", s_fused, S * T)

    s_fb = rows[0]["ms"] / 1e3
    s_dm = rows[1]["ms"] / 1e3
    print(json.dumps({
        "summary": {
            "S": S, "K": K, "channels": S * K, "mode": mode,
            "sum(fb+demod)_ms": round((s_fb + s_dm) * 1e3, 2),
            "fused_ms": round(s_fused * 1e3, 2),
            "fusion_overhead_pct": round(
                100.0 * (s_fused - s_fb - s_dm) / (s_fb + s_dm), 1
            ),
        }
    }))


if __name__ == "__main__":
    main()
