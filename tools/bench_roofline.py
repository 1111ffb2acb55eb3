"""Roofline accounting for the hot kernels (VERDICT r1 item 2).

For each kernel: analytic bytes-moved + FLOPs per call, measured time
(lax.fori_loop of reps inside ONE jit with a forced data dependence, so
the ~25 ms tunnel dispatch is amortized away), and the achieved fraction
of the v5e HBM roofline (819 GB/s).  Prints a markdown table for
docs/SCALING.md.

Run on the real chip: python tools/bench_roofline.py  (takes the axon
grant; ~2 min).  --cpu runs tiny shapes in interpret-free XLA for smoke.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0  # TPU v5e peak HBM bandwidth
BF16_TFLOPS = 197.0  # v5e MXU peak (bf16); f32 contractions run well below


def _timed(fn, reps: int) -> float:
    """Seconds per rep: fn must be a jitted callable returning arrays whose
    computation chains `reps` kernel invocations."""
    import jax

    out = fn()  # compile + warm
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])  # tunnel-safe readback
    dt = time.perf_counter() - t0
    return dt / reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lora_tpu.config import LoRaConfig
    from lora_tpu.ops import cplx
    from lora_tpu.ops.cplx import IQ
    from lora_tpu.ops import pallas_demod as pd
    from lora_tpu.ops import pallas_detect as pdet
    from lora_tpu.ops import channelizer as chz
    from lora_tpu.models.demodulator import demodulate, required_samples

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    reps = args.reps if on_tpu else 2

    # CPU smoke uses SF7 (full SF10 demod takes minutes to compile on CPU)
    cfg = LoRaConfig(sf=10 if on_tpu else 7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(32) + 4)
    N = cfg.N
    B = 2048 if on_tpu else 4
    rng = np.random.default_rng(0)

    rows = []

    def add(name, bytes_per, flops_per, s_per_call, samples_per):
        gbps = bytes_per / s_per_call / 1e9
        rows.append(
            {
                "kernel": name,
                "GB/call": bytes_per / 1e9,
                "GFLOP/call": flops_per / 1e9,
                "ms/call": s_per_call * 1e3,
                "Gsamp/s": samples_per / s_per_call / 1e9,
                "GB/s": gbps,
                "%HBM": 100.0 * gbps / HBM_GBPS,
                "TFLOP/s": flops_per / s_per_call / 1e12,
            }
        )

    def r2(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    # ---- fused payload kernel: roll+dechirp+derotate+DFT+peak -------------
    TWM, tiles, Rp = pd.payload_geometry(N, cfg.mtu)
    M8 = TWM * tiles
    g = IQ(r2((B, Rp, N)), r2((B, Rp, N)))
    rs0 = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe0 = jnp.asarray(rng.standard_normal(B), jnp.float32)

    @jax.jit
    def loop_payload():
        def body(_, carry):
            rs, fe = carry
            v, p, n = pd.payload_detect(g, rs, fe, cfg.mtu, interpret=interp)
            return rs, 0.0 * p[:, 0] + fe0
        return lax.fori_loop(0, reps, body, (rs0, fe0))

    n1, n2 = (min(N, 128), max(1, N // 128))
    payload_bytes = B * Rp * N * 8 + B * M8 * 12
    # cmul=6 flops: dechirp N + derotate N + DFT (N*n1 + N + N*n2) per window
    payload_flops = B * M8 * 6 * (N * (n1 + n2) + 3 * N)
    add("payload_detect (fused)", payload_bytes, payload_flops,
        _timed(loop_payload, reps), B * cfg.mtu * N)

    # ---- fused track kernel (sync scan + CFO) -----------------------------
    xs = IQ(r2((B, pd.TRACK_ROWS, N)), r2((B, pd.TRACK_ROWS, N)))

    @jax.jit
    def loop_track():
        def body(_, carry):
            rs, acc = carry
            tr = pd.track(xs, rs, cfg.sync, cfg.thresh, interpret=interp)
            return (rs + 0 * tr["k_sync"]) % N, acc + tr["freq_error"]
        return lax.fori_loop(0, reps, body, (rs0, jnp.zeros(B, jnp.int32)))

    track_bytes = B * pd.TRACK_ROWS * N * 8
    track_flops = B * (pd.N_SCAN * 2 + 4) * 6 * (N * (n1 + n2) + 3 * N)
    add("track (sync scan+CFO)", track_bytes, track_flops,
        _timed(loop_track, reps), B * pd.N_TRACK_WIN * N)

    # ---- batched detector (dechirp+DFT+peak, no roll) ---------------------
    W = 64
    xw = IQ(r2((B, W, N)), r2((B, W, N)))
    few = jnp.zeros((B, W), jnp.float32)

    @jax.jit
    def loop_det():
        def body(_, x):
            d = pdet.dechirp_detect_pallas(
                x, ferr=few, interpret=interp, want_findex=False
            )
            return IQ(x.re + 0.0 * d.power[..., None], x.im)
        return lax.fori_loop(0, reps, body, xw)

    det_bytes = B * W * N * 8 + B * W * 16
    det_flops = B * W * 6 * (N * (n1 + n2) + 3 * N)
    add("dechirp_detect (batched)", det_bytes, det_flops,
        _timed(loop_det, reps), B * W * N)

    # ---- polyphase channelizer -------------------------------------------
    K, S = 64, (16 if on_tpu else 1)
    Tw = 1 << (21 if on_tpu else 14)
    xwide = IQ(r2((S, Tw)), r2((S, Tw)))

    @jax.jit
    def loop_chz():
        def body(_, x):
            y, _st = chz.channelize(x, K)
            return IQ(
                x.re + 0.0 * y.re[..., 0, 0:1], x.im
            )
        return lax.fori_loop(0, reps, body, xwide)

    chz_bytes = S * Tw * 8 * 2  # read wideband + write all channels
    chz_flops = S * Tw * (2 * 8 + 6 * K)  # L-tap FIR + K-point IDFT matmul
    add("channelizer K=64", chz_bytes, chz_flops,
        _timed(loop_chz, reps), S * Tw)

    # ---- whole demod step (no tunnel overhead) ----------------------------
    T = required_samples(cfg)
    Bd = B if on_tpu else 2
    xd = IQ(r2((Bd, T)), r2((Bd, T)))
    dreps = max(2, reps // 3)

    @jax.jit
    def loop_demod():
        def body(_, x):
            d = demodulate(x, cfg)
            return IQ(x.re + 0.0 * d.snr[:, None], x.im)
        return lax.fori_loop(0, dreps, body, xd)

    demod_bytes = Bd * T * 8  # input read; intermediates counted separately
    add("full demod step (on-chip)", demod_bytes, 0,
        _timed(loop_demod, dreps), Bd * T)

    hdr = ("kernel", "GB/call", "GFLOP/call", "ms/call", "Gsamp/s", "GB/s",
           "%HBM", "TFLOP/s")
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print(
            f"| {r['kernel']} | {r['GB/call']:.3f} | {r['GFLOP/call']:.1f} | "
            f"{r['ms/call']:.3f} | {r['Gsamp/s']:.2f} | {r['GB/s']:.0f} | "
            f"{r['%HBM']:.0f}% | {r['TFLOP/s']:.1f} |"
        )
    print(
        f"\npeaks: HBM {HBM_GBPS:.0f} GB/s; MXU bf16 {BF16_TFLOPS:.0f} "
        "TFLOP/s (f32 contractions run far below bf16 peak)."
    )


if __name__ == "__main__":
    main()
