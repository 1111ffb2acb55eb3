"""Roofline accounting for the hot kernels (VERDICT r1 item 2).

For each kernel: analytic bytes-moved + FLOPs per call, measured time, and
the achieved fraction of the v5e HBM roofline (819 GB/s).  Timing method:
K data-chained dispatches with one readback at the end (each call's input
depends on the previous call's output, so nothing reorders), which
amortizes the ~24 ms tunnel RPC to 1/K per call.  fori_loop-in-jit was
abandoned: wrapping the Pallas kernels in a device loop sent the axon
remote-compile service into a >30-minute compile.

Run on the real chip: python tools/bench_roofline.py  (takes the axon
grant; ~10 min, compile-dominated).  --cpu smoke-runs tiny shapes.
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


def _timed_chain(step, reps: int) -> float:
    """step(carry) -> (readback_array, carry).  Chains `reps` dependent
    dispatches, reads back once; returns seconds per call."""
    out, carry = step(None)
    np.asarray(out)  # compile + warm
    out, carry = step(None)
    np.asarray(out)  # steady-state warm (first post-compile call is slow)
    t0 = time.perf_counter()
    carry = None
    for _ in range(reps):
        out, carry = step(carry)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from lora_tpu.config import LoRaConfig
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
        print(f"# done: {name}  {s_per_call*1e3:.3f} ms/call", flush=True)

    def r2(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    n1, n2 = (min(N, 128), max(1, N // 128))
    win_flops = 6 * (N * (n1 + n2) + 3 * N)  # dechirp+derotate+DFT per window

    # ---- fused payload kernel: roll+dechirp+derotate+DFT+peak -------------
    Rp = pd.payload_rows(N, cfg.mtu)
    M8 = Rp  # flat kernel computes every gathered row's window
    g = IQ(r2((B, Rp, N)), r2((B, Rp, N)))
    rs0 = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe0 = jnp.zeros(B, jnp.float32)
    jax.block_until_ready(g)

    def step_payload(carry, bf16=False):
        fe = fe0 if carry is None else carry
        v, p, n = pd.payload_detect(g, rs0, fe, cfg.mtu, interpret=interp,
                                    bf16=bf16)
        return v, 0.0 * p[:, 0] + fe0

    add("payload_detect (fused)", B * Rp * N * 8 + B * M8 * 12,
        B * M8 * win_flops, _timed_chain(step_payload, reps),
        B * cfg.mtu * N)
    add("payload_detect (fused, bf16)", B * Rp * N * 8 + B * M8 * 12,
        B * M8 * win_flops,
        _timed_chain(lambda c: step_payload(c, bf16=True), reps),
        B * cfg.mtu * N)

    # ---- direct payload kernel (gather-free: reads the [B, W, N] view) ----
    Wd = Rp + 19
    if pd.payload_direct_pc(N, cfg.mtu, Wd, B) is not None:
        x3 = IQ(r2((B, Wd, N)), r2((B, Wd, N)))
        q0 = jnp.asarray(rng.integers(0, Wd - Rp + 1, B), jnp.int32)
        jax.block_until_ready(x3)

        def step_direct(carry, bf16=False):
            fe = fe0 if carry is None else carry
            v, p, n = pd.payload_detect_direct(
                x3, q0, rs0, fe, cfg.mtu, interpret=interp, bf16=bf16
            )
            return v, 0.0 * p[:, 0] + fe0

        add("payload_detect_direct (gather-free)",
            B * Wd * N * 8 + B * M8 * 12, B * M8 * win_flops,
            _timed_chain(step_direct, reps), B * cfg.mtu * N)
        add("payload_detect_direct (gather-free, bf16)",
            B * Wd * N * 8 + B * M8 * 12, B * M8 * win_flops,
            _timed_chain(lambda c: step_direct(c, bf16=True), reps),
            B * cfg.mtu * N)

    # ---- fused track kernel (sync scan + CFO) -----------------------------
    xs = IQ(r2((B, pd.TRACK_ROWS, N)), r2((B, pd.TRACK_ROWS, N)))
    jax.block_until_ready(xs)

    def step_track(carry, bf16=False):
        rs = rs0 if carry is None else carry
        tr = pd.track(xs, rs, cfg.sync, cfg.thresh, interpret=interp,
                      bf16=bf16)
        return tr["freq_error"], (rs0 + 0 * tr["k_sync"]) % N

    n_det = 2 * pd.N_SCAN + 2
    add("track (sync scan+CFO)", B * pd.TRACK_ROWS * N * 8,
        B * n_det * win_flops, _timed_chain(step_track, reps),
        B * pd.N_TRACK_WIN * N)
    add("track (sync scan+CFO, bf16)", B * pd.TRACK_ROWS * N * 8,
        B * n_det * win_flops,
        _timed_chain(lambda c: step_track(c, bf16=True), reps),
        B * pd.N_TRACK_WIN * N)

    # ---- direct track kernel (gather-free: reads the [B, W, N] view) ------
    Wt = pd.TRACK_ROWS + 19
    if pd.track_direct_tc(N, Wt, B) is not None:
        xt3 = IQ(r2((B, Wt, N)), r2((B, Wt, N)))
        qt0 = jnp.asarray(
            rng.integers(0, Wt - pd.TRACK_ROWS + 1, B), jnp.int32
        )
        jax.block_until_ready(xt3)

        def step_track_direct(carry, bf16=False):
            rs = rs0 if carry is None else carry
            tr = pd.track_direct(
                xt3, qt0, rs, cfg.sync, cfg.thresh, interpret=interp,
                bf16=bf16,
            )
            return tr["freq_error"], (rs0 + 0 * tr["k_sync"]) % N

        add("track_direct (gather-free)", B * Wt * N * 8,
            B * n_det * win_flops, _timed_chain(step_track_direct, reps),
            B * pd.N_TRACK_WIN * N)
        add("track_direct (gather-free, bf16)", B * Wt * N * 8,
            B * n_det * win_flops,
            _timed_chain(lambda c: step_track_direct(c, bf16=True), reps),
            B * pd.N_TRACK_WIN * N)

    # ---- batched detector (dechirp+DFT+peak, no roll) ---------------------
    W = 64
    xw = IQ(r2((B, W, N)), r2((B, W, N)))
    few0 = jnp.zeros((B, W), jnp.float32)
    jax.block_until_ready(xw)

    def step_det(carry):
        few = few0 if carry is None else carry
        d = pdet.dechirp_detect_pallas(
            xw, ferr=few, interpret=interp, want_findex=False
        )
        return d.value, 0.0 * d.power + few0

    add("dechirp_detect (batched, +derotate)", B * W * N * 8 + B * W * 16,
        B * W * win_flops, _timed_chain(step_det, reps), B * W * N)

    # no-derotator variant: how the demod's coarse stage calls it (ferr
    # None skips 2N cos/sin per window on the VPU)
    def step_det_nf(carry):
        x = xw if carry is None else carry
        d = pdet.dechirp_detect_pallas(
            x, interpret=interp, want_findex=False
        )
        return d.value, IQ(xw.re + 0.0 * d.power[..., None], xw.im)

    add("dechirp_detect (batched, coarse mode)", B * W * N * 8 + B * W * 16,
        B * W * win_flops, _timed_chain(step_det_nf, reps), B * W * N)

    # ---- polyphase channelizer -------------------------------------------
    K, S = 64, (16 if on_tpu else 1)
    Tw = 1 << (21 if on_tpu else 14)
    xwide = IQ(r2((S, Tw)), r2((S, Tw)))
    jax.block_until_ready(xwide)

    @jax.jit
    def chz_step(x):
        y, _st = chz.channelize(x, K)
        return y.re[..., 0, 0:1], IQ(x.re + 0.0 * y.re[..., 0, 0:1], x.im)

    def step_chz(carry):
        x = xwide if carry is None else carry
        return chz_step(x)

    add("channelizer K=64", S * Tw * 8 * 2, S * Tw * (2 * 8 + 6 * K),
        _timed_chain(step_chz, reps), S * Tw)

    # ---- whole demod step (no tunnel overhead) ----------------------------
    T = required_samples(cfg)
    Bd = B if on_tpu else 2
    xd = IQ(r2((Bd, T)), r2((Bd, T)))
    jax.block_until_ready(xd)

    @jax.jit
    def demod_step(x):
        d = demodulate(x, cfg)
        return d.symbols, IQ(x.re + 0.0 * d.snr[:, None], x.im)

    def step_demod(carry):
        x = xd if carry is None else carry
        return demod_step(x)

    add("full demod step (on-chip)", Bd * T * 8, 0,
        _timed_chain(step_demod, max(2, reps // 2)), Bd * T)

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
