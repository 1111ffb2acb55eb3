"""On-chip kernel-geometry tuning sweeps for the fused demod kernels.

Run on real TPU hardware (takes the axon grant).  Sweeps the static
geometry knobs that interpret-mode tests cannot measure:

  * track-kernel channels/cell (TC) at small and large N — swept at
    N=128/1024 (round 3) and N=2048/4096 (round 5, --bigN, post
    roll-free): no consistent cross-mode winner beyond the baked caps
    (ops/pallas_demod._track_tc carries the record).
  * flat payload kernel block budget (_FLAT_MAX -> channels/cell PC).
  * bf16 MXU casts vs f32 for both kernels.

Prints one json line per measurement; pick winners and bake them into
_track_tc / _FLAT_MAX.

Usage: python tools/tune_kernels.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lora_tpu.ops import cplx, pallas_demod as pd
from lora_tpu.ops.cplx import IQ


def _timed(fn, args, reps=8):
    """Seconds/call by CHAINED dispatch: each call's input is perturbed by
    a zero derived from the previous output, so `reps` dependent programs
    queue on the device and ONE readback awaits them all.  (The former
    readback-per-call form floored every sub-25 ms kernel at the tunnel's
    fixed RPC cost, making small-cell sweeps indistinguishable.)  args[0]
    must be the IQ operand."""
    xs, rest = args[0], args[1:]
    f = jax.jit(lambda eps, x, *r: fn(IQ(x.re + eps, x.im), *r))

    def scalar(out):
        leaf = jax.tree.leaves(out)[0]
        return (leaf.ravel()[0] * 0).astype(jnp.float32)

    out = f(jnp.float32(0.0), xs, *rest)  # compile + settle
    eps = scalar(out)
    np.asarray(eps)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(eps, xs, *rest)
        eps = scalar(out)
    np.asarray(eps)
    return (time.perf_counter() - t0) / reps


def sweep_track(N: int, B: int, tcs, bf16=False):
    rng = np.random.default_rng(0)
    r2 = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    xs = IQ(r2((B, pd.TRACK_ROWS, N)), r2((B, pd.TRACK_ROWS, N)))
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    jax.block_until_ready(xs)
    base = None
    for tc in tcs:
        if tc % 8 or B % tc:
            continue
        orig = pd._track_tc
        pd._track_tc = lambda n, _tc=tc: _tc
        try:
            fresh = jax.jit(
                pd._track_flat.__wrapped__,
                static_argnames=("sync0", "sync1", "thresh", "interpret",
                                 "bf16"),
            )
            s = _timed(
                lambda a, b: fresh(a, b, 0x9, 0x3, -180.0, False, bf16),
                (xs, rs),
            )
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(json.dumps({"kernel": "track", "N": N, "B": B, "TC": tc,
                              "bf16": bf16, "error": repr(e)[:200]}),
                  flush=True)
            continue
        finally:
            pd._track_tc = orig
        if base is None:
            base = s
        print(json.dumps({
            "kernel": "track", "N": N, "B": B, "TC": tc, "bf16": bf16,
            "ms": round(s * 1e3, 3), "vs_first": round(base / s, 2),
        }), flush=True)


def sweep_payload(N: int, B: int, mtu: int, flat_maxes, bf16=False):
    rng = np.random.default_rng(0)
    rp = 8 * (mtu // 8 + 1)
    r2 = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    g = IQ(r2((B, rp, N)), r2((B, rp, N)))
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe = jnp.zeros(B, jnp.float32)
    jax.block_until_ready(g)
    base = None
    for fm in flat_maxes:
        pc = max(1, min(1024 // rp, fm // (rp * N)))
        if pc * rp * N * 16 > 100 * 1024 * 1024:
            continue
        orig = pd.payload_flat_geometry
        pd.payload_flat_geometry = functools.lru_cache(maxsize=None)(
            lambda n, m, _rp=rp, _pc=pc: (_rp, _pc)
        )
        try:
            fresh = jax.jit(
                pd._payload_flat_pc.__wrapped__,
                static_argnames=("mtu", "interpret", "bf16"),
            )
            s = _timed(
                lambda a, b, c: fresh(a, b, c, mtu, False, bf16),
                (g, rs, fe),
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": "payload", "N": N, "B": B,
                              "PC": pc, "bf16": bf16,
                              "error": repr(e)[:200]}), flush=True)
            continue
        finally:
            pd.payload_flat_geometry = orig
        if base is None:
            base = s
        gsps = B * mtu * N / s / 1e9
        print(json.dumps({
            "kernel": "payload", "N": N, "B": B, "mtu": mtu, "PC": pc,
            "flat_max_kb": fm // 1024, "bf16": bf16,
            "ms": round(s * 1e3, 3), "Gsamp/s": round(gsps, 2),
            "vs_first": round(base / s, 2),
        }), flush=True)


def sweep_payload_direct(N: int, B: int, mtu: int, pcs, bf16=False):
    """Channels/cell for the gather-free direct payload kernel (the
    (8<<20) input-block budget in payload_direct_pc is a guess; this
    measures the real PC optimum, incl. the scalar-prefetch + dynamic
    sublane-slice path the other fused kernels avoid)."""
    rng = np.random.default_rng(0)
    rp = 8 * (mtu // 8 + 1)
    W = rp + 19
    r2 = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x3 = IQ(r2((B, W, N)), r2((B, W, N)))
    q = jnp.asarray(rng.integers(0, W - rp + 1, B), jnp.int32)
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe = jnp.zeros(B, jnp.float32)
    jax.block_until_ready(x3)
    base = None
    for pc in pcs:
        if B % pc or pc * rp > 4096 or pc * rp * N * 16 > 100 * (1 << 20):
            continue
        orig = pd.payload_direct_pc
        pd.payload_direct_pc = functools.lru_cache(maxsize=None)(
            lambda n, m, w, b, _pc=pc: _pc
        )
        try:
            fresh = jax.jit(
                pd._payload_direct.__wrapped__,
                static_argnames=("mtu", "interpret", "bf16"),
            )
            s = _timed(
                lambda a, b_, c, d: fresh(a, b_, c, d, mtu, False, bf16),
                (x3, q, rs, fe),
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": "payload_direct", "N": N, "B": B,
                              "PC": pc, "bf16": bf16,
                              "error": repr(e)[:200]}), flush=True)
            continue
        finally:
            pd.payload_direct_pc = orig
        if base is None:
            base = s
        gsps = B * mtu * N / s / 1e9
        print(json.dumps({
            "kernel": "payload_direct", "N": N, "B": B, "mtu": mtu,
            "PC": pc, "bf16": bf16,
            "ms": round(s * 1e3, 3), "Gsamp/s": round(gsps, 2),
            "vs_first": round(base / s, 2),
        }), flush=True)


def sweep_track_direct(N: int, B: int, tcs, bf16=False):
    """Channels/cell for the gather-free direct track kernel (same
    scalar-prefetch + dynamic sublane-slice pattern as payload_direct;
    the 12 MB input-block budget in track_direct_tc is a guess)."""
    rng = np.random.default_rng(0)
    R = pd.TRACK_ROWS
    W = R + 19
    r2 = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x3 = IQ(r2((B, W, N)), r2((B, W, N)))
    q = jnp.asarray(rng.integers(0, W - R + 1, B), jnp.int32)
    rs = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    jax.block_until_ready(x3)
    base = None
    for tc in tcs:
        if B % tc or tc % 8 or tc * W * N * 16 > 100 * (1 << 20):
            continue
        orig = pd.track_direct_tc
        pd.track_direct_tc = lambda n, w, b, _tc=tc: _tc
        try:
            fresh = jax.jit(
                pd._track_direct.__wrapped__,
                static_argnames=(
                    "sync0", "sync1", "thresh", "interpret", "bf16"
                ),
            )
            s = _timed(
                lambda a, b_, c: fresh(a, b_, c, 3, 4, -12.0, False, bf16),
                (x3, q, rs),
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": "track_direct", "N": N, "B": B,
                              "TC": tc, "bf16": bf16,
                              "error": repr(e)[:200]}), flush=True)
            continue
        finally:
            pd.track_direct_tc = orig
        if base is None:
            base = s
        gsps = B * (pd.N_SCAN + 4) * N / s / 1e9
        print(json.dumps({
            "kernel": "track_direct", "N": N, "B": B, "TC": tc,
            "bf16": bf16,
            "ms": round(s * 1e3, 3), "Gsamp/s": round(gsps, 2),
            "vs_first": round(base / s, 2),
        }), flush=True)


def sweep_channelizer(K: int, T: int, S: int, groups):
    """Group width G for the block-Toeplitz filterbank contraction
    (ops/channelizer.channelize): S wideband streams of T samples."""
    from lora_tpu.ops import channelizer as chz

    rng = np.random.default_rng(0)
    r2 = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    wb = IQ(r2((S, T)), r2((S, T)))
    jax.block_until_ready(wb)
    base = None

    def row(tag, fn):
        nonlocal base
        try:
            s = _timed(lambda x: fn(x), (wb,))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": "channelizer", "K": K, "cfg": tag,
                              "error": repr(e)[:200]}), flush=True)
            return
        if base is None:
            base = s
        print(json.dumps({
            "kernel": "channelizer", "K": K, "T": T, "S": S, "cfg": tag,
            "ms": round(s * 1e3, 3),
            "Mwide-samp/s": round(S * T / s / 1e6, 1),
            "vs_first": round(base / s, 2),
        }), flush=True)

    for g in groups:
        if (T // K) % g:
            continue
        row(f"xla-G{g}", jax.jit(
            lambda x, _g=g: chz.channelize(x, K, group=_g, impl="xla")[0]
        ))
    # the fused Pallas filterbanks (ops/pallas_channelize): dense
    # block-Toeplitz and the factorized FIR+IDFT form, f32 and bf16
    from lora_tpu.ops.pallas_channelize import fir_geometry, kernel_geometry
    if kernel_geometry(K, 8) is not None:
        row("pallas-f32", jax.jit(
            lambda x: chz.channelize(x, K, impl="pallas")[0]
        ))
        row("pallas-bf16", jax.jit(
            lambda x: chz.channelize(x, K, impl="pallas", bf16=True)[0]
        ))
    if fir_geometry(K, 8):
        row("fir-f32", jax.jit(
            lambda x: chz.channelize(x, K, impl="fir")[0]
        ))
        row("fir-bf16", jax.jit(
            lambda x: chz.channelize(x, K, impl="fir", bf16=True)[0]
        ))


def sweep_detect(N: int, M: int, tws, bf16=False):
    """Windows/grid-cell TW for the batched coarse detector
    (ops/pallas_detect._tile_windows): M flat [N] windows, coarse-mode
    call shape (no derotator, no findex) — the config-3 demod bank's
    dominant stage at SF7."""
    from lora_tpu.ops import pallas_detect as pdet

    rng = np.random.default_rng(0)
    r2 = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    x = IQ(r2((M, N)), r2((M, N)))
    jax.block_until_ready(x)
    base = None
    for tw in tws:
        if M % tw:
            continue
        try:
            s = _timed(lambda xx, _tw=tw: pdet.dechirp_detect_pallas(
                xx, want_findex=False, bf16=bf16, tw=_tw
            ).value, (x,))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": "detect", "N": N, "TW": tw,
                              "bf16": bf16, "error": repr(e)[:200]}),
                  flush=True)
            continue
        if base is None:
            base = s
        print(json.dumps({
            "kernel": "detect", "N": N, "M": M, "TW": tw, "bf16": bf16,
            "ms": round(s * 1e3, 3),
            "Gsamp/s": round(M * N / s / 1e9, 2),
            "vs_first": round(base / s, 2),
        }), flush=True)


def crash_retest(N: int, B: int):
    """The round-2 kernels crashed the TPU worker at N >= 2048 & B > ~96;
    the round-3 restructuring (8-aligned sublane slices, remainder barrel
    rolls) passed 18/18 trials and the dispatch gate was removed
    (models/demodulator.demodulate dispatch note).  Keep running this
    retest every runbook: a recurrence means re-gating."""
    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models import demodulator as dm
    from lora_tpu.models.demodulator import required_samples

    sf = int(np.log2(N))
    cfg = LoRaConfig(sf=sf, cr="4/8", ampl=1.0, mtu=24)
    T = required_samples(cfg)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 256, (B, 6), dtype=np.uint8))
    iq = api.modulate(api.encode(payload, cfg), cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, T - iq.shape[-1]))))[:, :T]
    for trial in range(3):
        # call the inner program directly so the retest stays meaningful
        # even if the dispatch gate is ever reinstated
        d = dm._demod_whole(
            iq, cfg, False, 1, "bf16" if trial == 2 else "auto"
        )
        found = np.asarray(d.found)
        print(json.dumps({
            "crash_retest": {"N": N, "B": B, "trial": trial,
                             "found": int(found.sum()), "of": B},
        }), flush=True)
        assert found.all(), "demod must find every clean frame"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--crash-retest", action="store_true",
                    help="only run the N>=2048 stability retest")
    ap.add_argument("--detect", action="store_true",
                    help="only run the coarse-detector TW sweep")
    ap.add_argument("--N", type=int, default=0,
                    help="restrict --detect to one N (128 or 1024)")
    ap.add_argument("--config3", action="store_true",
                    help="only sweep the config-3 payload_direct geometry")
    ap.add_argument("--bigN", action="store_true",
                    help="TC/PC/TW sweeps at N=2048/4096 (the round-4 "
                         "verdict's post-roll-free re-tune; clears the "
                         "_track_tc TODO)")
    ap.add_argument("--channelizer", action="store_true",
                    help="only run the channelizer sweep (incl. the "
                         "FIR+IDFT kernel rows)")
    ap.add_argument("--pcs", type=int, nargs="*", default=(),
                    help="PC values for --config3 (default 8 16 32 64)")
    ap.add_argument("--bf16", type=int, default=-1,
                    help="--config3: 0=f32 only, 1=bf16 only, -1=both")
    args = ap.parse_args()

    if args.detect:
        M = 1 << (17 if args.quick else 19)  # ~8192 ch x 64 win at SF7
        for bf16 in (False, True):
            if args.N in (0, 128):
                sweep_detect(128, M, (64, 128, 256, 512, 1024), bf16)
            if args.N in (0, 1024):
                sweep_detect(1024, M >> 3, (32, 64, 128, 256), bf16)
        return

    if args.config3:
        # config-3 demod-bank geometry: SF7, 8192 channels, mtu=50
        pcs = tuple(args.pcs) or (8, 16, 32, 64)
        for bf16 in ((False, True) if args.bf16 < 0 else (bool(args.bf16),)):
            sweep_payload_direct(128, 8192, 50, pcs, bf16)
        return

    if args.bigN:
        # SF11/SF12 geometries (mtu = num_symbols(32) + 4 = 60); the
        # roll-free rework deleted the barrel shifter whose VPU cost set
        # the old TC caps, so the N >= 2048 optima may have moved
        B = 512 if args.quick else 1024
        for bf16 in (False, True):
            sweep_track(2048, B, (8, 16, 24, 32), bf16)
            sweep_track(4096, B // 2, (8, 16, 24, 32), bf16)
        for bf16 in (False, True):
            sweep_payload(2048, B, 60, (1 << 18, 1 << 19, 1 << 20), bf16)
            sweep_payload(4096, B // 2, 60, (1 << 17, 1 << 18), bf16)
        for bf16 in (False, True):
            sweep_detect(2048, 1 << 14, (16, 32, 64, 128), bf16)
            sweep_detect(4096, 1 << 13, (8, 16, 32, 64), bf16)
        return

    if args.channelizer:
        sweep_channelizer(64, 1 << 20, 16 if args.quick else 64,
                          (1, 2, 4, 8, 16, 32, 64))
        return

    if args.crash_retest:
        for N, B in ((2048, 128), (2048, 512), (4096, 128),
                     (4096, 256), (2048, 2048), (4096, 512)):
            crash_retest(N, B)
        return

    B = 1024 if args.quick else 4096
    for bf16 in (False, True):
        sweep_track(128, B, (8, 16, 32, 64, 128), bf16)
        sweep_track(1024, B, (8, 16, 24, 32), bf16)
    for bf16 in (False, True):
        sweep_payload(128, B, 20, (1 << 16, 1 << 17, 1 << 18, 1 << 19), bf16)
        sweep_payload(1024, B, 44, (1 << 17, 1 << 18, 1 << 19, 1 << 20), bf16)
    for bf16 in (False, True):
        sweep_payload_direct(128, B, 20, (1, 2, 4, 8, 16), bf16)
        sweep_payload_direct(1024, B, 44, (1, 2, 4, 8), bf16)
    for bf16 in (False, True):
        sweep_track_direct(128, B, (8, 16, 32, 64), bf16)
        sweep_track_direct(1024, B, (8, 16, 24, 32), bf16)
    sweep_channelizer(64, 1 << 20, 16 if args.quick else 64,
                      (1, 2, 4, 8, 16, 32, 64))


if __name__ == "__main__":
    main()
