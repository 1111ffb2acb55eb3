"""Sustained-ingest microbenchmark for the streaming runtime (VERDICT r1
item 5): ring-buffer feed() throughput vs the round-1 concatenate design,
and pump() (ingest overlapped with the dispatched device step) vs the
serial feed/run loop.

Usage:  python tools/bench_stream.py [--tpu]
The host-side numbers are platform-independent; --tpu additionally times
the pipelined stream loop on the real chip (takes the axon grant).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_ingest() -> None:
    from lora_tpu.runtime.stream import _Ring

    B, chunk, total = 64, 8192, 1 << 24
    re = np.random.default_rng(0).standard_normal((B, chunk)).astype(np.float32)
    im = re.copy()

    # ring: consumer keeps up (steady state: no growth, O(chunk) writes)
    ring = _Ring(B, 4 * chunk)
    t0 = time.perf_counter()
    fed = 0
    while fed < total:
        ring.append(re, im)
        ring.trim(ring.end - chunk)  # consumer keeps up
        fed += chunk
    dt_ring = time.perf_counter() - t0

    # round-1 design: np.concatenate per feed + slice trim
    bre = np.zeros((B, 0), np.float32)
    bim = np.zeros((B, 0), np.float32)
    t0 = time.perf_counter()
    fed = 0
    while fed < total:
        bre = np.concatenate([bre, re], axis=1)
        bim = np.concatenate([bim, im], axis=1)
        if bre.shape[1] > 4 * chunk:
            bre = bre[:, -4 * chunk :]
            bim = bim[:, -4 * chunk :]
        fed += chunk
    dt_cat = time.perf_counter() - t0

    rate = B * total / dt_ring / 1e6
    print(
        f"ring ingest : {rate:9.1f} Msamp/s  ({dt_ring*1e3:7.1f} ms for "
        f"{B}x{total>>20}M samples)"
    )
    print(
        f"concatenate : {B * total / dt_cat / 1e6:9.1f} Msamp/s  "
        f"({dt_cat*1e3:7.1f} ms)   -> ring is {dt_cat/dt_ring:.1f}x"
    )


def bench_pump(B_arg: int = 0, sf_arg: int = 0) -> None:
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.ops import cplx
    from lora_tpu.runtime import StreamDemodulator

    import jax

    on_tpu = jax.default_backend() == "tpu"
    # CPU smoke keeps compile time sane (SF7); the TPU run defaults to
    # the flagship SF10 point — override --B/--sf to pick a step size
    # whose H2D does not drown in the dev tunnel's bandwidth variance
    # (B=256 x SF10 ships ~25 MB/step through a 30 MB/s - 1 GB/s link)
    cfg = LoRaConfig(sf=sf_arg or (10 if on_tpu else 7), cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(16) + 2)
    B = B_arg or (256 if on_tpu else 16)
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 256, (B, 16), dtype=np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(payload), cfg), cfg)
    frame = np.stack([np.asarray(iq.re), np.asarray(iq.im)], 0)
    n_frames, gap = 6, 3000
    FL = frame.shape[-1]
    T = n_frames * (FL + gap) + 8 * cfg.N
    bank = np.zeros((2, B, T), np.float32)
    for i in range(n_frames):
        o = i * (FL + gap)
        bank[:, :, o : o + FL] = frame
    bank += 0.05 * rng.standard_normal(bank.shape).astype(np.float32)

    chunkn = 1 << 16
    # the realistic ingest source is WIRE format (SoapySDR CF32: one
    # interleaved complex64 block per read) — feed() pays the
    # de-interleave + cast, which is exactly what pump()'s ingest thread
    # hides under the device step.  The planar-IQ source (conversion-free
    # ingest) is kept for attribution.
    wire = (bank[0] + 1j * bank[1]).astype(np.complex64)

    def blocks_planar():
        from lora_tpu.ops.cplx import IQ

        for i in range(0, T, chunkn):
            yield IQ(bank[0, :, i : i + chunkn], bank[1, :, i : i + chunkn])

    def blocks_wire():
        for i in range(0, T, chunkn):
            yield wire[:, i : i + chunkn]

    def serial(blocks):
        sd = StreamDemodulator(cfg, channels=B)
        out = []
        for blk in blocks():
            sd.feed(blk)
            out.extend(sd.run())
        return out

    def pipelined(blocks):
        sd = StreamDemodulator(cfg, channels=B)
        return list(sd.pump(blocks()))

    for src_name, blocks in (("wire cf32", blocks_wire),
                             ("planar IQ", blocks_planar)):
        base = None
        for name, fn in (("serial feed/run", serial),
                         ("pump (pipelined)", pipelined)):
            fn(blocks)  # warmup/compile
            t0 = time.perf_counter()
            frames = fn(blocks)
            dt = time.perf_counter() - t0
            rate = B * T / dt / 1e6
            if base is None:
                base = dt
            print(
                f"{src_name} {name:17s}: {rate:8.1f} Msamp/s  "
                f"({len(frames)} frames, {dt*1e3:6.1f} ms, "
                f"{base/dt:.2f}x vs serial)"
            )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--B", type=int, default=0)
    ap.add_argument("--sf", type=int, default=0)
    ap.add_argument("--skip-ingest", action="store_true")
    args = ap.parse_args()
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.skip_ingest:
        bench_ingest()
    bench_pump(args.B, args.sf)
