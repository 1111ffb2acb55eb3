"""Config-5 measured end-to-end: wire-format ingest -> slab -> demod ->
decode, sustained (VERDICT r3 item 4 — replace the "would sustain"
extrapolation with a measured run).

Pipeline under test (one real chip):

  ingest thread: cs16 wire bytes --native iq_convert / passthrough-->
                 bounded queue (depth 2)
  device thread: H2D -> ONE jit program (demodulate + decode) ->
                 readback of the compact outputs (found/status/length)

Three transfer modes:
  --host-convert   convert cs16 -> planar f32 on the HOST (native
                   libiqio), ship f32 (8 B/sample over the link)
  --interleaved    ship the raw interleaved int16 wire block and
                   deinterleave ON DEVICE (4 B/sample, but the strided
                   int16 deinterleave is a costly TPU relayout —
                   measured 434 Msamp/s compute-only vs ~3 G without)
  (default)        host deinterleaves cs16 -> PLANAR int16 (a cheap
                   numpy stride copy on the ingest thread), device does
                   only cast+scale (4 B/sample on the link, no device
                   relayout — best of both)

Reported:
  * measured aggregate Msamp/s end-to-end (wall), frames recovered
  * => measured N x 500 kHz real-time channels AT THE DEV-TUNNEL LINK RATE
  * on-device compute-only rate (chained dispatches, resident input)
  * clearly-labeled PCIe v4 x16 projection: what the same pipeline
    sustains when the link is a real host PCIe attach instead of the
    ~30 MB/s dev tunnel: min(compute rate, 16 GB/s / bytes-per-sample)

Reference analogue: none — the reference ingests ONE stream per process
at BW x ovs <= 0.5 Msamp/s (LoRaMod.cpp:29-31); this measures how many
such modems one chip replaces through a real ingest path.

Run: python tools/bench_e2e.py [--channels 10240] [--slab 2048]
     (CPU smoke: --cpu --channels 8 --slab 4)
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PCIE_GBPS = 16.0  # PCIe v4 x16 sustained, the projection's labeled link


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--channels", type=int, default=10240)
    ap.add_argument("--slab", type=int, default=2048)
    ap.add_argument("--host-convert", action="store_true",
                    help="convert on host, ship planar f32")
    ap.add_argument("--interleaved", action="store_true",
                    help="ship raw interleaved wire, deinterleave on device")
    ap.add_argument("--payload", type=int, default=32)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.decoder import OK
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import cplx
    from lora_tpu.runtime import iqio

    cfg = LoRaConfig(sf=10, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(args.payload) + 4)
    T = required_samples(cfg)
    B, slab = args.channels, args.slab
    n_slabs = -(-B // slab)
    rng = np.random.default_rng(0)

    # ---- one slab of wire-format capture, reused for every slab ----------
    # (a fresh 10k-channel noise bank blew the host-RNG budget in round 3;
    # the device work is identical per slab either way)
    payload = rng.integers(0, 256, (slab, args.payload), dtype=np.uint8)
    iq = api.modulate(api.encode(jnp.asarray(payload), cfg), cfg)
    re = np.asarray(iq.re)[:, :T]
    im = np.asarray(iq.im)[:, :T]
    if re.shape[1] < T:
        re = np.pad(re, ((0, 0), (0, T - re.shape[1])))
        im = np.pad(im, ((0, 0), (0, T - im.shape[1])))
    re = re + 0.05 * rng.standard_normal(re.shape, dtype=np.float32)
    im = im + 0.05 * rng.standard_normal(im.shape, dtype=np.float32)
    # quantize to the cs16 wire format (SoapySDR CS16, hw/capture.py)
    wire = np.empty((slab, 2 * T), np.int16)
    wire[:, 0::2] = np.clip(re * 8192.0, -32768, 32767).astype(np.int16)
    wire[:, 1::2] = np.clip(im * 8192.0, -32768, 32767).astype(np.int16)
    scale = np.float32(1.0 / 8192.0)
    del re, im

    if args.host_convert:
        mode = "host-convert/f32"
    elif args.interleaved:
        mode = "device-deinterleave/int16"
    else:
        mode = "planar-int16"

    # ---- the device program: (convert +) demod + decode in ONE dispatch --
    @jax.jit
    def step_wire(w16):
        # interleaved wire: the strided int16 deinterleave is a costly
        # TPU relayout (measured 434 Msamp/s compute-only at SF10/B=2048
        # vs multi-G without) — kept as the --interleaved comparison mode
        x = w16.astype(jnp.float32) * scale
        xb = cplx.IQ(x[:, 0::2], x[:, 1::2])
        dem = api.demodulate(xb, cfg)
        dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
        return dem.found, dec.status, dec.length

    @jax.jit
    def step_planar16(r16, i16):
        xb = cplx.IQ(r16.astype(jnp.float32) * scale,
                     i16.astype(jnp.float32) * scale)
        dem = api.demodulate(xb, cfg)
        dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
        return dem.found, dec.status, dec.length

    @jax.jit
    def step_f32(r, i):
        dem = api.demodulate(cplx.IQ(r, i), cfg)
        dec = api.decode(dem.symbols.astype(jnp.int32), cfg)
        return dem.found, dec.status, dec.length

    def host_blocks():
        """One slab's queue payload, converted per `mode` (timed)."""
        t0 = time.perf_counter()
        if args.host_convert:
            r, i = iqio.convert(wire.reshape(-1), "cs16", float(scale))
            blk = (r.reshape(slab, T), i.reshape(slab, T))
        elif args.interleaved:
            blk = wire
        else:  # planar int16: a cheap strided numpy copy on the host
            blk = (np.ascontiguousarray(wire[:, 0::2]),
                   np.ascontiguousarray(wire[:, 1::2]))
        t_convert[0] += time.perf_counter() - t0
        return blk

    def dispatch(blk):
        if args.host_convert:
            return step_f32(jnp.asarray(blk[0]), jnp.asarray(blk[1]))
        if args.interleaved:
            return step_wire(jnp.asarray(blk))
        return step_planar16(jnp.asarray(blk[0]), jnp.asarray(blk[1]))

    # compile + device warmup outside the timed region
    t_convert = [0.0]
    blk0 = host_blocks()
    out = dispatch(blk0)
    np.asarray(out[0])
    t_convert[0] = 0.0

    # ---- ingest thread ----------------------------------------------------
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def ingest():
        for _ in range(n_slabs):
            q.put(host_blocks())
        q.put(None)

    # ---- timed end-to-end run ----------------------------------------------
    found_total = ok_total = 0
    t0 = time.perf_counter()
    threading.Thread(target=ingest, daemon=True).start()
    pending = None
    while True:
        blk = q.get()
        if blk is None:
            break
        out = dispatch(blk)
        if pending is not None:  # depth-1 pipeline: overlap readback
            found_total += int(np.asarray(pending[0]).sum())
            ok_total += int((np.asarray(pending[1]) == OK).sum())
        pending = out
    found_total += int(np.asarray(pending[0]).sum())
    ok_total += int((np.asarray(pending[1]) == OK).sum())
    dt = time.perf_counter() - t0

    samples = n_slabs * slab * T
    rate_e2e = samples / dt / 1e6
    n_rt = rate_e2e * 1e6 / 0.5e6

    # ---- compute-only rate (resident input, chained dispatches) -----------
    # everything per rep lives inside ONE jit (returning the next eps as a
    # device scalar): eager big-array adds cost ~600 ms/rep on this
    # backend, and even eager scalar derivations pay remote eager-op
    # compiles — both swamped earlier versions of this number
    if args.interleaved:
        wdev = jnp.asarray(wire)

        @jax.jit
        def stepc(e):
            out = step_wire(wdev + e)
            return out[0], (out[2].ravel()[0] * 0).astype(jnp.int16)

        eps0 = jnp.int16(0)
    elif args.host_convert:
        rd = jnp.asarray(blk0[0])
        idv = jnp.asarray(blk0[1])

        @jax.jit
        def stepc(e):
            out = step_f32(rd + e, idv)
            return out[0], (out[2].ravel()[0] * 0).astype(jnp.float32)

        eps0 = jnp.float32(0)
    else:
        rd = jnp.asarray(blk0[0])
        idv = jnp.asarray(blk0[1])

        @jax.jit
        def stepc(e):
            out = step_planar16(rd + e, idv)
            return out[0], (out[2].ravel()[0] * 0).astype(jnp.int16)

        eps0 = jnp.int16(0)
    out, eps = stepc(eps0)
    np.asarray(out)
    reps = 4
    tc0 = time.perf_counter()
    for _ in range(reps):
        out, eps = stepc(eps)
    np.asarray(out)
    dt_c = (time.perf_counter() - tc0) / reps
    rate_c = slab * T / dt_c / 1e6

    bps = 8 if args.host_convert else 4  # link bytes per complex sample
    rate_pcie = min(rate_c, PCIE_GBPS * 1e3 / bps)
    rec = {
        "bench": "config5_e2e",
        "channels": B, "slab": slab, "slabs": n_slabs, "T": T,
        "mode": mode,
        "measured_Msamp_s": round(rate_e2e, 1),
        "measured_rt_channels_500kHz": round(n_rt, 1),
        "frames_found": found_total, "frames_decoded_ok": ok_total,
        "of": n_slabs * slab,
        "wall_s": round(dt, 1),
        "convert_host_s": round(t_convert[0], 2),
        "compute_only_Msamp_s_per_slab": round(rate_c, 1),
        "link_bytes_per_sample": bps,
        "pcie16GBs_projection_Msamp_s": round(rate_pcie, 1),
        "pcie16GBs_projection_rt_channels": round(rate_pcie * 2, 1),
        "note": "measured_* is end-to-end through the dev tunnel; the "
                "pcie projection is labeled, not measured",
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
