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
    ap.add_argument("--minutes", type=float, default=0.0,
                    help="sustained mode: keep cycling slabs until this "
                         "many minutes of wall clock (leak/drift check); "
                         "0 = one pass over --channels")
    ap.add_argument("--mixed-sf", action="store_true",
                    help="two expert groups (SF10 + SF8), slabs routed "
                         "round-robin to per-config compiled programs — "
                         "the ChannelDispatcher group pattern at slab "
                         "scale")
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

    B, slab = args.channels, args.slab
    n_slabs = -(-B // slab)
    rng = np.random.default_rng(0)
    scale = np.float32(1.0 / 8192.0)

    def make_group(sf: int) -> dict:
        """Per-config group state: wire bank + T + cfg (the expert-group
        unit; --mixed-sf routes slabs round-robin over groups, exactly
        the host-side routing of parallel.dispatch.ChannelDispatcher)."""
        cfg = LoRaConfig(sf=sf, cr="4/8", ampl=1.0)
        cfg = cfg.replace(mtu=cfg.num_symbols(args.payload) + 4)
        T = required_samples(cfg)
        # one slab of wire-format capture, reused for every slab (a fresh
        # 10k-channel noise bank blew the host-RNG budget in round 3; the
        # device work is identical per slab either way)
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
        return {"sf": sf, "cfg": cfg, "T": T, "wire": wire,
                "found": 0, "ok": 0, "slabs": 0}

    groups = [make_group(10)]
    if args.mixed_sf:
        groups.append(make_group(8))
    g0 = groups[0]
    cfg, T, wire = g0["cfg"], g0["T"], g0["wire"]

    if args.host_convert:
        mode = "host-convert/f32"
    elif args.interleaved:
        mode = "device-deinterleave/int16"
    else:
        mode = "planar-int16"

    # ---- the device programs: (convert +) demod + decode in ONE dispatch,
    # compiled once PER GROUP (the dispatcher's per-config program unit) --
    def attach_steps(g: dict) -> None:
        cfg_g = g["cfg"]

        @jax.jit
        def step_wire_g(w16):
            # interleaved wire: the strided int16 deinterleave is a costly
            # TPU relayout (measured 434 Msamp/s compute-only at
            # SF10/B=2048 vs multi-G without) — the --interleaved mode
            x = w16.astype(jnp.float32) * scale
            xb = cplx.IQ(x[:, 0::2], x[:, 1::2])
            dem = api.demodulate(xb, cfg_g)
            dec = api.decode(dem.symbols.astype(jnp.int32), cfg_g)
            return dem.found, dec.status, dec.length

        @jax.jit
        def step_planar16_g(r16, i16):
            xb = cplx.IQ(r16.astype(jnp.float32) * scale,
                         i16.astype(jnp.float32) * scale)
            dem = api.demodulate(xb, cfg_g)
            dec = api.decode(dem.symbols.astype(jnp.int32), cfg_g)
            return dem.found, dec.status, dec.length

        @jax.jit
        def step_f32_g(r, i):
            dem = api.demodulate(cplx.IQ(r, i), cfg_g)
            dec = api.decode(dem.symbols.astype(jnp.int32), cfg_g)
            return dem.found, dec.status, dec.length

        g["step_wire"] = step_wire_g
        g["step_planar16"] = step_planar16_g
        g["step_f32"] = step_f32_g

    for g in groups:
        attach_steps(g)
    step_wire = g0["step_wire"]
    step_planar16 = g0["step_planar16"]
    step_f32 = g0["step_f32"]

    def host_blocks(g: dict):
        """One slab's queue payload, converted per `mode` (timed).

        Planar conversions land in a 4-deep per-group buffer POOL
        (queue depth 2 + one in flight + one converting): fresh
        per-slab allocations measured a ~0.8 GB/slab linear RSS climb
        on the tunneled runtime (the client retains per-transfer host
        staging) — reusing the same buffers re-pins the same memory."""
        t0 = time.perf_counter()
        gw, gT = g["wire"], g["T"]
        if args.host_convert:
            r, i = iqio.convert(gw.reshape(-1), "cs16", float(scale))
            blk = (r.reshape(slab, gT), i.reshape(slab, gT))
        elif args.interleaved:
            blk = gw
        else:  # planar int16: a cheap strided numpy copy on the host
            if "pool" not in g:
                g["pool"] = [
                    (np.empty((slab, gT), np.int16),
                     np.empty((slab, gT), np.int16))
                    for _ in range(4)
                ]
                g["pool_i"] = 0
            br, bi = g["pool"][g["pool_i"] % 4]
            g["pool_i"] += 1
            np.copyto(br, gw[:, 0::2])
            np.copyto(bi, gw[:, 1::2])
            blk = (br, bi)
        t_convert[0] += time.perf_counter() - t0
        return blk

    def dispatch(g: dict, blk):
        """Returns (outputs, device-input handles).  The handles are
        .delete()d after the slab's readback: on the tunneled runtime
        the client retains per-transfer host staging 1:1 with H2D bytes
        (measured ~0.5-0.8 GB/slab RSS slope that neither host-buffer
        reuse nor gc moved); explicit device-array deletion is the
        remaining release hook."""
        if args.interleaved:
            dev = [jnp.asarray(blk)]
            return g["step_wire"](dev[0]), dev
        dev = [jnp.asarray(blk[0]), jnp.asarray(blk[1])]
        step = g["step_f32"] if args.host_convert else g["step_planar16"]
        return step(dev[0], dev[1]), dev

    def rss_mb() -> float:
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmRSS:"):
                    return round(int(ln.split()[1]) / 1024, 1)
        return -1.0

    # compile + device warmup outside the timed region
    t_convert = [0.0]
    blk0 = None
    for g in groups:
        blk = host_blocks(g)
        out, _dev = dispatch(g, blk)
        np.asarray(out[0])
        for d in _dev:  # release the warmup transfer's staging too
            d.delete()
        if blk0 is None:
            blk0 = blk
    t_convert[0] = 0.0
    rss_start = rss_mb()

    # compute-only program: DEFINED AND COMPILED HERE, while the process
    # is young — both sustained round-5 runs lost this section to
    # remote-compile transport faults (broken pipe / timeout) when its
    # compile was attempted after 30+ process-minutes
    # (resident inputs stay in HBM across the run; everything per rep
    # lives inside ONE jit — eager big-array adds cost ~600 ms/rep on
    # this backend)
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

    # ---- ingest thread ----------------------------------------------------
    q: "queue.Queue" = queue.Queue(maxsize=2)
    deadline_s = args.minutes * 60.0
    t0 = time.perf_counter()

    def ingest():
        i = 0
        while True:
            if deadline_s:
                if time.perf_counter() - t0 >= deadline_s:
                    break
            elif i >= n_slabs:
                break
            g = groups[i % len(groups)]
            q.put((g, host_blocks(g)))
            i += 1
        q.put(None)

    # ---- timed end-to-end run ---------------------------------------------
    samples_done = 0
    slab_done_t: list[float] = []

    def settle(pend):
        nonlocal samples_done
        g, out, dev = pend
        g["found"] += int(np.asarray(out[0]).sum())
        g["ok"] += int((np.asarray(out[1]) == OK).sum())
        for d in dev:
            d.delete()
        g["slabs"] += 1
        samples_done += slab * g["T"]
        slab_done_t.append(time.perf_counter() - t0)
        n = len(slab_done_t)
        if n % 5 == 0:
            import gc

            gc.collect()  # dangling device-array handles hold host
            # staging on this runtime; collect keeps RSS honest for the
            # leak check
        if n % 5 == 0 or n <= 2:
            # incremental evidence: a watchdog/timeout kill must not
            # erase the run (round-5 lesson: a 2300 s timeout ate a full
            # 20-minute sustained run that only printed at the end)
            print(json.dumps({
                "progress_slab": n, "t_s": round(slab_done_t[-1], 1),
                "found": sum(gg["found"] for gg in groups),
                "ok": sum(gg["ok"] for gg in groups),
                "rss_mb": rss_mb(),
            }), flush=True)

    threading.Thread(target=ingest, daemon=True).start()
    pending = None
    while True:
        item = q.get()
        if item is None:
            break
        g, blk = item
        out, dev = dispatch(g, blk)
        if pending is not None:  # depth-1 pipeline: overlap readback
            settle(pending)
        pending = (g, out, dev)
    if pending is not None:  # zero ingested slabs (tiny --minutes)
        settle(pending)
    dt = time.perf_counter() - t0
    rss_end = rss_mb()

    found_total = sum(g["found"] for g in groups)
    ok_total = sum(g["ok"] for g in groups)
    n_done = sum(g["slabs"] for g in groups)
    rate_e2e = samples_done / dt / 1e6
    n_rt = rate_e2e * 1e6 / 0.5e6
    if not slab_done_t:
        print(json.dumps({"bench": "config5_e2e",
                          "error": "no slabs ingested before the deadline"}))
        return
    per_slab = np.diff(np.concatenate([[0.0], np.asarray(slab_done_t)]))
    half = max(len(per_slab) // 2, 1)
    drift = float(np.median(per_slab[half:]) / np.median(per_slab[:half])) \
        if len(per_slab) >= 4 else 1.0

    # the end-to-end record prints BEFORE the compute-only section so a
    # timeout there cannot erase the measured run
    rec = {
        "bench": "config5_e2e",
        "channels": B, "slab": slab, "slabs": n_done, "T": T,
        "mode": mode,
        "measured_Msamp_s": round(rate_e2e, 1),
        "measured_rt_channels_500kHz": round(n_rt, 1),
        "frames_found": found_total, "frames_decoded_ok": ok_total,
        "of": n_done * slab,
        "wall_s": round(dt, 1),
        "convert_host_s": round(t_convert[0], 2),
        "per_slab_s": {
            "median": round(float(np.median(per_slab)), 2),
            "p95": round(float(np.percentile(per_slab, 95)), 2),
            "max": round(float(per_slab.max()), 2),
            "late_vs_early_drift": round(drift, 3),
        },
        "rss_mb": {"start": rss_start, "end": rss_end},
        "note": "measured_* is end-to-end through the dev tunnel",
    }
    if len(groups) > 1:
        rec["groups"] = [
            {"sf": g["sf"], "slabs": g["slabs"], "found": g["found"],
             "ok": g["ok"], "of": g["slabs"] * slab}
            for g in groups
        ]
    print(json.dumps(rec), flush=True)

    reps = 4
    tc0 = time.perf_counter()
    for _ in range(reps):
        out, eps = stepc(eps)
    np.asarray(out)
    dt_c = (time.perf_counter() - tc0) / reps
    rate_c = slab * T / dt_c / 1e6

    bps = 8 if args.host_convert else 4  # link bytes per complex sample
    rate_pcie = min(rate_c, PCIE_GBPS * 1e3 / bps)
    print(json.dumps({
        "bench": "config5_e2e_compute",
        "compute_only_Msamp_s_per_slab": round(rate_c, 1),
        "link_bytes_per_sample": bps,
        "pcie16GBs_projection_Msamp_s": round(rate_pcie, 1),
        "pcie16GBs_projection_rt_channels": round(rate_pcie * 2, 1),
        "note": "the pcie projection is labeled, not measured",
    }))


if __name__ == "__main__":
    main()
