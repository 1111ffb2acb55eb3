"""Headline benchmark: aggregate demodulator throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

metric  : batched full-frame demod (dechirp + FFT + argmax + sync search +
          CFO recovery) at the reference's verified operating point
          (SF10, TestLoopback.cpp:93-101), complex64 samples in HBM.
value   : Msamples/s of baseband consumed per chip.
vs_baseline : the reference is a single-stream CPU pipeline whose hard
          requirement is real time at max BW x ovs = 0.5 Msamp/s
          (BASELINE.md "Required complex-sample throughput"); the ratio is
          therefore "how many max-rate reference modems one chip replaces".
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples

    cfg = LoRaConfig(sf=10, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(32) + 4)
    T = required_samples(cfg)

    dev = jax.devices()[0]
    plat = dev.platform
    # channel-bank size: ~2.7 GB of input on an accelerator (amortizes the
    # fixed dispatch overhead), small on CPU CI
    B = 4096 if plat != "cpu" else 8

    from lora_tpu.ops import cplx

    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    iq = api.modulate(api.encode(payload, cfg), cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, T - iq.shape[-1]))))[:, :T]
    iq = cplx.IQ(
        iq.re + jnp.asarray(0.1 * rng.standard_normal((B, T)), jnp.float32),
        iq.im + jnp.asarray(0.1 * rng.standard_normal((B, T)), jnp.float32),
    )
    jax.block_until_ready(iq)

    @jax.jit
    def step_f32(x):
        d = api.demodulate(x, cfg)
        return d.symbols, d.count, d.found

    @jax.jit
    def step_bf16(x):
        d = api.demodulate(x, cfg, fused="bf16")
        return d.symbols, d.count, d.found

    # warmup / compile
    out = step_f32(iq)
    jax.block_until_ready(out)
    assert bool(np.all(np.asarray(out[2]))), "bench frames must all sync"

    # bf16 MXU mode (v5e-native DFT precision): use it for the timed loop
    # only if every decision (symbols/count/found) matches f32 on this
    # very input bank — self-validating, like tpu_smoke's standing check
    step, mode = step_f32, "f32"
    if jax.default_backend() == "tpu":
        ob = step_bf16(iq)
        jax.block_until_ready(ob)
        if all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(out, ob)
        ):
            step, mode = step_bf16, "bf16"

    iters = 10 if plat != "cpu" else 2
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = step(iq)  # async dispatch: overlaps the previous readback
        if pending is not None:
            np.asarray(pending[2])  # host readback: the tunneled TPU
            # runtime does not reliably await device completion in
            # block_until_ready; keep exactly one dispatch in flight
            # (queuing many un-awaited dispatches stalls the tunnel) —
            # the steady-state pipeline of runtime/slab.py and pump()
        pending = out
    np.asarray(pending[2])
    dt = time.perf_counter() - t0

    samples = B * T * iters
    msps = samples / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "demod_throughput_sf10",
                "value": round(msps, 2),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / 0.5, 1),
                "mode": mode,
            }
        )
    )


if __name__ == "__main__":
    main()
