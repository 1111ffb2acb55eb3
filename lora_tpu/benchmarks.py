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

Robustness contract (round-2 lesson: a kernel regression turned the
round's perf evidence into rc=124): the bench must ALWAYS print its JSON
line inside the driver's timeout.  It compiles exactly one program per
attempt, walks a mode ladder (bf16 -> f32 -> fused=off) on any compile or
correctness failure, and reports the mode (+ any fallback reason) in the
JSON.  `python bench.py --validate` additionally cross-checks bf16
decisions against f32 before timing (two compiles — not for the driver
window).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _run_mode(api, jax, cfg, iq, fused: str, iters: int):
    """Compile + self-check + time one demod mode.  Returns Msamples/s.
    Raises on compile failure or if any bench frame fails to sync."""

    @jax.jit
    def step(x):
        d = api.demodulate(x, cfg, fused=fused)
        return d.symbols, d.count, d.found

    out = step(iq)  # warmup / compile
    jax.block_until_ready(out)
    if not bool(np.all(np.asarray(out[2]))):
        raise AssertionError(f"fused={fused}: bench frames must all sync")

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
    B, T = iq.shape
    return B * T * iters / dt / 1e6, step, out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import cplx

    validate = "--validate" in sys.argv

    cfg = LoRaConfig(sf=10, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(32) + 4)
    T = required_samples(cfg)

    dev = jax.devices()[0]
    plat = dev.platform
    # channel-bank size: ~2.8 GB of input on an accelerator (amortizes the
    # fixed dispatch overhead), small on CPU CI
    B = 4096 if plat != "cpu" else 8

    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 256, (B, 32), dtype=np.uint8))
    iq = api.modulate(api.encode(payload, cfg), cfg)
    iq = cplx.pad(iq, ((0, 0), (0, max(0, T - iq.shape[-1]))))[:, :T]
    # noise generated ON DEVICE: host-side standard_normal((B, T)) x2 was
    # ~2.6 GB shipped over the ~32 MB/s dev tunnel (~80 s of the driver's
    # bench window) for data whose only job is to be Gaussian
    kr, ki = jax.random.split(jax.random.PRNGKey(0))
    iq = cplx.IQ(
        iq.re + 0.1 * jax.random.normal(kr, (B, T), jnp.float32),
        iq.im + 0.1 * jax.random.normal(ki, (B, T), jnp.float32),
    )
    jax.block_until_ready(iq)

    iters = 10 if plat != "cpu" else 2
    on_tpu = jax.default_backend() == "tpu"

    if validate and on_tpu:
        # cross-check bf16 decisions against f32 on this very input bank
        # before trusting the bf16 number (two compiles)
        _, _, of = _run_mode(api, jax, cfg, iq, "auto", 1)
        _, _, ob = _run_mode(api, jax, cfg, iq, "bf16", 1)
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(of, ob)
        )
        print(json.dumps({"check": "bf16_vs_f32_decisions", "ok": same}),
              file=sys.stderr)

    # mode ladder: fastest first, fall back on ANY failure so the driver
    # always gets a parseable line
    ladder = ["bf16", "auto", "off"] if on_tpu else ["auto", "off"]
    errors = {}
    for fused in ladder:
        try:
            msps, _, _ = _run_mode(api, jax, cfg, iq, fused, iters)
        except Exception as e:  # noqa: BLE001 — ladder must not die
            errors[fused] = f"{type(e).__name__}: {e}"[:200]
            continue
        rec = {
            "metric": "demod_throughput_sf10",
            "value": round(msps, 2),
            "unit": "Msamples/s/chip",
            "vs_baseline": round(msps / 0.5, 1),
            "mode": fused,
        }
        if errors:
            rec["fallback_from"] = errors
        print(json.dumps(rec))
        return

    print(json.dumps({
        "metric": "demod_throughput_sf10",
        "value": 0.0,
        "unit": "Msamples/s/chip",
        "vs_baseline": 0.0,
        "error": errors,
    }))
    raise SystemExit(1)


if __name__ == "__main__":
    main()
