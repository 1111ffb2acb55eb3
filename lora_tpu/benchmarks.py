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
round's perf evidence into rc=124; round-3 continuation lesson: a device
OOM on the shared dev chip makes the tunneled runtime HANG, not raise, so
an in-process try/except ladder can never reach its fallback).  The
driver path therefore runs each ladder rung in a SUBPROCESS with its own
timeout: a rung that hangs is killed and the next rung — smaller batch,
then serial dispatch, then unfused — runs in a fresh process.  The
orchestrator always prints a JSON line before an env-configurable
deadline (LORA_BENCH_BUDGET_S, default 500 s).

`python bench.py --validate` additionally cross-checks bf16 decisions
against f32 before timing (two compiles — not for the driver window).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Driver ladder: fastest/biggest first, each rung cheaper and more
# conservative than the last.  (fused mode, batch, pipelined, iters)
#   rung 1: the headline configuration (bf16 MXU, depth-1 pipelined readback)
#   rung 2: same but half the batch — survives a memory-squeezed shared chip
#           (two in-flight B=4096 steps need ~2x the temp footprint)
#   rung 3: f32, serial readback — no double-buffered temps at all
#   rung 4: unfused XLA path, small batch — runs even with Pallas broken
_RUNGS = [
    ("bf16", 4096, True, 10),
    ("bf16", 2048, True, 10),
    ("auto", 2048, False, 6),
    ("off", 512, False, 4),
]


def _build_input(api, jax, jnp, cplx, cfg, B: int, T: int):
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
    return iq


def _run_mode(api, jax, cfg, iq, fused: str, iters: int, pipelined: bool):
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
    if pipelined:
        # async dispatch with exactly one extra step in flight: overlaps
        # the previous readback (the tunneled TPU runtime does not
        # reliably await device completion in block_until_ready; queuing
        # many un-awaited dispatches stalls the tunnel).  Needs ~2x the
        # per-step temp footprint on the device.
        pending = None
        for _ in range(iters):
            out = step(iq)
            if pending is not None:
                np.asarray(pending[2])
            pending = out
        np.asarray(pending[2])
    else:
        for _ in range(iters):
            out = step(iq)
            np.asarray(out[2])  # serial: one dispatch, one readback
    dt = time.perf_counter() - t0
    B, T = iq.shape
    return B * T * iters / dt / 1e6, step, out


def _rung_main(fused: str, B: int, pipelined: bool, iters: int) -> None:
    """Subprocess entry: measure ONE ladder rung, print one JSON line."""
    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import cplx

    cfg = LoRaConfig(sf=10, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(32) + 4)
    T = required_samples(cfg)
    iq = _build_input(api, jax, jnp, cplx, cfg, B, T)
    print(f"rung {fused} B={B} staged", file=sys.stderr, flush=True)
    msps, _, _ = _run_mode(api, jax, cfg, iq, fused, iters, pipelined)
    print(json.dumps({"value": round(msps, 2)}), flush=True)


def _driver_ladder() -> None:
    """Run the rung ladder, each in its own subprocess with a timeout."""
    budget = float(os.environ.get("LORA_BENCH_BUDGET_S", "500"))
    deadline = time.monotonic() + budget
    errors = {}
    for fused, B, pipelined, iters in _RUNGS:
        remaining = deadline - time.monotonic()
        timeout = min(remaining - 15.0, 300.0)
        if timeout < 60.0:
            errors["budget"] = f"{remaining:.0f}s left, skipping smaller rungs"
            break
        tag = f"{fused}/B{B}/{'pipe' if pipelined else 'serial'}"
        cmd = [
            sys.executable, "-m", "lora_tpu.benchmarks",
            "--rung", fused, str(B), "1" if pipelined else "0", str(iters),
        ]
        try:
            proc = subprocess.run(
                cmd, timeout=timeout, text=True,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        except subprocess.TimeoutExpired:
            errors[tag] = f"timeout after {timeout:.0f}s (hung dispatch killed)"
            continue
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
        )
        if proc.returncode != 0 or line is None:
            errors[tag] = f"rc={proc.returncode}"
            continue
        msps = float(json.loads(line)["value"])
        rec = {
            "metric": "demod_throughput_sf10",
            "value": round(msps, 2),
            "unit": "Msamples/s/chip",
            "vs_baseline": round(msps / 0.5, 1),
            "mode": fused,
            "batch": B,
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


def main() -> None:
    if "--rung" in sys.argv:
        i = sys.argv.index("--rung")
        fused, b, pipe, iters = sys.argv[i + 1 : i + 5]
        _rung_main(fused, int(b), pipe == "1", int(iters))
        return

    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import cplx

    validate = "--validate" in sys.argv
    on_tpu = jax.default_backend() == "tpu"

    if on_tpu and not validate:
        _driver_ladder()
        return

    # CPU CI / --validate path: small shapes, in-process (no subprocesses)
    cfg = LoRaConfig(sf=10, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(32) + 4)
    T = required_samples(cfg)
    B = 4096 if on_tpu else 8
    iq = _build_input(api, jax, jnp, cplx, cfg, B, T)
    iters = 10 if on_tpu else 2

    if validate and on_tpu:
        # cross-check bf16 decisions against f32 on this very input bank
        # before trusting the bf16 number (two compiles)
        _, _, of = _run_mode(api, jax, cfg, iq, "auto", 1, False)
        _, _, ob = _run_mode(api, jax, cfg, iq, "bf16", 1, False)
        same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(of, ob)
        )
        print(json.dumps({"check": "bf16_vs_f32_decisions", "ok": same}),
              file=sys.stderr)

    ladder = ["bf16", "auto", "off"] if on_tpu else ["auto", "off"]
    errors = {}
    for fused in ladder:
        try:
            msps, _, _ = _run_mode(api, jax, cfg, iq, fused, iters, on_tpu)
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
