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

Robustness contract (round-4 rework; the round-2 and round-3 driver runs
both banked 0.0):

  * round-2 lesson: a kernel regression turned the perf evidence into
    rc=124 — so every rung self-checks decisions before timing.
  * round-3 lesson: each ladder rung ran in its OWN subprocess,
    re-paying the ~200 s server-side warmup of the tunneled TPU runtime
    per rung, most-expensive-first with `min(remaining-15, 300)`
    timeouts — two cold-chip hangs exhausted the 500 s budget before
    the conservative rungs ever ran.

  The round-4 design inverts all of that:
  - ONE persistent worker subprocess owns the device for the whole
    ladder, so the server warmup is paid once (the worker runs a trivial
    program + readback and reports "warm" before any rung).
  - The parent orchestrator NEVER initializes the accelerator backend
    (it probes `jax.default_backend()` in a throwaway subprocess), so
    the worker is the only client on the tunnel.
  - Rungs run CHEAPEST-FIRST: the unfused small-batch floor banks a
    number within the first rung; bf16/big-batch upgrades follow with
    whatever budget remains.  The parent records every rung event as it
    arrives and prints the BEST value achieved — a hang in rung k can
    no longer erase rungs 1..k-1.
  - Watchdogs are per-event (the worker emits staged/compiled/measured
    progress lines), sized as a fair split of the remaining budget over
    the remaining rungs, never `min(remaining-15, 300)`.
  - Worker stderr is captured and the last lines attached to the error
    record; rung results ride a `@@LORA ` sentinel so stray stdout
    can't be parsed as a measurement.

Drill (must print a nonzero value from a fresh process):
    LORA_BENCH_BUDGET_S=240 python bench.py

`python bench.py --validate` additionally cross-checks bf16 decisions
against f32 before timing (two compiles — not for the driver window).
"""

from __future__ import annotations

import collections
import json
import os
import queue
import subprocess
import sys
import threading
import time

import numpy as np

_SENTINEL = "@@LORA "

# Ladder rungs, CHEAPEST FIRST: (sf, fused mode, batch, pipelined, iters).
#   rung 1 (floor): unfused XLA path, small batch, serial readback —
#           runs even with Pallas broken, minimal temp footprint.
#   rung 2: fused f32, serial readback — no double-buffered temps.
#   rung 3: bf16 MXU, depth-1 pipelined readback, half batch.
#   rung 4: fused f32, B=4096, pipelined — the roll-free kernels put the
#           f32 four-step AHEAD of bf16 per-kernel (payload 8.4 vs 6.5
#           Gsamp/s, tools/bench_roofline.py), so f32 contends for the
#           headline at full batch.
#   rung 5: bf16, B=4096, pipelined (round-3 headline mode).
#   rung 6 (round-5): SF12 — N=4096 through the same fused kernels
#           (LoRaDetector.hpp:29-64 at its largest N).  Banked into the
#           rung record for the official SF12 number; it does NOT compete
#           for the SF10 headline (the orchestrator gates `best` on sf).
# The orchestrator banks the BEST SF10 value across rungs either way.
_RUNGS = [
    (10, "off", 512, False, 3),
    (10, "auto", 2048, False, 4),
    (10, "bf16", 2048, True, 8),
    (10, "auto", 4096, True, 10),
    (10, "bf16", 4096, True, 10),
    (12, "auto", 1024, True, 6),
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


def _run_mode(api, jax, cfg, iq, fused: str, iters: int, pipelined: bool,
              progress=None):
    """Compile + self-check + time one demod mode.  Returns Msamples/s.
    Raises on compile failure or if any bench frame fails to sync."""

    @jax.jit
    def step(x):
        d = api.demodulate(x, cfg, fused=fused)
        return d.symbols, d.count, d.found

    out = step(iq)  # warmup / compile
    jax.block_until_ready(out)
    if progress is not None:
        progress("compiled")
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


# ---------------------------------------------------------------------------
# Worker: the single process that owns the device for the whole ladder.
# ---------------------------------------------------------------------------


_EMIT_LOCK = threading.Lock()


def _emit(obj) -> None:
    # one locked single-string write: print() issues payload and newline
    # as separate writes, and the heartbeat thread emits concurrently
    # with the rung events — a torn line would be dropped by the
    # orchestrator's JSON parse, silently losing a banked rung
    with _EMIT_LOCK:
        sys.stdout.write(_SENTINEL + json.dumps(obj) + "\n")
        sys.stdout.flush()


def _worker_main(max_rungs: int) -> None:
    t_start = time.monotonic()
    budget = float(os.environ.get("LORA_WORKER_BUDGET_S", "1e9"))
    beating = threading.Event()

    def _heartbeat() -> None:
        # Armed only after the FIRST rung banks (see below): from then on
        # a kill gains the orchestrator nothing (it never restarts once a
        # value is banked), while a 60-90 s fused-program compile between
        # progress events must not trip the per-event watchdog (round-5:
        # a compile gap banked only the floor rung).  Before the first
        # rung, the silence IS the signal — warmup hangs must still fall
        # through to the orchestrator's retry.
        while True:
            time.sleep(25.0)
            if beating.is_set():
                _emit({"event": "alive"})

    threading.Thread(target=_heartbeat, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import cplx

    # Pay the server-side session warmup ONCE and tell the parent when
    # it's done so warmup stalls are distinguishable from rung hangs.
    # The readback must be an actual host transfer (np.asarray): on the
    # tunneled runtime block_until_ready can return before the device
    # executes, which would silently defer the ~150-200 s first-execution
    # stall onto the first rung's self-check readback (measured in
    # round 4: a block_until_ready-only warmup left a 149 s
    # compiled->result gap on the floor rung).
    w = jax.jit(lambda a, b: a @ b)(jnp.ones((8, 8)), jnp.ones((8, 8)))
    np.asarray(w)
    _emit({"event": "warm", "t": round(time.monotonic() - t_start, 1)})

    cfgs = {}
    for sf in sorted({r[0] for r in _RUNGS}):
        c = LoRaConfig(sf=sf, cr="4/8", ampl=1.0)
        cfgs[sf] = c.replace(mtu=c.num_symbols(32) + 4)
    inputs = {}  # (sf, B) -> staged device bank (reused across rungs)

    for sf, fused, B, pipelined, iters in _RUNGS[:max_rungs]:
        cfg = cfgs[sf]
        tag = f"sf{sf}-{fused}/B{B}/{'pipe' if pipelined else 'serial'}"
        if time.monotonic() - t_start > budget - 30.0:
            _emit({"event": "skip", "tag": tag, "why": "worker budget"})
            continue
        _emit({"event": "staging", "tag": tag})
        try:
            if (sf, B) not in inputs:
                inputs[sf, B] = _build_input(
                    api, jax, jnp, cplx, cfg, B, required_samples(cfg)
                )
            _emit({"event": "staged", "tag": tag})
            msps, _, _ = _run_mode(
                api, jax, cfg, inputs[sf, B], fused, iters, pipelined,
                progress=lambda st: _emit({"event": st, "tag": tag}),
            )
        except Exception as e:  # noqa: BLE001 — ladder must not die
            _emit({
                "event": "rung_error", "tag": tag,
                "error": f"{type(e).__name__}: {e}"[:200],
            })
            continue
        _emit({
            "event": "rung", "tag": tag, "value": round(msps, 2),
            "mode": fused, "batch": B, "sf": sf,
        })
        beating.set()  # a value is banked: arm the compile heartbeat
    _emit({"event": "done"})


# ---------------------------------------------------------------------------
# Orchestrator: never touches the device, supervises the worker.
# ---------------------------------------------------------------------------


def _probe_backend(timeout: float) -> str:
    """Ask a throwaway subprocess for jax.default_backend() so the parent
    never initializes (and then idles on) the device client — on the
    single-client tunneled runtime the parent's idle client contends with
    the worker's (round-3 advisor finding).  Env vars are NOT consulted:
    this image's sitecustomize pins jax_platforms, so JAX_PLATFORMS=cpu
    does not actually switch platforms.  LORA_BENCH_FORCE=cpu|tpu
    overrides the probe (CI / drills)."""
    forced = os.environ.get("LORA_BENCH_FORCE", "")
    if forced:
        return forced
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BACKEND=' + jax.default_backend())"],
            timeout=max(timeout, 20.0), text=True,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )
    except subprocess.TimeoutExpired:
        # jax import on CPU is fast; a stalled probe smells like a busy
        # accelerator tunnel — proceed down the TPU path and let the
        # worker's watchdogs arbitrate.
        return "tpu"
    for ln in p.stdout.splitlines():
        if ln.startswith("BACKEND="):
            return ln.split("=", 1)[1].strip()
    if p.returncode != 0:
        # the probe CRASHED (e.g. "Unable to initialize backend 'axon':
        # UNAVAILABLE" — observed when the tunnel's server side is down):
        # this image always pins axon first, so a crash means the TPU
        # path exists but is currently failing.  Route to the resilient
        # ladder — its workers fail per-rung and the orchestrator prints
        # an honest 0.0 + error record, instead of the CPU path crashing
        # below on the same backend init with NO JSON line at all.
        return "tpu"
    return "cpu"


class _Worker:
    """Line-oriented supervisor around the worker subprocess."""

    def __init__(self, max_rungs: int, budget_left: float):
        env = dict(os.environ)
        env["LORA_WORKER_BUDGET_S"] = str(max(budget_left - 10.0, 30.0))
        self.proc = subprocess.Popen(
            [sys.executable, "-u", "-m", "lora_tpu.benchmarks",
             "--worker", str(max_rungs)],
            text=True, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        self.events: "queue.Queue[dict]" = queue.Queue()
        self.stderr_tail: "collections.deque[str]" = collections.deque(maxlen=30)
        threading.Thread(target=self._pump_stdout, daemon=True).start()
        threading.Thread(target=self._pump_stderr, daemon=True).start()

    def _pump_stdout(self) -> None:
        for ln in self.proc.stdout:
            if ln.startswith(_SENTINEL):
                try:
                    self.events.put(json.loads(ln[len(_SENTINEL):]))
                except json.JSONDecodeError:
                    pass
        self.events.put({"event": "eof"})

    def _pump_stderr(self) -> None:
        for ln in self.proc.stderr:
            ln = ln.rstrip()
            if ln:
                self.stderr_tail.append(ln)

    def next_event(self, timeout: float):
        try:
            return self.events.get(timeout=max(timeout, 1.0))
        except queue.Empty:
            return None

    def kill(self) -> None:
        if self.proc.poll() is None:
            self.proc.kill()  # exact PID we started — never a pattern
        try:
            self.proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            pass

    def stderr_excerpt(self) -> str:
        return " | ".join(list(self.stderr_tail)[-4:])[-300:]


def _driver_ladder() -> None:
    budget = float(os.environ.get("LORA_BENCH_BUDGET_S", "500"))
    deadline = time.monotonic() + budget
    reserve = 10.0  # always print before the driver's own deadline

    best = None  # (value, mode, batch)
    rungs_seen: dict[str, object] = {}
    errors: dict[str, str] = {}

    def finish() -> None:
        if best is not None:
            value, mode, batch = best
            rec = {
                "metric": "demod_throughput_sf10",
                "value": round(value, 2),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(value / 0.5, 1),
                "mode": mode,
                "batch": batch,
                "rungs": rungs_seen,
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

    def supervise(worker: _Worker, n_rungs: int) -> str:
        """Drain worker events under watchdogs; returns why it stopped."""
        nonlocal best
        rungs_left = n_rungs
        while True:
            remaining = deadline - time.monotonic()
            if remaining < reserve + 2.0:
                return "budget"
            if best is None:
                # Until the FIRST rung banks, stay generous: the one-time
                # server-side session warmup can stall ~200 s (and if it
                # escapes the warm-up readback it lands on the floor
                # rung), and the floor rung is already the cheapest
                # configuration — there is no smaller fallback whose
                # budget a shorter watchdog would be protecting.
                watchdog = min(remaining - reserve - 2.0, 280.0)
            else:
                # A value is banked; protect it.  Fair split of what's
                # left over the rungs still to come; per-EVENT, and the
                # worker emits staged/compiled progress lines, so this
                # only fires on a genuinely hung dispatch.
                watchdog = max((remaining - reserve) / max(rungs_left, 1), 60.0)
            watchdog = min(watchdog, remaining - reserve)
            ev = worker.next_event(watchdog)
            if ev is None:
                return "watchdog"
            kind = ev.get("event")
            if kind == "rung":
                tag = ev["tag"]
                rungs_seen[tag] = ev["value"]
                rungs_left -= 1
                # only SF10 rungs contend for the SF10 headline; other
                # SFs (the SF12 rung) bank into the rung record only
                if ev.get("sf", 10) == 10 and (
                    best is None or ev["value"] > best[0]
                ):
                    best = (ev["value"], ev["mode"], ev["batch"])
            elif kind == "rung_error":
                errors[ev["tag"]] = ev["error"]
                rungs_seen[ev["tag"]] = "error"
                rungs_left -= 1
            elif kind == "skip":
                rungs_seen[ev["tag"]] = "skipped(worker budget)"
                rungs_left -= 1
            elif kind == "done":
                return "done"
            elif kind == "eof":
                # stdout EOF WITHOUT a done event: the worker process
                # died outside the per-rung try (e.g. backend init /
                # warmup crash when the tunnel is down) — report it so
                # the stderr excerpt (the actual error) reaches the
                # record instead of an empty error dict
                return "worker died"
            # staging/staged/compiled progress events just reset the watchdog

    remaining = deadline - time.monotonic() - reserve
    worker = _Worker(len(_RUNGS), remaining)
    why = supervise(worker, len(_RUNGS))
    if why != "done":
        errors["ladder"] = (
            f"{why}; killed worker; stderr: {worker.stderr_excerpt()}"
        )
    worker.kill()

    # Nothing banked and budget still on the clock: one retry, floor
    # rung only, in a fresh process (covers a transient tunnel fault
    # that killed the first worker outright).
    remaining = deadline - time.monotonic() - reserve
    if best is None and remaining > 110.0:
        retry = _Worker(1, remaining)
        why = supervise(retry, 1)
        if why != "done":
            errors["retry"] = (
                f"{why}; killed worker; stderr: {retry.stderr_excerpt()}"
            )
        retry.kill()

    finish()


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker_main(int(sys.argv[i + 1]))
        return

    validate = "--validate" in sys.argv
    if not validate:
        budget = float(os.environ.get("LORA_BENCH_BUDGET_S", "500"))
        backend = _probe_backend(timeout=min(90.0, budget / 4))
        if backend in ("tpu", "axon"):
            _driver_ladder()
            return

    # CPU CI / --validate path: small shapes, in-process
    import jax

    if os.environ.get("LORA_BENCH_FORCE", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lora_tpu import api
    from lora_tpu.config import LoRaConfig
    from lora_tpu.models.demodulator import required_samples
    from lora_tpu.ops import cplx

    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError as e:
        # axon pinned but unavailable: drop to the CPU platform so the
        # CI/validate path still produces a (CPU-labeled) record rather
        # than dying with no JSON line
        print(json.dumps({"warn": f"backend init failed: {e}"[:200],
                          "fallback": "cpu"}), file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        on_tpu = False
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
            "backend": jax.default_backend(),
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
