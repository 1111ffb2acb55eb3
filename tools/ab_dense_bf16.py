"""A/B: bf16 dense-DFT (N<=1024) vs bf16 four-step for the fused demod
kernels, SF10/B=2048.  Run twice on the chip:

    python tools/ab_dense_bf16.py                        # four-step (default)
    LORA_MAX_DENSE_BF16_N=1024 python tools/ab_dense_bf16.py   # dense

Prints one JSON line per kernel."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lora_tpu.config import LoRaConfig
from lora_tpu.ops import pallas_demod as pd
from lora_tpu.ops import pallas_detect as pdet
from lora_tpu.ops.cplx import IQ


def _timed_chain(step, reps=8):
    out, carry = step(None)
    np.asarray(out)
    out, carry = step(None)
    np.asarray(out)
    t0 = time.perf_counter()
    carry = None
    for _ in range(reps):
        out, carry = step(carry)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    cfg = LoRaConfig(sf=10, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(32) + 4)
    N, B = cfg.N, 2048
    rng = np.random.default_rng(0)
    r2 = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    tag = f"dense<=N{pdet.MAX_DENSE_BF16_N}"

    Rp = pd.payload_rows(N, cfg.mtu)
    g = IQ(r2((B, Rp, N)), r2((B, Rp, N)))
    rs0 = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    fe0 = jnp.zeros(B, jnp.float32)
    jax.block_until_ready(g)

    def step_payload(carry):
        fe = fe0 if carry is None else carry
        v, p, n = pd.payload_detect(g, rs0, fe, cfg.mtu, bf16=True)
        return v, 0.0 * p[:, 0] + fe0

    s = _timed_chain(step_payload)
    print(json.dumps({"kernel": "payload bf16", "cfg": tag,
                      "ms": round(s * 1e3, 3),
                      "Gsamp/s": round(B * cfg.mtu * N / s / 1e9, 2)}),
          flush=True)

    xs = IQ(r2((B, pd.TRACK_ROWS, N)), r2((B, pd.TRACK_ROWS, N)))
    jax.block_until_ready(xs)

    def step_track(carry):
        rs = rs0 if carry is None else carry
        tr = pd.track(xs, rs, cfg.sync, cfg.thresh, bf16=True)
        return tr["freq_error"], (rs0 + 0 * tr["k_sync"]) % N

    s = _timed_chain(step_track)
    print(json.dumps({"kernel": "track bf16", "cfg": tag,
                      "ms": round(s * 1e3, 3),
                      "Gsamp/s": round(B * pd.N_TRACK_WIN * N / s / 1e9, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
