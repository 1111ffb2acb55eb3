"""Fused Pallas filterbank (ops/pallas_channelize) parity vs the XLA
channelizer pipeline: same prototype, same block-Toeplitz contraction,
flip folded into the matrix — outputs must agree to f32 summation-order
tolerance, and the streaming state path is shared (identical by
construction, asserted once).

Hardware (Mosaic) parity for the compiled kernel is covered by
tools/tpu_smoke.py; these tests pin value semantics in interpret mode on
the CPU tier.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lora_tpu.ops import channelizer as chz
from lora_tpu.ops import cplx
from lora_tpu.ops.cplx import IQ
from lora_tpu.ops.pallas_channelize import kernel_geometry


def _rand_iq(rng, shape):
    return IQ(
        jnp.asarray(rng.standard_normal(shape), jnp.float32),
        jnp.asarray(rng.standard_normal(shape), jnp.float32),
    )


def _parity_case(rng, K, M, S, bf16=False):
    T = K * M
    x = _rand_iq(rng, (S, T)) if S else _rand_iq(rng, (T,))
    st_shape = (S, 8 * K - 1) if S else (8 * K - 1,)
    st = _rand_iq(rng, st_shape)
    y0, s0 = chz.channelize(x, K, state=st, impl="xla")
    y1, s1 = chz.channelize(
        x, K, state=st, impl="pallas-interpret", bf16=bf16
    )
    assert y1.re.shape == y0.re.shape
    np.testing.assert_array_equal(np.asarray(s0.re), np.asarray(s1.re))
    np.testing.assert_array_equal(np.asarray(s0.im), np.asarray(s1.im))
    err = np.maximum(
        np.abs(np.asarray(y0.re - y1.re)), np.abs(np.asarray(y0.im - y1.im))
    )
    return float(err.max())


def test_filterbank_kernel_parity_small(rng):
    # K=16 -> G=32: one grid row per stream, M=48 not divisible by the
    # kernel group (pads internally, output sliced)
    assert kernel_geometry(16, 8) == (32, 512)
    assert _parity_case(rng, K=16, M=48, S=2) < 1e-5


@pytest.mark.slow
def test_filterbank_kernel_parity_k64(rng):
    # the config-3 geometry (K=64, G=8) across a tile seam (Q > TQ)
    assert kernel_geometry(64, 8) == (8, 512)
    assert _parity_case(rng, K=64, M=160, S=2) < 1e-5


@pytest.mark.slow
def test_filterbank_kernel_parity_bf16(rng):
    # bf16 MXU mode: ~3 significant digits, same contract as
    # channelize(bf16=True) on the XLA path
    assert _parity_case(rng, K=16, M=48, S=1, bf16=True) < 3e-2


def test_kernel_geometry_gates():
    # too-wide segments (K*G > 1024) and too-long prototypes fall back
    assert kernel_geometry(256, 8) is None   # G = L-1 = 7 -> SEG = 1792
    assert kernel_geometry(128, 8) == (7, 896)   # G = L-1 dominates
    assert kernel_geometry(64, 8) == (8, 512)
    # forcing the kernel on an unsupported geometry raises
    x = cplx.zeros((256 * 8,))
    with pytest.raises(ValueError):
        chz.channelize(x, 256, impl="pallas")


@pytest.mark.slow
def test_filterbank_streaming_continuity_through_kernel(rng):
    # chunked kernel calls with carried state == one-shot kernel call
    K, M = 16, 64
    x = _rand_iq(rng, (K * M,))
    y_full, _ = chz.channelize(x, K, impl="pallas-interpret")
    state = None
    outs = []
    half = K * M // 2
    for lo in (0, half):
        y, state = chz.channelize(
            x[lo : lo + half], K, state=state, impl="pallas-interpret"
        )
        outs.append(np.asarray(cplx.to_complex(y)))
    y_chunked = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(y_full)), y_chunked, atol=1e-6
    )

# ---- factorized FIR + IDFT kernel (round-5) ------------------------------

def _fir_parity_case(rng, K, M, S, bf16=False):
    T = K * M
    x = _rand_iq(rng, (S, T)) if S else _rand_iq(rng, (T,))
    st_shape = (S, 8 * K - 1) if S else (8 * K - 1,)
    st = _rand_iq(rng, st_shape)
    y0, s0 = chz.channelize(x, K, state=st, impl="xla")
    y1, s1 = chz.channelize(
        x, K, state=st, impl="fir-interpret", bf16=bf16
    )
    assert y1.re.shape == y0.re.shape
    np.testing.assert_array_equal(np.asarray(s0.re), np.asarray(s1.re))
    np.testing.assert_array_equal(np.asarray(s0.im), np.asarray(s1.im))
    err = np.maximum(
        np.abs(np.asarray(y0.re - y1.re)), np.abs(np.asarray(y0.im - y1.im))
    )
    return float(err.max())


def test_fir_filterbank_parity_k64(rng):
    """The factorized kernel (per-lane FIR + transposed IDFT, channel-
    major output) matches the XLA pipeline at the config-3 geometry,
    including a tile seam (M > TM after padding) and the M % TM pad."""
    from lora_tpu.ops.pallas_channelize import fir_geometry

    assert fir_geometry(64, 8)
    assert _fir_parity_case(rng, K=64, M=48, S=2) < 1e-5


@pytest.mark.slow
def test_fir_filterbank_parity_tile_seam(rng):
    # M = 520 > TM = 512: second grid column + output pad slice
    assert _fir_parity_case(rng, K=64, M=520, S=1) < 1e-5


@pytest.mark.slow
def test_fir_filterbank_parity_k128_bf16(rng):
    from lora_tpu.ops.pallas_channelize import fir_geometry

    assert fir_geometry(128, 8)
    assert _fir_parity_case(rng, K=128, M=40, S=1) < 1e-5
    assert _fir_parity_case(rng, K=64, M=48, S=1, bf16=True) < 3e-2


def test_fir_geometry_gates():
    from lora_tpu.ops.pallas_channelize import fir_geometry

    assert not fir_geometry(16, 8)    # lanes too narrow: dense kernel
    assert not fir_geometry(96, 8)    # K % 64 != 0
    assert not fir_geometry(512, 8)   # constants past the VMEM gate
    assert not fir_geometry(64, 9)    # taps past the 8-row constant block
    assert not fir_geometry(64, 12)   # FIR history > one lookahead block
    # auto must ROUTE AROUND the unsupported L, not raise (the dense
    # kernel / XLA pipeline still handle it)
    y, _ = chz.channelize(cplx.zeros((64 * 16,)), 64, taps_per_phase=9)
    assert y.re.shape == (64, 16)
    x = cplx.zeros((16 * 8,))
    with pytest.raises(ValueError):
        chz.channelize(x, 16, impl="fir")


@pytest.mark.slow
def test_fir_filterbank_streaming_continuity(rng):
    K, M = 64, 64
    x = _rand_iq(rng, (K * M,))
    y_full, _ = chz.channelize(x, K, impl="fir-interpret")
    state = None
    outs = []
    half = K * M // 2
    for lo in (0, half):
        y, state = chz.channelize(
            x[lo : lo + half], K, state=state, impl="fir-interpret"
        )
        outs.append(np.asarray(cplx.to_complex(y)))
    y_chunked = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(
        np.asarray(cplx.to_complex(y_full)), y_chunked, atol=1e-6
    )
