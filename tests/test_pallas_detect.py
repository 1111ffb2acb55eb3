"""Fused Pallas detector kernel vs the XLA reference path (interpret mode
on CPU; the same kernel was verified bit-identical on real TPU hardware).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lora_tpu.ops import chirp, cplx, detect, pallas_detect


def _windows(rng, N, B, noise=0.05):
    syms = rng.integers(0, N, B)
    win = jax.vmap(
        lambda s: chirp.gen_chirp(s, N, ampl=1.0, phase0_turns=0.3)[0]
    )(jnp.asarray(syms))
    nz = noise * (rng.standard_normal((B, N)) + 1j * rng.standard_normal((B, N)))
    return syms, cplx.IQ(
        win.re + jnp.asarray(nz.real, jnp.float32),
        win.im + jnp.asarray(nz.imag, jnp.float32),
    )


@pytest.mark.parametrize("N", [128, 256, 1024, 4096])
def test_pallas_parity_vs_reference_path(N, rng):
    # 4096 covers the widest four-step unroll (n2 = 32; the SF12 coarse
    # path) with a small batch to keep interpret mode affordable
    syms, x = _windows(rng, N, 37 if N < 4096 else 9)
    ref = detect.dechirp_detect(x, fft_impl="xla")
    pal = pallas_detect.dechirp_detect_pallas(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.value), np.asarray(pal.value))
    np.testing.assert_array_equal(np.asarray(ref.value), syms)
    np.testing.assert_allclose(
        np.asarray(ref.power), np.asarray(pal.power), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ref.noise), np.asarray(pal.noise), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(ref.f_index), np.asarray(pal.f_index), atol=2e-3
    )


def test_pallas_ferr_and_down(rng):
    N = 256
    syms, x = _windows(rng, N, 16)
    ref = detect.dechirp_detect(x, ferr=1.5, fft_impl="xla")
    pal = pallas_detect.dechirp_detect_pallas(x, ferr=1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.value), np.asarray(pal.value))
    # down-chirp table variant
    refd = detect.dechirp_detect(x, down=True, fft_impl="xla")
    pald = pallas_detect.dechirp_detect_pallas(x, down=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(refd.value), np.asarray(pald.value))


def test_pallas_leading_axes_and_padding(rng):
    # [3, 5, N] windows, 15 % TW != 0 exercises the pad path
    N = 128
    _, x = _windows(rng, N, 15)
    x3 = x.reshape(3, 5, N)
    ref = detect.dechirp_detect(x3, fft_impl="xla")
    pal = pallas_detect.dechirp_detect_pallas(x3, interpret=True)
    assert pal.value.shape == (3, 5)
    np.testing.assert_array_equal(np.asarray(ref.value), np.asarray(pal.value))
