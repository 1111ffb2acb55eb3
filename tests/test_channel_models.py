"""Channel impairment models: statistical and analytic properties."""

import numpy as np
import jax
import jax.numpy as jnp

from lora_tpu.ops import cplx
from lora_tpu.sim import channel as ch


def test_awgn_statistics():
    x = cplx.zeros((1, 200_000))
    y = ch.awgn(jax.random.PRNGKey(1), x, amplitude=4.0)
    re = np.asarray(y.re)
    im = np.asarray(y.im)
    # NORMAL waveform convention: std = amplitude per I/Q leg
    assert abs(re.std() - 4.0) < 0.05 and abs(im.std() - 4.0) < 0.05
    assert abs(re.mean()) < 0.05 and abs(im.mean()) < 0.05


def test_rotate_preserves_power_and_angle():
    n = np.arange(64)
    x = cplx.from_complex(np.exp(2j * np.pi * 0.05 * n).astype(np.complex64))
    y = ch.rotate(x, np.pi / 3)
    xc, yc = cplx.to_complex(x), cplx.to_complex(y)
    np.testing.assert_allclose(np.abs(yc), np.abs(xc), atol=1e-6)
    ang = np.angle(yc / xc)
    np.testing.assert_allclose(ang, np.pi / 3, atol=1e-5)


def test_cfo_shifts_frequency():
    N = 256
    x = cplx.from_complex(np.ones(4 * N, np.complex64))
    y = cplx.to_complex(ch.cfo(x, 3.0, N))
    spec = np.abs(np.fft.fft(y[:N]))
    assert int(np.argmax(spec)) == 3


def test_time_offset_prepends_zeros():
    x = cplx.from_complex((np.arange(10) + 1).astype(np.complex64))
    y = ch.time_offset(x, 4)
    yc = cplx.to_complex(y)
    assert yc.shape[-1] == 14
    np.testing.assert_array_equal(yc[:4], 0)
    np.testing.assert_array_equal(yc[4:].real, np.arange(10) + 1)
