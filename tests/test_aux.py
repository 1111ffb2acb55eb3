"""Auxiliary subsystems: tracing hooks, frame event records, multihost
helpers (single-process behavior), packaging surface."""

import numpy as np
import jax
import jax.numpy as jnp

from lora_tpu import api
from lora_tpu.config import LoRaConfig


def test_frame_events_and_profile_hook(tmp_path, rng):
    from lora_tpu.utils.trace import frame_events, profile

    cfg = LoRaConfig(sf=7, cr="4/8", ampl=1.0)
    cfg = cfg.replace(mtu=cfg.num_symbols(4) + 2)
    p = rng.integers(0, 256, (2, 4)).astype(np.uint8)
    with profile(None):  # disabled path
        dem = api.demodulate(api.modulate(api.encode(jnp.asarray(p), cfg), cfg), cfg)
    ev = frame_events(dem, cfg)
    assert len(ev) == 2
    assert ev[0]["t_preamble"] == 0 and ev[0]["event"] == "frame"
    assert ev[1]["channel"] == 1
    # enabled path must not break even if the backend cannot trace
    with profile(str(tmp_path / "trace")):
        _ = api.encode(jnp.asarray(p), cfg)


def test_multihost_helpers_single_process():
    from lora_tpu.parallel import multihost

    mesh = multihost.global_mesh(time=2)
    assert mesh.shape["time"] == 2
    a, b = multihost.local_time_range(mesh, 16384)
    assert (a, b) == (0, 16384)  # single process owns everything
    from jax.sharding import PartitionSpec as P

    arr = multihost.host_array(
        (4, 16), np.arange(64, dtype=np.float32).reshape(4, 16), mesh,
        P(None, "time"),
    )
    assert arr.shape == (4, 16)


def test_top_level_lazy_exports():
    import lora_tpu

    assert callable(lora_tpu.encode)
    assert lora_tpu.IQ is not None
    assert hasattr(lora_tpu.parallel, "make_mesh")
    assert hasattr(lora_tpu.runtime, "StreamDemodulator")
