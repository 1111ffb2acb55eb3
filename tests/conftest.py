"""Test harness: run everything on a virtual 8-device CPU mesh so that the
sharded paths are exercised without TPU hardware.

The image preimports jax via sitecustomize and pins ``jax_platforms`` to
"axon,cpu" (one real TPU through a tunnel), so env vars alone don't switch
platforms — we must update the jax config before the first backend use.
Keeping tests off the TPU also avoids serializing the whole suite through
the single TPU grant.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x10A4)


# ---------------------------------------------------------------------------
# Default-fast CI profile (VERDICT r2 weak #6: suite wall time).
#
# The heavyweight tier — interpret-mode full-demod parity, the compiled-
# reference oracle tier, multi-process jax.distributed launches, soak
# loops, and the interior of the big parameter sweeps — is marked `slow`
# and excluded by default (pyproject addopts -m "not slow").  Every
# assertion stays reachable:
#
#     pytest -q              # fast profile (< 8 min, one core)
#     pytest -q -m slow      # the heavy tier only
#     pytest -q -m ""        # everything
#
# Selection principle: the default profile keeps at least one test of
# every tier (codec goldens, detector sweep, kernel parity per route,
# loopback at the reference operating point, channelizer, streaming,
# sharding, soft decode + its guard) and pushes redundant parametrizations
# and the multi-minute cross-checks to `slow`.  Hardware parity for the
# Pallas kernels is additionally covered on every runbook run by
# tools/tpu_smoke.py (bit-exact on the real chip).
_SLOW_TESTS = {
    # interpret-mode full-demod / kernel cross-checks (minutes each)
    "test_fused_demod_bit_identical_sf7",
    "test_fused_demod_multiframe",
    "test_track_direct_matches_gather_plus_track",
    "test_payload_direct_matches_gather_plus_flat[512-40-6]",
    "test_payload_kernel_matches_shift_plus_detect[512-136-False]",
    "test_payload_kernel_bf16_same_decisions[1024-20]",
    "test_pallas_parity_vs_reference_path[4096]",
    # soft-decode: keep 4/8 (the operating point) + the guard; the other
    # coding rates' ML LUTs are exercised in -m slow
    "test_spectra_mode_is_lean_debug",
    "test_soft_matches_hard_on_clean_frames[7-4/5-False]",
    "test_soft_matches_hard_on_clean_frames[7-4/6-False]",
    "test_soft_matches_hard_on_clean_frames[7-4/7-False]",
    "test_soft_matches_hard_on_clean_frames[7-4/4-False]",
    "test_soft_matches_hard_on_clean_frames[7-4/8-True]",
    "test_soft_beats_hard_in_fec_limited_noise",
    # loopback duplicates (SF7/SF10/SF12 + impairments stay default)
    "test_clean_loopback_all_sf[6]",
    "test_clean_loopback_all_sf[8]",
    "test_clean_loopback_all_sf[9]",
    "test_loopback_configurable_preamble_length[80]",
    # detector sweeps at the biggest N (SF7-10 stay default)
    "test_detector_full_symbol_sweep[11]",
    "test_detector_full_symbol_sweep[12]",
    # streaming/dispatch/CLI heavies with lighter default-profile twins
    "test_stream_soak_random_traffic",
    "test_live_tap_view_observer",
    "test_dispatcher_soft_mode_recovers_weak_channel",
    "test_cli_tx_then_replay",
    "test_cli_loopback_noisy",
    "test_graft_entry_and_dryrun",
    "test_time_sharded_stream_boundary_frames[4]",
    "test_resample_stream_bitexact_vs_full",
    "test_lora_frame_through_channelizer[3]",
    "test_mixed_sf_channel_groups",
    "test_replay_fractional_capture_rate",
    "test_dc_spike_blocked_end_to_end",
}
_SLOW_MODULES = {
    # the compiled-reference oracle tier and the real 2-process
    # jax.distributed tier (VERDICT r2's prescribed slow marks)
    "test_demod_oracle",
    "test_multiprocess",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (
            item.name in _SLOW_TESTS
            or item.module.__name__ in _SLOW_MODULES
        ):
            item.add_marker(pytest.mark.slow)
        elif item.function.__name__ == "test_encoder_to_decoder_sweep":
            # full SF7-12 x CR sweep in -m slow; the default cross keeps
            # every SF (at 4/8) and every CR (at SF7)
            p = item.callspec.params
            if p["sf"] != 7 and p["cr"] != "4/8":
                item.add_marker(pytest.mark.slow)
