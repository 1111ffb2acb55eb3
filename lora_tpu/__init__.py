"""lora_tpu — a TPU-native LoRa PHY framework (JAX / XLA / Pallas).

Array-first re-design of the capabilities of myriadrf/LoRa-SDR: batched
encode/modulate/demodulate/decode over channel banks sharded across a TPU
mesh, with the per-symbol dechirp+FFT+argmax fused into MXU-friendly kernels
and the bit-domain codecs vectorized as integer LUT ops.
"""

from .config import LoRaConfig, CODING_RATES

__version__ = "0.1.0"

__all__ = ["LoRaConfig", "CODING_RATES"]


def __getattr__(name):
    # Lazy top-level API to keep `import lora_tpu` light.
    if name in ("encode", "decode", "decode_soft", "soft_symbols",
                "modulate", "demodulate",
                "DecodeResult", "DemodResult", "IQ", "loopback",
                "required_samples", "extract_payloads"):
        from . import api

        return getattr(api, name)
    if name in ("debug_checks", "DemodCheckError"):
        from .utils import debugcheck

        return getattr(debugcheck, name)
    if name in ("parallel", "runtime", "api", "models", "ops", "sim",
                "utils", "hw"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
