"""Hardware-control utilities (serial radios, SDR capture).

Optional-dependency layer: pyserial / SoapySDR are imported lazily and a
clear error raised when absent, so the compute framework never depends on
radio hardware being present.
"""

from .rn2483 import RN2483

__all__ = ["RN2483"]
