"""Peak FLOPs / HBM bandwidth per TPU generation, for MFU & roofline math.

Public spec-sheet numbers (per chip): bf16 matmul peak and HBM bandwidth.
Used by tools/mfu_probe.py and bench.py to report achieved vs peak.
"""

import jax

# device_kind substring -> (peak bf16 FLOP/s, HBM bytes/s)
_PEAKS = (
    ("v5 lite", (197e12, 819e9)),   # v5e
    ("v5e", (197e12, 819e9)),
    ("v5p", (459e12, 2765e9)),
    ("v4", (275e12, 1228e9)),
    ("v3", (123e12, 900e9)),
    ("v6", (918e12, 1640e9)),       # v6e (Trillium)
)


def device_peaks(device=None):
    """(peak bf16 FLOP/s, peak HBM bytes/s) for `device` (default: devices()[0]).

    Unknown kinds (e.g. the CPU test backend) fall back to v5e numbers so
    ratios stay computable; callers that care should check device_kind.
    """
    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, peaks in _PEAKS:
        if key in kind:
            return peaks
    return 197e12, 819e9
