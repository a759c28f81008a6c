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


def device_peaks(device=None, warn=True):
    """(peak bf16 FLOP/s, peak HBM bytes/s) for `device` (default: devices()[0]).

    Unknown kinds (e.g. the CPU test backend) fall back to v5e numbers so
    ratios stay computable — but LOUDLY: some libtpu versions report e.g.
    v5p as just "TPU v5", and silently dividing by the wrong peak would
    overstate MFU ~2.3x (ADVICE r4). Check :func:`peaks_assumed` or the
    stderr warning when consuming the ratios.
    """
    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, peaks in _PEAKS:
        if key in kind:
            return peaks
    if warn and "cpu" not in kind:
        import sys

        print(f"# tpu_peaks: unrecognized device_kind {kind!r}; ASSUMING v5e "
              f"peaks (197 TF/s, 819 GB/s) — MFU/HBM-util ratios may be wrong",
              file=sys.stderr, flush=True)
    return 197e12, 819e9


def peaks_assumed(device=None):
    """True when device_peaks() fell back to assumed v5e numbers."""
    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    return not any(key in kind for key, _ in _PEAKS)
