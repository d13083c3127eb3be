"""The averager variant zoo: the reference's nine binaries as one registry.

Maps every reference executable (SURVEY.md §0 census) to its TPU-native
equivalent, with the architectural correspondence recorded. Used by the
sweep driver and by docs; `run_variant` is the single entry point.

| reference binary (basics/)            | zoo key       | TPU realization |
|---------------------------------------|---------------|-----------------|
| profilable_moving_averager.cpp        | golden_cpu    | NumPy oracle (+ native C++ baseline binary) |
| profilable_parallel_averager.cu       | xla_direct    | lax.reduce_window (compiler-scheduled naive) |
| profilable_sm_averager.cu             | direct        | Pallas VMEM-tile k-shifted-adds |
| profilable_sm_vload2.cu               | direct        | same kernel — (8,128) layout subsumes int2 |
| profilable_sm_vload4.cu               | direct        | same kernel — (8,128) layout subsumes int4 |
| hillis_steele_averager.cu             | scan_hillis   | Pallas stride-doubling segmented scan |
| hillis_steele_vloaded_averager.cu     | scan_hillis   | same kernel — vectorization is the default |
| blelloch_scan_averager.cu             | scan          | Pallas work-efficient two-level scan |
| blelloch_scan_vloaded_averager.cu     | scan          | same kernel |

The int2/int4 "vload" rungs and the vectorized scan rungs collapse: on TPU
the register file is always (sublanes x 128 lanes), so the vectorized load
ladder has no separate existence (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class VariantInfo:
    key: str
    method: str  # ops.moving_average method name
    reference_files: tuple[str, ...]
    work: str  # asymptotic work per element
    regime: str  # where it wins


AVERAGER_ZOO: dict[str, VariantInfo] = {
    v.key: v
    for v in [
        VariantInfo(
            "golden_cpu",
            "golden",
            ("basics/profilable_moving_averager.cpp",),
            "O(1) sliding",
            "host baseline / semantic oracle",
        ),
        VariantInfo(
            "xla_direct",
            "xla_direct",
            ("basics/profilable_parallel_averager.cu",),
            "O(k)",
            "tiny windows, zero kernel-engineering",
        ),
        VariantInfo(
            "direct",
            "direct",
            (
                "basics/profilable_sm_averager.cu",
                "basics/profilable_sm_vload2.cu",
                "basics/profilable_sm_vload4.cu",
            ),
            "O(k)",
            "small windows (memory-latency regime, README.md:10-12)",
        ),
        VariantInfo(
            "scan_hillis",
            "scan_hillis",
            (
                "basics/hillis_steele_averager.cu",
                "basics/hillis_steele_vloaded_averager.cu",
            ),
            "O(log n) passes, O(n log n) work",
            "ladder rung: demonstrates work-inefficiency cost",
        ),
        VariantInfo(
            "scan",
            "scan",
            (
                "basics/blelloch_scan_averager.cu",
                "basics/blelloch_scan_vloaded_averager.cu",
            ),
            "O(log) passes, O(n) work",
            "large windows (compute regime); the flagship",
        ),
        VariantInfo(
            "xla_scan",
            "xla_scan",
            (),
            "compiler-chosen scan",
            "correctness anchor / any channel count",
        ),
    ]
}


def run_variant(key: str, x, window: int, channels: int = 1, **kw):
    from ..ops import moving_average

    if key not in AVERAGER_ZOO:
        raise KeyError(f"unknown variant {key!r}; options {sorted(AVERAGER_ZOO)}")
    return moving_average(x, window, channels, method=AVERAGER_ZOO[key].method, **kw)
