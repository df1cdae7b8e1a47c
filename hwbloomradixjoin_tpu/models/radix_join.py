"""PRO / PRH / PRHO / RJ — hardware-conscious radix join family.

Reference structure (parallel_radix_join.c): two partitioning passes bound
fan-out to cache/TLB capacity, then per-partition build+probe with three
kernel flavours — PRO bucket-chaining (:255), PRH histogram re-order (:347),
PRHO histogram + SIMD probe (:438); RJ is the single-threaded 2-pass variant.

TPU redesign: partitioning bounds fan-out to VMEM capacity instead of TLB;
per-partition probes are vectorized compares (the VPU *is* PRHO's SIMD probe,
lane-width 128 instead of SSE's 4).  Pointer-based bucket chains (PRO's
next[]/bucket[]) do not map to a vector unit, so all three flavours share the
partition-to-VMEM pipeline and differ in the inner probe kernel strategy;
the names are kept for CLI/harness parity and select probe-kernel variants in
the Pallas tier.

This module is the portable XLA tier: partition via sort, join via segmented
scan — bitwise-identical results to the Pallas tier, any backend.
"""

from __future__ import annotations

from hwbloomradixjoin_tpu.ops import xla_join


def radix_count(r_key, r_pay, s_key, s_pay, variant: str = "PRO"):
    """Portable radix-join count.

    At the XLA tier, a global sort *is* an exhaustive radix partition (the
    sort groups equal keys exactly as partitioning to singleton granularity
    would), so all variants share sort_scan_count here; `variant` selects
    kernels only in the Pallas tier.
    """
    del variant
    return xla_join.sort_scan_count(r_key, r_pay, s_key, s_pay)
