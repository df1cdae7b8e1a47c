"""Roofline accounting — the TPU replacement for hardware perf counters.

The reference attributes cycles to memory levels with perf_event/Intel PCM
(src/perf_manager.c, src/perf_counters.c); on TPU the equivalent first-order
model is analytic: every operator's bytes-moved and flops are known exactly,
so attainment = achieved-throughput / min(HBM-bound, compute-bound).

Chip models cover the pod-slice generations the engine targets; numbers are
public peak specs.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipModel:
    name: str
    hbm_gbps: float          # HBM bandwidth, GB/s
    bf16_tflops: float
    int8_tops: float
    vmem_mib: int
    hbm_gib: int


CHIPS = {
    "TPU v5 lite": ChipModel("v5e", 819.0, 197.0, 394.0, 128, 16),
    "TPU v4": ChipModel("v4", 1228.0, 275.0, 275.0, 128, 32),
    "TPU v5p": ChipModel("v5p", 2765.0, 459.0, 918.0, 128, 95),
}
DEFAULT = CHIPS["TPU v5 lite"]


def chip_model(device=None) -> ChipModel:
    if device is None:
        import jax
        device = jax.devices()[0]
    return CHIPS.get(getattr(device, "device_kind", ""), DEFAULT)


@dataclasses.dataclass
class OpCost:
    """Analytic cost of one operator invocation."""

    name: str
    bytes_hbm: int           # HBM bytes read + written
    flops: int = 0
    elems: int = 0

    def hbm_bound_s(self, chip: ChipModel) -> float:
        return self.bytes_hbm / (chip.hbm_gbps * 1e9)

    def attainment(self, measured_s: float, chip: ChipModel) -> float:
        bound = self.hbm_bound_s(chip)
        return bound / measured_s if measured_s > 0 else 0.0


def join_costs(n_r: int, n_s: int, passes: int = 0, tuple_bytes: int = 8,
               count_only: bool = True) -> dict:
    """Byte accounting for the join phases (per chip).

    partition: each pass streams the relation in and out (2x);
    probe: reads S keys (+payloads if materializing) and R once.
    """
    kb = 4 if count_only else tuple_bytes
    return {
        "partition_R": OpCost("partition_R", 2 * passes * n_r * kb, elems=n_r),
        "partition_S": OpCost("partition_S", 2 * passes * n_s * kb, elems=n_s),
        "probe": OpCost("probe", n_s * kb + n_r * kb, elems=n_s),
        "dense_count": OpCost("dense_count", n_s * tuple_bytes, elems=n_s),
    }


def report(measured: dict[str, float], costs: dict[str, OpCost],
           chip: ChipModel | None = None) -> str:
    """Render an attainment table: measured vs HBM-roofline per op."""
    chip = chip or DEFAULT
    lines = [f"roofline attainment ({chip.name}, {chip.hbm_gbps:.0f} GB/s HBM):"]
    for name, secs in measured.items():
        c = costs.get(name)
        if c is None or secs <= 0:
            continue
        att = c.attainment(secs, chip)
        gbs = c.bytes_hbm / secs / 1e9
        rate = c.elems / secs / 1e9 if c.elems else 0.0
        lines.append(f"  {name:14s} {secs*1e3:9.2f} ms  {gbs:7.1f} GB/s "
                     f"{rate:7.2f} G rows/s  attainment {att*100:5.1f}%")
    return "\n".join(lines)
