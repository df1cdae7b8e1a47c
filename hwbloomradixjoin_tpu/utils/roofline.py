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


# Measured VPU cost model for data-dependent routing on this hardware,
# recalibrated round 5 (tools/part_bench.py, v5e): the bit-serial split
# network costs ~0.185 ns/elem per routed bit after the round-5 rewrite
# (category recomputed per bit instead of routed; displacement+liveness
# packed into one int32 — ops/radix.py _pack/split_chunk); the live/dead
# compaction pass (ONE pack network) ~0.10 ns/elem; the VMEM slice probe
# ladder ~0.10 + 0.004*sl_rows ns/elem; the MXU bit-deposit ~0.5 ns/elem
# on top of R's split.  These are cost-model PREDICTIONS (report()
# prints measured/predicted as "model"); only the HBM roofline is
# reported as attainment.
SPLIT_NS_PER_ELEM_BIT = 0.185
COMPACT_NS_PER_ELEM = 0.10
LADDER_NS_BASE = 0.10
LADDER_NS_PER_ROW = 0.004
DEPOSIT_NS = 0.5           # MXU bit-deposit: one-hot build + 2 matmuls/row


@dataclasses.dataclass
class OpCost:
    """Analytic cost of one operator invocation."""

    name: str
    bytes_hbm: int           # HBM bytes read + written
    flops: int = 0
    elems: int = 0
    vpu_s: float = 0.0       # measured-model VPU-bound seconds (0 = none)

    def hbm_bound_s(self, chip: ChipModel) -> float:
        return self.bytes_hbm / (chip.hbm_gbps * 1e9)

    def bound_s(self, chip: ChipModel) -> float:
        """The binding bound: the slower of HBM and the VPU routing model."""
        return max(self.hbm_bound_s(chip), self.vpu_s)

    def attainment(self, measured_s: float, chip: ChipModel) -> float:
        """HBM-roofline attainment — a true hardware bound, so this is
        always <= 1 up to timer noise.  (The VPU cost model is NOT a
        bound — it is a prediction, reported separately as model_ratio;
        round 3 conflated the two and printed 221% 'attainment'.)"""
        bound = self.hbm_bound_s(chip)
        return bound / measured_s if measured_s > 0 else 0.0

    def model_ratio(self, measured_s: float) -> float:
        """Measured time / cost-model prediction (1.0 = model exact;
        <1 means the model over-predicts cost and needs recalibration)."""
        pred = self.vpu_s
        return measured_s / pred if pred > 0 else 0.0


def join_costs(n_r: int, n_s: int, passes: int = 0, tuple_bytes: int = 8,
               count_only: bool = True, part_bits: int = 0,
               sl_rows: int = 0, s_live: int | None = None) -> dict:
    """Byte + VPU accounting for the join phases (per chip).

    partition: each pass streams the relation in and out (2x) and pays the
    split-network VPU cost for its radix bits (+1 pad category bit);
    probe: reads the live (in-range) S rows and the bitmap once, and pays
    the slice-ladder VPU cost — s_live defaults to all of S, but under
    selectivity q the partition's fused range prune drops out-of-range
    keys before the probe ever sees them.
    """
    kb = 4 if count_only else tuple_bytes
    if s_live is None:
        s_live = n_s
    split_s = (part_bits + 1) * SPLIT_NS_PER_ELEM_BIT * 1e-9 if part_bits \
        else 0.0
    ladder_s = (LADDER_NS_BASE + LADDER_NS_PER_ROW * sl_rows) * 1e-9 \
        if sl_rows else 0.0
    # survivor compaction (plan_radix_join): when most of S is out of
    # range, pass 0 compacts at COMPACT_NS and the split bits stream only
    # the survivors
    if s_live < n_s // 2:
        part_s_vpu = (n_s * COMPACT_NS_PER_ELEM * 1e-9
                      + s_live * split_s) * max(passes, 1)
        part_s_bytes = (2 * n_s + 2 * s_live) * kb * passes
    else:
        part_s_vpu = n_s * split_s * passes
        part_s_bytes = 2 * passes * n_s * kb
    return {
        "partition_R": OpCost("partition_R", 2 * passes * n_r * kb,
                              elems=n_r, vpu_s=n_r * split_s * passes),
        "partition_S": OpCost("partition_S", part_s_bytes,
                              elems=n_s, vpu_s=part_s_vpu),
        # build = partition R + MXU bit deposit (one-hot matmuls); the
        # deposit's VPU side is the one-hot construction (~2 ops/elem
        # per lane of the compare matrices, measured with the kernel)
        "build": OpCost("build", 2 * passes * n_r * kb + n_r // 8,
                        elems=n_r,
                        vpu_s=n_r * (split_s * passes + DEPOSIT_NS * 1e-9)),
        "probe": OpCost("probe", s_live * kb + n_r * kb, elems=s_live,
                        vpu_s=s_live * ladder_s),
        "dense_count": OpCost("dense_count", n_s * tuple_bytes, elems=n_s),
    }


def report(measured: dict[str, float], costs: dict[str, OpCost],
           chip: ChipModel | None = None) -> str:
    """Render the per-op table: HBM attainment + VPU cost-model ratio.

    HBM% is attainment against the only true hardware bound (<=100% by
    construction); model x is measured/predicted for the measured VPU
    routing model — a calibration check, not a bound (it replaces round
    3's ">100% attainment" lines, which treated the model as a bound).
    """
    chip = chip or DEFAULT
    lines = [f"roofline ({chip.name}, {chip.hbm_gbps:.0f} GB/s HBM):"]
    for name, secs in measured.items():
        c = costs.get(name)
        if c is None or secs <= 0:
            continue
        att = c.attainment(secs, chip)
        gbs = c.bytes_hbm / secs / 1e9
        rate = c.elems / secs / 1e9 if c.elems else 0.0
        mr = c.model_ratio(secs)
        mtxt = f"model {mr:4.2f}x" if mr else "model   -  "
        lines.append(f"  {name:14s} {secs*1e3:9.2f} ms  {gbs:7.1f} GB/s "
                     f"{rate:7.2f} G rows/s  hbm {att*100:5.1f}%  {mtxt}")
    return "\n".join(lines)
