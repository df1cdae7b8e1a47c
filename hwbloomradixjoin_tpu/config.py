"""Runtime configuration.

The reference splits configuration across four levels (CLI getopt, autotools
-D defines, header constants rewritten + recompiled by measurements/config.py,
and runtime files).  Here everything is a runtime dataclass whose fields become
jit-static arguments — no recompilation of source, only XLA retraces.

Key parameters mirrored from the reference:
- NUM_RADIX_BITS / NUM_PASSES (src/prj_params.h:15-22) -> RadixConfig
- bloom_filter_args_t {variant, m, k, B} (src/bloom_filter.h:52-57) -> BloomArgs
  with the reference CLI defaults m=256Mb, k=8, B=1024 (src/main.c:388-394)
"""

from __future__ import annotations

import dataclasses
import enum


class BloomVariant(enum.Enum):
    BASIC = "basic"
    BLOCKED = "blocked"


@dataclasses.dataclass(frozen=True)
class BloomArgs:
    """Bloom filter geometry (reference bloom_filter_args_t).

    m and B must be powers of two and m a multiple of B
    (assert_args, src/bloom_filter.c:25-34).
    """

    variant: BloomVariant = BloomVariant.BASIC
    m: int = 256 << 20  # filter size in bits
    k: int = 8          # probes per key
    B: int = 1024       # block size in bits (blocked variant)
    seed: int = 42      # filter hash seed (join_init_run uses 42,
                        # parallel_radix_join_bloom.c:1583)

    def __post_init__(self):
        if self.m & (self.m - 1):
            raise ValueError("m must be a power of 2")
        if self.variant == BloomVariant.BLOCKED:
            if self.B & (self.B - 1):
                raise ValueError("B must be a power of 2")
            if self.m % self.B:
                raise ValueError("m must be a multiple of B")

    @property
    def nblocks(self) -> int:
        return self.m // self.B


@dataclasses.dataclass(frozen=True)
class RadixConfig:
    """Radix partitioning geometry.

    The reference uses NUM_RADIX_BITS total over NUM_PASSES passes with
    cache-geometry-derived padding (src/prj_params.h).  On TPU the analogous
    constraint is VMEM: per-pass fanout is bounded so per-tile run buffers and
    per-partition build tables fit VMEM, and partitions are capacity-padded
    (pad_frac) because XLA shapes are static.
    """

    # total partition bits (2^bits partitions); None = the engine derives the
    # minimum fan-out the key range forces (ops/bitmap_join.plan_geometry) —
    # an explicit value sweeps the kernel like the reference's NUM_RADIX_BITS
    num_radix_bits: int | None = None
    bits_per_pass: int = 7        # fanout per pass = 2^bits_per_pass
    pad_frac: float = 0.30        # per-partition capacity headroom over mean
    tile: int = 2048              # tuples per kernel tile
    use_pallas: bool = True       # Pallas kernels vs XLA reference path

    @property
    def fanout(self) -> int:
        return 1 << (self.num_radix_bits or 0)

    @property
    def num_passes(self) -> int:
        return -(-(self.num_radix_bits or 0) // self.bits_per_pass)

    def pass_bits(self) -> list[int]:
        """Bits consumed by each pass, MSB-first partitioning."""
        bits = []
        rem = self.num_radix_bits or 0
        while rem > 0:
            b = min(self.bits_per_pass, rem)
            bits.append(b)
            rem -= b
        return bits


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Top-level engine configuration."""

    radix: RadixConfig = dataclasses.field(default_factory=RadixConfig)
    key8b: bool = False
    materialize: bool = False      # JOIN_RESULT_MATERIALIZE equivalent
    skew_handling: bool = True     # heavy-partition splitting from histogram
    sync_stats: bool = False       # per-phase timing stats (SYNCSTATS analog)
    interpret: bool = False        # run Pallas kernels in interpreter mode
    allow_dense: bool = True       # planner may take the dense-PK fast path
