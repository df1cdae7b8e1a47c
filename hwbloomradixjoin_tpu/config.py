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
    # partition passes (reference NUM_PASSES, prj_params.h:20-22): 1 = one
    # chunk-major Pallas pass; 2 = pass 1 by the high half of the bits, then
    # a per-bucket gather + sub-split pass producing a globally contiguous
    # bucket-major layout (ops/multipass.py)
    passes: int = 1
    use_pallas: bool = True       # Pallas kernels vs XLA reference path

    def split_bits(self, total_bits: int) -> tuple[int, int]:
        """(pass-1 bits, pass-2 bits): high half first, like the reference's
        NUM_RADIX_BITS/NUM_PASSES split (parallel_radix_join.c:1516-1533)."""
        b2 = total_bits // 2
        return total_bits - b2, b2


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
