"""hwbloomradixjoin_tpu — a TPU-native vectorized query-execution engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Briimbo/HwBloomRadixJoin reference suite (hardware-conscious bloom filters for
join acceleration, extending the ETH "mchashjoins" radix-join package):

- multi-pass radix partitioning (histogram + scatter) as Pallas TPU kernels
- hash-join build/probe: partitioned (PRO/PRH/PRHO/RJ) and non-partitioned
  (NPO/NPO_st) variants
- hardware-conscious bloom filters (basic + register-blocked) with exact
  reference hash math (CrapWow, CRC32-C, enhanced double hashing) fused into
  the partitioning passes to prune probe-side tuples early
- radix sort and hash aggregation operators
- deterministic data generators matching the reference key populations
  (threshold-selectivity PK, FK tiling, Zipf)
- SPMD multi-chip execution over a jax.sharding.Mesh: psum histogram exchange,
  all-to-all hash-partition shuffle over ICI, skew-aware repartitioning

Where the reference uses pthreads + NUMA-local task queues + per-bucket
latches (src/parallel_radix_join.c, src/task_queue.h, src/lock.h), this build
uses deterministic SPMD programs: static histogram-driven partition ownership,
XLA collectives, and race-free scatter formulations.
"""

__version__ = "0.1.0"

from hwbloomradixjoin_tpu.types import Relation, JoinResult, key_dtype
from hwbloomradixjoin_tpu.config import BloomArgs, BloomVariant, RadixConfig, EngineConfig

__all__ = [
    "Relation",
    "JoinResult",
    "key_dtype",
    "BloomArgs",
    "BloomVariant",
    "RadixConfig",
    "EngineConfig",
]
