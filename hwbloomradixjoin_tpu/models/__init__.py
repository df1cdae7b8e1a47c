"""Join algorithm families (the reference's algos[] registry, re-designed).

Reference algorithms (src/main.c:331-339):
    PRO, RJ, PRH, PRHO  — parallel radix joins (parallel_radix_join.c)
    NPO, NPO_st         — non-partitioned shared-table joins
and a bloom twin of each (BPRO/BRJ/BPRH/BPRHO, parallel_radix_join_bloom.c).

Each algorithm here has up to three execution tiers:
- `xla`:    portable jnp/lax formulation (any backend; correctness baseline)
- `pallas`: TPU kernels (ops/radix.py) — the fast path
- distributed SPMD wrappers live in hwbloomradixjoin_tpu/parallel/
"""

from hwbloomradixjoin_tpu.models.registry import ALGORITHMS, run_join

__all__ = ["ALGORITHMS", "run_join"]
