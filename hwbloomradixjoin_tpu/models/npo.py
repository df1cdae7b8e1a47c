"""NPO / NPO_st — non-partitioned ("hardware-oblivious") hash join.

The reference builds one shared bucket-chained hash table over all of R
(BUCKET_SIZE=2 buckets with per-bucket spinlatches, overflow chains;
no_partitioning_join.c:182-210, 432-488) and probes it from all threads
(:279-330).  TPU-native equivalent: a deterministic CSR bucket table (sort by
bucket + prefix offsets — no latches to take) probed with a bounded dense
window per S tuple.  NPO_st is the same program pinned to one device; NPO's
multi-device form lives in parallel/dist_join.py.

True to the paper's framing, this is the hardware-oblivious baseline: probes
issue random gathers against an HBM-resident table rather than staging
through VMEM; the radix family is the hardware-conscious fast path.
"""

from __future__ import annotations

import jax.numpy as jnp

from hwbloomradixjoin_tpu.ops import xla_join


def npo_count(r_key, r_pay, s_key, s_pay, max_bucket: int = 12):
    """Join count + checksums via the shared CSR hash table."""
    cnt, sr, ss, overflow = xla_join.csr_hash_join_count(
        r_key, r_pay, s_key, s_pay, max_bucket=max_bucket)
    # On overflow the windowed probe undercounts; surface a poisoned count so
    # validation fails loudly rather than silently (callers can re-run with a
    # larger window).  Uniform unique-key workloads never overflow at ~2
    # tuples/bucket with max_bucket=12.
    cnt = jnp.where(overflow, jnp.int32(-1), cnt)
    return cnt, sr, ss
