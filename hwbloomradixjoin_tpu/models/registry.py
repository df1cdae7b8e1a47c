"""Algorithm registry and the join driver.

Mirrors the reference's algos[] table (src/main.c:331-339): six algorithm
names, each with a plain and a bloom entry point (NPO/NPO_st ignore the
filter exactly as the reference's B_NPO wrappers do, main.c:296-312).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hwbloomradixjoin_tpu.config import BloomArgs, EngineConfig
from hwbloomradixjoin_tpu.models import bloom_join, npo, radix_join
from hwbloomradixjoin_tpu.types import JoinResult, Relation
from hwbloomradixjoin_tpu.utils.timing import JoinStats


@dataclasses.dataclass(frozen=True)
class AlgoSpec:
    name: str
    family: str            # "radix" | "npo"
    uses_bloom: bool       # whether the bloom twin actually filters
    single_device: bool    # RJ / NPO_st: pinned single-chip execution


ALGORITHMS = {
    "PRO": AlgoSpec("PRO", "radix", True, False),
    "RJ": AlgoSpec("RJ", "radix", True, True),
    "PRH": AlgoSpec("PRH", "radix", True, False),
    "PRHO": AlgoSpec("PRHO", "radix", True, False),
    "NPO": AlgoSpec("NPO", "npo", False, False),
    "NPO_st": AlgoSpec("NPO_st", "npo", False, True),
}


def _count_fn(spec: AlgoSpec, cfg: EngineConfig,
              bloom_args: Optional[BloomArgs],
              r_stats=None):
    """Return a jittable (rk, rp, sk, sp, chain) -> (count, sr, ss, s_after|-1).

    `chain` is an int32 scalar folded into the result as a no-op (+chain*0):
    threading the previous repeat's count through it serializes repeated
    executions on-device so timing loops measure real work (the remote
    runtime caches identical dispatches) without changing any output.
    """
    use_pallas = cfg.radix.use_pallas and jax.default_backend() == "tpu"
    # Planner: declared dense-PK build side + count-only query -> perfect-hash
    # fast path (ops/dense_join.py).  Bloom twins still report the filter's
    # survivor count (computed with the exact reference filter math) but the
    # join itself needs no filtering — a dense PK probe is already exact.
    dense_ok = (
        r_stats is not None and r_stats.is_dense_pk and not cfg.materialize
        and spec.family == "radix"
    )
    if dense_ok and use_pallas:
        from hwbloomradixjoin_tpu.ops import dense_join
        lo, hi = int(r_stats.min_key), int(r_stats.max_key)
        interp = False

        if bloom_args is None:
            def fn(rk, rp, sk, sp, chain):
                c, ss = dense_join.dense_count_join(sk, sp, lo, hi,
                                                    interpret=interp,
                                                    chain=chain)
                return c, jnp.uint32(0), ss, jnp.int32(-1)
            return fn

        def fn(rk, rp, sk, sp, chain):
            mask, s_after = bloom_join.bloom_prune(rk, sk, bloom_args)
            sk_f = jnp.where(mask, sk, jnp.int32(-2147483648))
            c, ss = dense_join.dense_count_join(sk_f, sp, lo, hi,
                                                interpret=interp, chain=chain)
            return c, jnp.uint32(0), ss, s_after
        return fn
    if spec.family == "npo":
        def fn(rk, rp, sk, sp, chain):
            c, sr, ss = npo.npo_count(rk, rp, sk, sp)
            return c + chain * 0, sr, ss, jnp.int32(-1)
        return fn
    if bloom_args is not None:
        def fn(rk, rp, sk, sp, chain):
            c, sr, ss, s_after = bloom_join.bloom_radix_count(
                rk, rp, sk, sp, bloom_args, variant="B" + spec.name)
            return c + chain * 0, sr, ss, s_after
        return fn

    def fn(rk, rp, sk, sp, chain):
        c, sr, ss = radix_join.radix_count(rk, rp, sk, sp, variant=spec.name)
        return c + chain * 0, sr, ss, jnp.int32(-1)
    return fn


def _run_general_pallas(spec: AlgoSpec, R: Relation, S: Relation,
                        cfg: EngineConfig, bloom_args: Optional[BloomArgs],
                        inner_repeats: int):
    """Host-orchestrated Pallas radix join (count mode).

    The pipeline is three device programs with one host step between them
    (partition starts -> gather descriptors; the reference's analogous host
    role is task generation from histograms, parallel_radix_join.c:1130-1270).
    Returns None when the Pallas tier cannot serve the query (bucket
    overflow under heavy skew) so the caller falls back to the portable
    XLA tier.  Payload checksums are not computed on this path (count-only,
    like the reference's default non-materializing joins, main.c:117-123).
    """
    from hwbloomradixjoin_tpu.ops import radix as radix_ops

    if bloom_args is not None:
        @jax.jit
        def prologue(rk, sk):
            mask, s_after = bloom_join.bloom_prune(rk, sk, bloom_args)
            return jnp.where(mask, sk, jnp.int32(Relation.PAD_KEY)), s_after
        sk_in, s_after_dev = prologue(R.key, S.key)
        s_after = int(s_after_dev)
    else:
        sk_in, s_after = S.key, -1

    def once():
        return radix_ops.radix_join_count_pallas(R.key, sk_in)

    t0 = time.perf_counter()
    cnt, overflow = once()  # compiles + builds descriptors
    if overflow:
        return None
    compile_usec = (time.perf_counter() - t0) * 1e6

    t0 = time.perf_counter()
    for _ in range(inner_repeats):
        cnt, _ = once()
    c = int(cnt)
    total_usec = (time.perf_counter() - t0) * 1e6 / inner_repeats

    stats = JoinStats(
        total_usec=total_usec, probe_usec=total_usec, result=c,
        num_s_tuples=S.capacity,
        s_after_filter=None if s_after < 0 else s_after,
        compile_usec=compile_usec)
    result = JoinResult(total_results=c,
                        s_after_filter=None if s_after < 0 else s_after)
    return result, stats, (0, 0)


def run_join(name: str, R: Relation, S: Relation,
             cfg: EngineConfig = EngineConfig(),
             bloom_args: Optional[BloomArgs] = None,
             inner_repeats: int = 1):
    """Execute a named join algorithm; returns (JoinResult, JoinStats).

    The whole join is one compiled XLA program; compile time is excluded from
    the reported runtime (first call warms the cache).  inner_repeats > 1
    issues that many back-to-back executions and reports the mean — device
    dispatches pipeline, amortizing host->device dispatch latency (the
    remote-tunnel floor is ~25ms, comparable to small-join device time).
    """
    spec = ALGORITHMS[name]
    if spec.family == "npo":
        bloom_args = None  # B_NPO wrappers ignore the filter (main.c:296-312)

    use_pallas = cfg.radix.use_pallas and jax.default_backend() == "tpu"
    dense_ok = (R.stats is not None and R.stats.is_dense_pk
                and not cfg.materialize and spec.family == "radix")
    if use_pallas and spec.family == "radix" and not dense_ok \
            and not cfg.materialize:
        out = _run_general_pallas(spec, R, S, cfg, bloom_args, inner_repeats)
        if out is not None:
            return out

    fn = jax.jit(_count_fn(spec, cfg, bloom_args, r_stats=R.stats))

    chain0 = jnp.int32(0)
    t0 = time.perf_counter()
    compiled = fn.lower(R.key, R.payload, S.key, S.payload, chain0).compile()
    # warm-up execution: some backends defer final codegen/load to first run
    jax.block_until_ready(compiled(R.key, R.payload, S.key, S.payload, chain0))
    compile_usec = (time.perf_counter() - t0) * 1e6

    chain = chain0
    t0 = time.perf_counter()
    for _ in range(inner_repeats):
        c, sr, ss, s_after = compiled(R.key, R.payload, S.key, S.payload, chain)
        chain = (c * 0).astype(jnp.int32)  # data dependence between repeats
    c = int(c)  # host readback syncs the full pipeline
    total_usec = (time.perf_counter() - t0) * 1e6 / inner_repeats

    s_after_i = int(s_after)
    stats = JoinStats(
        total_usec=total_usec,
        probe_usec=total_usec,
        result=c,
        num_s_tuples=S.capacity,
        s_after_filter=None if s_after_i < 0 else s_after_i,
        compile_usec=compile_usec,
    )
    result = JoinResult(total_results=c,
                        s_after_filter=None if s_after_i < 0 else s_after_i)
    return result, stats, (int(sr), int(ss))
