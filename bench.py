"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric (BASELINE.json): join throughput in S-rows/s/chip on the
radix-join workload, measured end-to-end on device: every repeat runs the
WHOLE join as one device program — R-side build (Pallas partition + MXU
bit deposit), S-side Pallas radix partition, descriptor derivation, VMEM
bitmap probe.  The reported total therefore has the same semantics as the
reference's TOTAL-TIME-USECS (build + both partitions + join,
parallel_radix_join_bloom.c:1509-1547); nothing is excluded.  The raw
wall time and the subtracted transport floor are reported alongside so
the adjustment is auditable (ADVICE r3).

The dense-PK planner fast path is DISABLED by default (BENCH_DENSE=1 to
re-enable): the headline number is produced by the general radix machinery
with real partition/probe phase timing and HBM roofline attainment
reported on stderr.

Columnar projection: the count query reads only the key column, so S's
payload column is not allocated on device (at the 1.024B-row north star it
would displace 4 GiB of HBM the join never reads).

Baseline: the reference's best full-scale CPU number — PRO 128M⋈1.024B at
2.98 ns/tuple ≈ 335.6M rows/s (isengard, measurements/data/pkl/isengard.pkl,
BASELINE.md).  vs_baseline = ours / reference.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: Pallas plan compiles through the remote tunnel
# take ~10 min cold; cached geometries replan in seconds (must be set
# before jax import)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcomp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_ROWS_PER_S = 1e9 / 2.98  # PRO 128M⋈1.024B, 14 thr (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # Workload: PRO-shaped 16M ⋈ 128M uniform (BASELINE.json config 2);
    # BENCH_R/BENCH_S scale it (128M⋈1.024B for the north-star config).
    r_size = int(os.environ.get("BENCH_R", 16_000_000))
    s_size = int(os.environ.get("BENCH_S", 128_000_000))
    algo = os.environ.get("BENCH_ALGO", "PRO")
    repeats = int(os.environ.get("BENCH_REPEATS", 2))
    allow_dense = os.environ.get("BENCH_DENSE", "0") == "1"
    # BENCH_Q: selectivity (the 128M⋈1.024B north star runs q=0.01, the
    # reference full-scale config); BENCH_BITS: radix-bits override
    selectivity = float(os.environ.get("BENCH_Q", 1.0))
    bits = os.environ.get("BENCH_BITS")
    bits = int(bits) if bits else None

    import jax
    import jax.numpy as jnp

    from hwbloomradixjoin_tpu.config import EngineConfig, RadixConfig
    from hwbloomradixjoin_tpu.data import generator as G
    from hwbloomradixjoin_tpu.models import run_join
    from hwbloomradixjoin_tpu.ops import bitmap_join
    from hwbloomradixjoin_tpu.types import Relation
    from hwbloomradixjoin_tpu.utils import roofline

    log(f"bench: {algo} {r_size}⋈{s_size} on {jax.devices()[0].device_kind}"
        f" (dense fast path {'on' if allow_dense else 'OFF'})")
    t0 = time.perf_counter()
    params = G.WorkloadParams(r_size=r_size, s_size=s_size, nthreads=8,
                              selectivity=selectivity)
    rk, rp, sk, sp = G.build_workload(params)
    log(f"datagen: {time.perf_counter()-t0:.1f}s")

    # pad S to the partition chunk multiple on host (a device-side pad
    # would hold a second full copy of S in HBM next to the original)
    chunk = bitmap_join.CHUNK_ROWS * 128
    pad = (-len(sk)) % chunk
    if pad:
        sk = np.concatenate([sk, np.full(pad, Relation.PAD_KEY, np.int32)])

    R = Relation.from_numpy(rk, rp, stats=G.r_key_stats(params))
    # key-column projection: the count query never reads S.payload
    S = Relation(key=jnp.asarray(sk), payload=jnp.zeros(1, jnp.int32))
    del sk, sp
    cfg = EngineConfig(radix=RadixConfig(num_radix_bits=bits),
                       allow_dense=allow_dense)

    inner = int(os.environ.get("BENCH_INNER", 8))
    best = None
    for i in range(repeats):
        result, stats, _ = run_join(algo, R, S, cfg, None, inner_repeats=inner)
        # the key-projection placeholder payload is only valid on the
        # Pallas tiers (count-only, payload never read); a fallback tier
        # would consume it positionally -> fail loudly instead
        assert stats.tier.startswith(("pallas", "dense")), (
            f"bench workload fell off the Pallas tier to {stats.tier}")
        log(f"run {i}: tier={stats.tier} {stats.total_usec/1e6:.3f}s "
            f"({stats.total_usec*1e3/s_size:.3f} ns/tuple) "
            f"[raw={stats.raw_total_usec/1e6:.3f}s "
            f"floor={stats.floor_usec/1e3:.1f}ms] "
            f"build={stats.build_usec/1e3:.1f}ms "
            f"part={stats.part_usec/1e3:.1f}ms "
            f"probe={stats.probe_usec/1e3:.1f}ms "
            f"results={result.count()}")
        if best is None or stats.total_usec < best.total_usec:
            best = stats
    expect = G.expected_uniform_match_count(s_size, selectivity)

    # roofline attainment (the perf-counter replacement, utils/roofline.py);
    # phases are checked against the binding bound — HBM for streams, the
    # measured VPU routing model for the split network and probe ladder
    chip = roofline.chip_model()
    pb, _, slr = bitmap_join.plan_geometry(1, r_size, bits)
    costs = roofline.join_costs(r_size, s_size, passes=1, part_bits=pb,
                                sl_rows=slr, s_live=expect)
    measured = {"partition_S": best.part_usec / 1e6,
                "build": best.build_usec / 1e6,
                "probe": best.probe_usec / 1e6}
    log(roofline.report(measured, costs, chip))

    total_usec = best.total_usec          # build included (fused program)
    if result.count() != expect:
        log(f"VALIDATION FAILED: {result.count()} != {expect}")
        value = 0.0
    else:
        value = s_size / (total_usec / 1e6)

    print(json.dumps({
        "metric": f"{algo} join throughput ({r_size//10**6}M⋈{s_size//10**6}M,"
                  f" 1 chip, tier={best.tier}, build incl)",
        "value": round(value, 0),
        "unit": "rows/s",
        "vs_baseline": round(value / BASELINE_ROWS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
