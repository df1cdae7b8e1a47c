"""TPU validation of the bloom-filtered join (BASELINE.json config 3).

Runs B_PRO at 16M x 128M, q=0.01, blocked filter m=2^30 B=512, k in
{1,2,4}: exact counts, prune rate vs the theoretical FPR model
(s_after/|S| ~ q + (1-q) * fpr_theo(m, k, |R|)), and steady-state timing
for the bloom-vs-no-bloom comparison (the thesis's central experiment).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


def main():
    import jax

    from hwbloomradixjoin_tpu.config import (BloomArgs, BloomVariant,
                                             EngineConfig)
    from hwbloomradixjoin_tpu.data import generator as G
    from hwbloomradixjoin_tpu.models import run_join
    from hwbloomradixjoin_tpu.ops.bloom import theoretical_fpr
    from hwbloomradixjoin_tpu.types import Relation

    n_r, n_s, q = 16_000_000, 128_000_000, 0.01
    m = int(os.environ.get("BLOOM_M", 1 << 30))
    params = G.WorkloadParams(r_size=n_r, s_size=n_s, nthreads=8,
                              selectivity=q)
    rk, rp, sk, sp = G.build_workload(params)
    log("data ready")
    R = Relation.from_numpy(rk, rp, stats=G.r_key_stats(params))
    S = Relation.from_numpy(sk, sp)
    cfg = EngineConfig(allow_dense=False)
    expect = G.expected_uniform_match_count(n_s, q)

    res, st, _ = run_join("PRO", R, S, cfg, None, inner_repeats=3)
    log(f"no-bloom: tier={st.tier} {st.total_usec/1e3:.1f} ms "
        f"({st.total_usec*1e3/n_s:.2f} ns/tuple) count={res.count()} "
        f"{'OK' if res.count() == expect else 'FAIL'}")

    for k in (1, 2, 4):
        args = BloomArgs(variant=BloomVariant.BLOCKED, m=m, k=k, B=512)
        res, st, _ = run_join("PRO", R, S, cfg, args, inner_repeats=2)
        rate = res.s_after_filter / n_s
        want_rate = q + (1 - q) * theoretical_fpr(m, k, n_r)
        ok = (res.count() == expect
              and abs(rate - want_rate) < 0.2 * want_rate + 1e-4)
        log(f"bloom k={k}: tier={st.tier} {st.total_usec/1e3:.1f} ms "
            f"({st.total_usec*1e3/n_s:.2f} ns/tuple) count={res.count()} "
            f"survive={rate:.4%} (theo {want_rate:.4%}) "
            f"{'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
