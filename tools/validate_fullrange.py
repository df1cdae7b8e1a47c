"""Full-int32-span workload validation on the real chip.

The reference serves arbitrary key domains (--full-range, file-loaded
relations, src/main.c:607-615); the count-table tiers cap at HT_MAX_SLOTS
slots, but the bitmap engine spends 1 bit/slot and covers the whole int32
space (BITMAP_MAX_SPAN).  This validates exactness + throughput of the
wide-span path: sparse unique R over [1, 2^31), S with non-matching keys
INSIDE R's span (range pruning inert — the adversarial case for the
range check, where only structure lookups can prune).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcomp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def build_inrange_workload(n_r=16_000_000, n_s=128_000_000, q=0.01, seed=9):
    rng = np.random.default_rng(seed)
    # unique sparse keys over [1, 2^31): oversample + dedupe (a full-space
    # arange would be 17 GB)
    cand = rng.integers(1, (1 << 31) - 1, int(n_r * 1.05), dtype=np.int64)
    rk = np.unique(cand)[:n_r]
    assert rk.shape[0] == n_r
    rng.shuffle(rk)
    rk = rk.astype(np.int32)
    n_match = int(n_s * q)
    sk = np.concatenate([
        rng.choice(rk, n_match),
        rng.integers(1, (1 << 31) - 1, n_s - n_match).astype(np.int32),
    ]).astype(np.int32)
    rng.shuffle(sk)
    return rk, sk


def main():
    import jax
    import jax.numpy as jnp
    from hwbloomradixjoin_tpu.config import EngineConfig, RadixConfig
    from hwbloomradixjoin_tpu.models import run_join
    from hwbloomradixjoin_tpu.types import KeyStats, Relation

    n_r = int(float(os.environ.get("FR_R", 16e6)))
    n_s = int(float(os.environ.get("FR_S", 128e6)))
    q = float(os.environ.get("FR_Q", 0.01))
    bits = os.environ.get("FR_BITS")
    print(f"full-range: {n_r}⋈{n_s} q={q} on "
          f"{jax.devices()[0].device_kind}", flush=True)
    t0 = time.perf_counter()
    rk, sk = build_inrange_workload(n_r, n_s, q)
    want = int(np.isin(sk, rk).sum())
    print(f"datagen+host-count: {time.perf_counter()-t0:.0f}s "
          f"expect={want}", flush=True)

    stats = KeyStats(min_key=int(rk.min()), max_key=int(rk.max()),
                     is_unique=True)
    R = Relation.from_numpy(rk, np.arange(n_r, dtype=np.int32), stats=stats)
    S = Relation(key=jnp.asarray(sk), payload=jnp.zeros(1, jnp.int32))
    cfg = EngineConfig(radix=RadixConfig(
        num_radix_bits=int(bits) if bits else None,
        passes=int(os.environ.get("FR_PASSES", 1))))

    from hwbloomradixjoin_tpu.config import BloomArgs, BloomVariant
    from hwbloomradixjoin_tpu.ops import bloom as bloom_ops

    configs = [("PRO", None)]
    if os.environ.get("FR_BLOOM", "1") == "1":
        for mb in (27, 30):
            for k in (1, 4):
                configs.append((
                    f"BPRO blocked m=2^{mb} k={k} B=512",
                    BloomArgs(variant=BloomVariant.BLOCKED, m=1 << mb,
                              k=k, B=512)))
    all_ok = True
    for name, bargs in configs:
        res, st, _ = run_join("PRO", R, S, cfg, bargs, inner_repeats=3)
        ok = res.count() == want
        all_ok &= ok
        line = (f"{name}: tier={st.tier} total={st.total_usec/1e6:.3f}s "
                f"({st.total_usec*1e3/n_s:.3f} ns/tuple) "
                f"build={st.build_usec/1e3:.0f}ms "
                f"part={st.part_usec/1e3:.0f}ms "
                f"probe={st.probe_usec/1e3:.0f}ms "
                f"count={res.count()} expect={want} -> "
                f"{'OK' if ok else 'MISMATCH'}")
        if bargs is not None and res.s_after_filter is not None:
            fpr = bloom_ops.theoretical_fpr(bargs.m, bargs.k, n_r)
            exp_surv = q + (1 - q) * fpr
            line += (f" | survivors {res.s_after_filter/n_s*100:.2f}% "
                     f"(theory {exp_surv*100:.2f}%)")
        print(line, flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
