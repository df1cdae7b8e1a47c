"""Workload A (KEY_8B, 16-byte tuples) on the real chip.

Reference workload A = R 16,777,216 ⋈ S 268,435,456 with --enable-key8B
(rerun-experiments.sh:52-60); baselines: PRO_A_8 = 9.61 ns/tuple
(isengard) / 3.91 (gondor) — base_results*/figure12/PRO_A_8.txt.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcomp"))


def main():
    import jax
    import jax.numpy as jnp
    from hwbloomradixjoin_tpu.config import EngineConfig
    from hwbloomradixjoin_tpu.data import generator as G
    from hwbloomradixjoin_tpu.models import run_join
    from hwbloomradixjoin_tpu.types import Relation

    n_r = int(float(os.environ.get("K8_R", 16_777_216)))
    n_s = int(float(os.environ.get("K8_S", 268_435_456)))
    print(f"workload A (key8b): {n_r}⋈{n_s} on "
          f"{jax.devices()[0].device_kind}", flush=True)
    t0 = time.perf_counter()
    params = G.WorkloadParams(r_size=n_r, s_size=n_s, nthreads=8,
                              key8b=True)
    rk, rp, sk, sp = G.build_workload(params)
    print(f"datagen: {time.perf_counter()-t0:.0f}s", flush=True)

    R = Relation.from_numpy(rk, rp, key8b=True, stats=G.r_key_stats(params))
    # count query: S payload projected away (key columns only)
    sk64 = np.asarray(sk)
    S = Relation(key=jnp.asarray((sk64 & 0xFFFFFFFF).astype(np.int64)
                                 .astype(np.uint32).view(np.int32)),
                 key_hi=jnp.asarray((sk64 >> 32).astype(np.int32)),
                 payload=jnp.zeros(1, jnp.int32))
    del sk, sp
    res, st, _ = run_join("PRO", R, S, EngineConfig(), None,
                          inner_repeats=4)
    # the S payload placeholder is only valid on the count-only Pallas
    # tier; a fallback tier would consume it positionally
    assert st.tier == "pallas_key8b", st.tier
    want = n_s     # default selectivity 1.0: every S tuple matches once
    ok = res.count() == want
    print(f"tier={st.tier} total={st.total_usec/1e6:.3f}s "
          f"({st.total_usec*1e3/n_s:.3f} ns/tuple) "
          f"build={st.build_usec/1e3:.0f}ms part={st.part_usec/1e3:.0f}ms "
          f"probe={st.probe_usec/1e3:.0f}ms count={res.count()} "
          f"expect={want} -> {'OK' if ok else 'MISMATCH'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
