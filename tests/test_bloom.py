"""Bloom filter exactness: native vs jnp math vs reference FPR goldens.

The small-scale golden values below were produced by the reference binary:
    ./unittests 2 817263 1000000 131072 1048576 6
(m=2^20, 131072 inserts, 1e6 probes over disjoint key ranges, k=1..6) —
the same protocol as the committed full-scale table
measurements/data/bloom_filter_fpr.txt (m=2^30, n=128M, |S|=1.024B).
"""

import numpy as np
import pytest

from hwbloomradixjoin_tpu.config import BloomArgs, BloomVariant
from hwbloomradixjoin_tpu.data import native
from hwbloomradixjoin_tpu.ops import bloom

SEED = 817263
M = 1 << 20
N_INS = 131072
N_SAMPLES = 1_000_000

# fpr_emp ("%.3f%%") from the reference unittests run above
GOLDEN_FPR = {
    ("blocked", 1): 11.778, ("blocked", 2): 4.940, ("blocked", 3): 3.175,
    ("blocked", 4): 2.530, ("blocked", 5): 2.334, ("blocked", 6): 2.366,
    ("basic", 1): 11.721, ("basic", 2): 4.882, ("basic", 3): 3.046,
    ("basic", 4): 2.383, ("basic", 5): 2.184, ("basic", 6): 2.165,
}


@pytest.fixture(scope="module")
def keysets():
    # test_bloom_fpr_wrapper: srand(seed+1); R from [0, threshold),
    # S from [threshold+1, INT32_MAX), one continuous rand() stream.
    threshold = int(2147483647 * (N_INS / (N_INS + N_SAMPLES)))
    r, consumed = native.unique_gen_range(SEED + 1, 0, N_INS, 0, threshold)
    s, _ = native.unique_gen_range(SEED + 1, consumed, N_SAMPLES,
                                   threshold + 1, 2147483647)
    # filter seed: srand(seed); rand()
    fseed = int(native.rand_stream(SEED, 1)[0])
    return r, s, fseed


@pytest.mark.parametrize("variant", ["blocked", "basic"])
@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 6])
def test_fpr_matches_reference(keysets, variant, k):
    r, s, fseed = keysets
    contains = native.ref_bloom(variant, M, k, 512, fseed, r, s)
    fpr = contains.sum() / N_SAMPLES * 100.0
    assert round(fpr, 3) == GOLDEN_FPR[(variant, k)], (variant, k, fpr)


@pytest.mark.parametrize("variant", [BloomVariant.BASIC, BloomVariant.BLOCKED])
def test_host_math_matches_native(variant):
    """jnp/numpy position math == native scalar filter, bit for bit."""
    rng = np.random.default_rng(7)
    add = rng.integers(-2**31, 2**31, 20_000, dtype=np.int32)
    query = np.concatenate([add[:5000],
                            rng.integers(-2**31, 2**31, 20_000, dtype=np.int32)])
    args = BloomArgs(variant=variant, m=1 << 16, k=3, B=512, seed=42)
    vname = variant.value
    want_mask, want_bitmap = native.ref_bloom(vname, args.m, args.k, args.B,
                                              args.seed, add, query,
                                              want_bitmap=True)
    got_bitmap = bloom.build_bitmap_host(add, args)
    assert np.array_equal(got_bitmap, want_bitmap.view(np.uint32))
    got_mask = bloom.probe_bitmap_host(got_bitmap, query, args)
    assert np.array_equal(got_mask, want_mask)
    # every added key must be contained (no false negatives, ever)
    assert bloom.probe_bitmap_host(got_bitmap, add, args).all()


def test_theoretical_fpr():
    # golden table rows (m=2^30, n=128M): k=1 -> 11.238%, k=6 -> 1.779%
    assert round(bloom.theoretical_fpr(1 << 30, 1, 128_000_000) * 100, 3) == 11.238
    assert round(bloom.theoretical_fpr(1 << 30, 6, 128_000_000) * 100, 3) == 1.779


def test_bloom_pallas_prune_matches_xla():
    """Pallas blocked-bloom prune (hash-partition + VMEM slice probe) keeps
    exactly the same survivor multiset as the bit-exact XLA filter path."""
    import jax
    import jax.numpy as jnp

    from hwbloomradixjoin_tpu.config import BloomArgs, BloomVariant
    from hwbloomradixjoin_tpu.ops import bloom as bloom_ops
    from hwbloomradixjoin_tpu.ops import bloom_pallas

    rng = np.random.default_rng(5)
    rk = rng.permutation(np.arange(1, 5001)).astype(np.int32)
    sk = rng.integers(1, 20000, 30000).astype(np.int32)
    args = BloomArgs(variant=BloomVariant.BLOCKED, m=1 << 15, k=2, B=512)

    plan = bloom_pallas.plan_bloom_prune(jnp.asarray(rk), jnp.asarray(sk),
                                         args, interpret=True)
    assert plan is not None
    pruned, n = plan.prune_fn(jnp.int32(0))
    pruned = np.asarray(pruned).ravel()
    survivors = np.sort(pruned[pruned != np.int32(-2147483648)])

    bm = bloom_ops.build_bitmap_host(rk, args)
    keep = bloom_ops.probe_bitmap_host(bm, sk, args)
    want = np.sort(sk[keep])
    assert int(n) == len(want)
    assert np.array_equal(survivors, want)


def test_bloom_pallas_prune_via_run_join():
    """BPRO through the engine with the Pallas prune: count + s_after match
    the reference semantics (filter keeps all true matches; s_after equals
    the bit-exact filter's survivor count)."""
    from hwbloomradixjoin_tpu.config import (BloomArgs, BloomVariant,
                                             EngineConfig)
    from hwbloomradixjoin_tpu.models import run_join
    from hwbloomradixjoin_tpu.ops import bloom as bloom_ops
    from hwbloomradixjoin_tpu.types import KeyStats, Relation

    rng = np.random.default_rng(9)
    n_r = 4096
    rk = rng.permutation(np.arange(1, n_r + 1)).astype(np.int32)
    rp = np.arange(n_r, dtype=np.int32)
    sk = rng.integers(1, 4 * n_r, 40000).astype(np.int32)
    sp = np.arange(40000, dtype=np.int32)
    args = BloomArgs(variant=BloomVariant.BLOCKED, m=1 << 16, k=2, B=512)

    R = Relation.from_numpy(rk, rp,
                            stats=KeyStats(1, n_r, is_unique=True))
    S = Relation.from_numpy(sk, sp)
    res, st, _ = run_join("PRO", R, S, EngineConfig(interpret=True), args)
    assert st.tier == "pallas_radix"
    want = int(np.isin(sk, rk).sum())
    assert res.count() == want
    bm = bloom_ops.build_bitmap_host(rk, args)
    want_after = int(bloom_ops.probe_bitmap_host(bm, sk, args).sum())
    assert res.s_after_filter == want_after
    assert st.part_usec > 0


def test_bloom_pallas_2pass_deep_geometry(monkeypatch):
    """Deep filter geometry (part_bits > single-pass cap): the 2-pass
    hash partition tier produces the same survivor multiset.  The cap is
    lowered so the scaled-down config exercises the flagship (m=2^30
    B=512) code path in interpret mode."""
    import jax.numpy as jnp

    from hwbloomradixjoin_tpu.config import BloomArgs, BloomVariant
    from hwbloomradixjoin_tpu.ops import bloom as bloom_ops
    from hwbloomradixjoin_tpu.ops import bloom_pallas

    monkeypatch.setattr(bloom_pallas, "MAX_PART_BITS", 2)
    rng = np.random.default_rng(17)
    rk = rng.permutation(np.arange(1, 4001)).astype(np.int32)
    sk = rng.integers(1, 30000, 40000).astype(np.int32)
    # m=2^22, B=512 -> hash_bits=13, part_bits=5 > 2 -> 2-pass (b1=2,b2=3)
    args = BloomArgs(variant=BloomVariant.BLOCKED, m=1 << 22, k=2, B=512)
    assert bloom_pallas.geometry(args) is None
    assert bloom_pallas.geometry_raw(args) is not None

    plan = bloom_pallas.plan_bloom_prune(jnp.asarray(rk), jnp.asarray(sk),
                                         args, interpret=True)
    assert plan is not None
    pruned, n = plan.prune_fn(jnp.int32(0))
    pruned = np.asarray(pruned).ravel()
    survivors = np.sort(pruned[pruned != np.int32(-2147483648)])

    bm = bloom_ops.build_bitmap_host(rk, args)
    keep = bloom_ops.probe_bitmap_host(bm, sk, args)
    want = np.sort(sk[keep])
    assert int(n) == len(want)
    assert np.array_equal(survivors, want)


def test_bloom_pallas_oversized_block_falls_back():
    """ADVICE r3: B > slice capacity must return None (XLA fallback), not
    crash on a negative shift (e.g. --bloom-block-size 262144, m=2^26)."""
    import jax.numpy as jnp

    from hwbloomradixjoin_tpu.config import BloomArgs, BloomVariant
    from hwbloomradixjoin_tpu.ops import bloom_pallas

    args = BloomArgs(variant=BloomVariant.BLOCKED, m=1 << 26, k=2,
                     B=1 << 18)
    assert bloom_pallas.geometry(args) is None
    assert bloom_pallas.geometry_raw(args) is None
    rk = jnp.arange(1, 1001, dtype=jnp.int32)
    sk = jnp.arange(1, 5001, dtype=jnp.int32)
    assert bloom_pallas.plan_bloom_prune(rk, sk, args,
                                         interpret=True) is None
