"""Pallas radix-partition machinery: split network, counts, full join.

All run in interpret mode on CPU with shrunken geometry; the production
geometry path is exercised on TPU by bench/driver runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from hwbloomradixjoin_tpu.data import native
from hwbloomradixjoin_tpu.ops import radix as RX

ROWS = 32


def _run_split(cat, key, nbits, ncats):
    def k(cat_ref, key_ref, oc, ok, ocnt):
        c, (kk,) = RX.split_chunk(cat_ref[:], [key_ref[:]], nbits)
        oc[:] = c
        ok[:] = kk
        ocnt[:] = RX.sorted_counts(c, ncats)
    return pl.pallas_call(k, out_shape=(
        jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        jax.ShapeDtypeStruct((1, 128), jnp.int32)), interpret=True)(cat, key)


@pytest.mark.parametrize("F,npad", [(2, 0), (8, 0), (64, 0), (64, 500),
                                    (16, 100)])
def test_split_chunk_stable_and_counts(F, npad):
    rng = np.random.default_rng(42 + F + npad)
    nbits = int(np.ceil(np.log2(F + 1)))
    cat = rng.integers(0, F, (ROWS, 128)).astype(np.int32)
    if npad:
        cat.ravel()[-npad:] = F
    key = rng.integers(0, 2**31, (ROWS, 128)).astype(np.int32)
    oc, ok, ocnt = _run_split(jnp.asarray(cat), jnp.asarray(key), nbits, F)
    oc, ok, ocnt = map(np.asarray, (oc, ok, ocnt))
    flat_c, flat_k = cat.ravel(), key.ravel()
    order = np.argsort(flat_c, kind="stable")
    assert np.array_equal(oc.ravel(), flat_c[order])
    assert np.array_equal(ok.ravel(), flat_k[order])  # stable routing
    want = np.bincount(flat_c, minlength=128)
    assert np.array_equal(ocnt.ravel()[:F], want[:F])


def test_pallas_join_unique_keys():
    geom = RX.RadixGeom(chunk_rows=32, part_bits=4, s_segs=8, r_segs=4)
    rng = np.random.default_rng(7)
    rk = rng.permutation(np.arange(1, 3001)).astype(np.int32)
    sk = rng.integers(1, 9000, 12000).astype(np.int32)
    want, _, _ = native.ref_join(rk, np.zeros_like(rk), sk, np.zeros_like(sk))
    cnt, ovf = RX.radix_join_count_pallas(rk, sk, interpret=True, geom=geom)
    assert not ovf
    assert int(cnt) == want


def test_pallas_join_duplicates():
    geom = RX.RadixGeom(chunk_rows=32, part_bits=4, s_segs=8, r_segs=8)
    rng = np.random.default_rng(8)
    rk = rng.integers(0, 500, 2000).astype(np.int32)
    sk = rng.integers(0, 700, 8000).astype(np.int32)
    want, _, _ = native.ref_join(rk, np.zeros_like(rk), sk, np.zeros_like(sk))
    cnt, ovf = RX.radix_join_count_pallas(rk, sk, interpret=True, geom=geom)
    assert not ovf
    assert int(cnt) == want


def test_pallas_join_overflow_flag():
    # all R keys in one bucket, exceeding r_segs capacity -> overflow signal
    geom = RX.RadixGeom(chunk_rows=32, part_bits=4, s_segs=8, r_segs=2)
    rk = (np.arange(20000, dtype=np.int32) * 16)  # bucket 0 only
    sk = np.arange(0, 64000, 16, dtype=np.int32)
    cnt, ovf = RX.radix_join_count_pallas(rk, sk, interpret=True, geom=geom)
    assert ovf
