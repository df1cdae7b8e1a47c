"""Distributed SPMD join on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from hwbloomradixjoin_tpu.config import BloomArgs, BloomVariant
from hwbloomradixjoin_tpu.data import generator as G
from hwbloomradixjoin_tpu.data import native
from hwbloomradixjoin_tpu.parallel import dist_join, mesh as mesh_lib


@pytest.fixture(scope="module")
def workload():
    p = G.WorkloadParams(r_size=8_192, s_size=32_768, nthreads=4,
                         selectivity=0.4)
    rk, rp, sk, sp = G.build_workload(p)
    return rk, rp, sk, sp, native.ref_join(rk, rp, sk, sp)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_dist_count_matches_ground_truth(eight_devices, workload, n_dev):
    rk, rp, sk, sp, want = workload
    mesh = mesh_lib.make_mesh(n_dev)
    cnt, sr, ss, s_after, ovf = dist_join.dist_join_count(mesh, rk, rp, sk, sp)
    assert int(ovf) == 0
    assert int(cnt) == want[0]
    assert int(sr) == want[1] % 2**32 and int(ss) == want[2] % 2**32
    assert int(s_after) == -1


def test_dist_bloom_prunes_before_shuffle(eight_devices, workload):
    rk, rp, sk, sp, want = workload
    mesh = mesh_lib.make_mesh(8)
    args = BloomArgs(variant=BloomVariant.BLOCKED, m=1 << 18, k=2, B=512)
    cnt, sr, ss, s_after, ovf = dist_join.dist_join_count(
        mesh, rk, rp, sk, sp, bloom_args=args)
    assert int(ovf) == 0
    assert int(cnt) == want[0]
    assert want[0] <= int(s_after) < sk.shape[0]


def test_dist_zipf_skew_handling(eight_devices):
    """replicate-R/split-S keeps exact counts with a small pad factor."""
    p = G.WorkloadParams(r_size=2_048, s_size=16_384, nthreads=2, skew=1.0)
    rk, rp, sk, sp = G.build_workload(p)
    want = native.ref_join(rk, rp, sk, sp)
    mesh = mesh_lib.make_mesh(8)
    cnt, sr, ss, _, ovf = dist_join.dist_join_count(
        mesh, rk, rp, sk, sp, pad_factor=3.0, skew_handling=True)
    assert int(ovf) == 0
    assert int(cnt) == want[0] == 16_384
    assert int(sr) == want[1] % 2**32 and int(ss) == want[2] % 2**32


def test_dist_zipf_skew(eight_devices):
    # z=1.0 probe-side skew: heavy keys all land on one device's partition;
    # generous pad absorbs it (dedicated skew splitting in parallel/skew.py)
    p = G.WorkloadParams(r_size=2_048, s_size=16_384, nthreads=2, skew=1.0)
    rk, rp, sk, sp = G.build_workload(p)
    want = native.ref_join(rk, rp, sk, sp)
    mesh = mesh_lib.make_mesh(8)
    cnt, sr, ss, _, ovf = dist_join.dist_join_count(
        mesh, rk, rp, sk, sp, pad_factor=16.0)
    assert int(ovf) == 0
    assert int(cnt) == want[0] == 16_384


def test_multiprocess_distributed_cpu():
    """Real jax.distributed: 2 coordinator-connected CPU processes, 4
    global devices, exact count + checksums (tools/dist_multiproc.py).
    Exercises mesh.init_distributed — the multi-host wiring path."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "dist_multiproc.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=root)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "MULTIPROC PASS" in proc.stdout


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_dist_pallas_local_engine(eight_devices, workload, n_dev):
    """SPMD shuffle + Pallas bitmap local join compose (count-only path):
    the per-device join is traced_radix_count, not the XLA sort tier."""
    rk, rp, sk, sp, want = workload
    mesh = mesh_lib.make_mesh(n_dev)
    cnt, sr, ss, s_after, ovf = dist_join.dist_join_count(
        mesh, rk, rp, sk, sp, local_engine="pallas",
        key_range=(1, 8_192), interpret=True)
    assert int(ovf) == 0
    assert int(cnt) == want[0]


def test_dist_pallas_with_bloom_prune(eight_devices, workload):
    rk, rp, sk, sp, want = workload
    mesh = mesh_lib.make_mesh(4)
    args = BloomArgs(variant=BloomVariant.BLOCKED, m=1 << 20, k=2, B=512)
    cnt, sr, ss, s_after, ovf = dist_join.dist_join_count(
        mesh, rk, rp, sk, sp, bloom_args=args, local_engine="pallas",
        key_range=(1, 8_192), interpret=True)
    assert int(ovf) == 0
    assert int(cnt) == want[0]
    assert want[0] <= int(s_after) < sk.shape[0]
