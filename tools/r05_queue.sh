#!/bin/bash
# Round-5 TPU job queue: runs the remaining VERDICT-item measurements
# back-to-back so the (single) attached chip never idles.  Each step saves
# incrementally; steps are independent, so a timeout only loses that step.
# Ordered so the quick single-run artifacts land before open-ended sweeps.
cd "$(dirname "$0")/.." || exit 1
D=measurements/data

# wait for any in-flight sweep subprocess to release the chip
while pgrep -f "run.py algos_b" >/dev/null 2>&1; do sleep 15; done

echo "=== key8b workload A (16M x 256M, 16B tuples; gondor PRO_A_8=3.91)"
timeout 2400 python -m hwbloomradixjoin_tpu.cli -a PRO -n 8 \
    -r 16000000 -s 256000000 -x 12345 -y 54321 --key8b \
    --engine-no-dense --engine-inner 2 > "$D/key8b_workloadA_r05.txt" 2>&1
tail -6 "$D/key8b_workloadA_r05.txt"

echo "=== profiler trace capture (perf-counter parity artifact)"
timeout 2400 python tools/capture_trace.py

echo "=== materialize tier timing (16M x 128M q=0.01)"
timeout 2400 python -m hwbloomradixjoin_tpu.cli -a PRO -n 8 \
    -r 16000000 -s 128000000 -q 0.01 --materialize \
    --engine-no-dense --engine-inner 2 > "$D/materialize_r05.txt" 2>&1
tail -6 "$D/materialize_r05.txt"

echo "=== dist[1] with Pallas local join on the chip (SPMD/engine composition)"
timeout 2400 python -m hwbloomradixjoin_tpu.cli -a PRO -n 8 \
    -r 16000000 -s 128000000 --engine-devices 1 --engine-local-join pallas \
    --engine-no-dense --engine-inner 2 > "$D/dist1_pallas_r05.txt" 2>&1
tail -6 "$D/dist1_pallas_r05.txt"

echo "=== radix-bits sweep fill (figure-9 analogue, 16M x 128M)"
HBRJ_SWEEP_R=16000000 HBRJ_SWEEP_S=128000000 \
HBRJ_SWEEP_BITS=8,11,6,12,7,9,10 \
    timeout 10800 python measurements/run.py radix_bits

echo "=== never_single_pass (fan-out x filter x k, 1M x 8M)"
timeout 7200 python measurements/run.py never_single_pass

echo "=== params sweep (|R| x S:R x q)"
timeout 7200 python measurements/run.py params

echo "=== queue done"
