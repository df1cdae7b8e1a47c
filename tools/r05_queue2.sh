#!/bin/bash
# Round-5 TPU queue, part 2: waits for the in-flight materialize run to
# release the chip, then runs the remaining artifacts (trace rerun after
# the S-padding fix, dist[1]-pallas, radix-bits fill, nsp, params).
cd "$(dirname "$0")/.." || exit 1
D=measurements/data

while pgrep -f "hwbloomradixjoin_tpu.cli" >/dev/null 2>&1; do sleep 10; done

echo "=== profiler trace capture (rerun after S-padding fix)"
timeout 2400 python tools/capture_trace.py

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

echo "=== queue2 done"
