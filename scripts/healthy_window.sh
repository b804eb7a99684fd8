#!/bin/bash
# One-shot measurement batch for the first healthy TPU-tunnel window:
#   1. probe (600 s budget — CLAUDE.md wedge rules)
#   2. full bench.py (packed / rank-key / union-key pixel kernels +
#      split shape kernel; appends to BENCH_LOG)
#   3. perf_sweep --union-keys at the production T=4096
# Run from anywhere; outputs land in /root/repo/bench_runs/.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p bench_runs
STAMP=$(date -u +%Y%m%dT%H%M%S)

echo "== probe =="
python scripts/probe_device.py --budget 600 || exit $?

echo "== bench.py =="
timeout 3600 python bench.py 2>bench_runs/bench_$STAMP.err \
    | tee bench_runs/bench_$STAMP.json
rc=$?
tail -5 bench_runs/bench_$STAMP.err >&2

echo "== union-keys sweep (T=4096, B=8) =="
timeout 3600 python scripts/perf_sweep.py --union-keys \
    --out bench_runs/union_keys_$STAMP.jsonl 2>&1 \
    | tail -20
exit $rc
