#!/bin/bash
# TPU recovery protocol — run the moment the tunnel is back:
#     nohup bash tools/tpu_protocol.sh > tpu_protocol.log 2>&1 &
#
# Each phase runs in its OWN python process (the platform's dispatch
# degradation is process-wide and persists until exit), strictly one TPU
# client at a time, never under a shell timeout (killing a client
# mid-operation can wedge the relay).
set -u
cd "$(dirname "$0")/.."
OUT=.round2
mkdir -p "$OUT"

echo "=== phase 1: compiler-workaround regression checks ($(date)) ==="
python tools/tpu_regression_checks.py 2>&1 | tail -20 || {
  echo "REGRESSION CHECKS FAILED — do not trust further numbers"; }

echo "=== phase 2: FCGF device trace, hash path ($(date)) ==="
python tools/trace_fcgf.py --log_dir /tmp/fcgf_trace_hash 2>&1 | tail -40

echo "=== phase 3: FCGF device trace, dense-grid path ($(date)) ==="
python tools/trace_fcgf.py --dense_extent 256,256,256 \
  --log_dir /tmp/fcgf_trace_dense 2>&1 | tail -40

echo "=== phase 4: full register() trace (bf16 + dense + edge conv) ($(date)) ==="
python tools/trace_register.py 2>&1 | tail -50

echo "=== phase 5: bench ($(date)) ==="
python bench.py 2>&1 | tail -5

echo "=== protocol done ($(date)) ==="
