#!/bin/bash
# Post-sweep2 hardware queue: (1) on-chip fidelity gate under the new r8
# plan (tables changed -> re-prove <= 1 LSB @ 24-bit), (2) phase
# decomposition at chunk=128 (device time ~25 ms >> the ~1.4-2.9 ms
# per-call tunnel floor, so phase attribution is finally clean).
set -u
cd /root/repo
# wait for sweep2 to release the chip
while pgrep -f r03_sweep2.sh > /dev/null; do sleep 20; done

echo "=== fidelity (r8 plan) ==="
timeout 1800 python bench.py --fidelity --reps 2 --segment-blocks 8 2>&1 |
  grep -E "fidelity|gate" | tail -3

echo "=== phase decomposition, chunk 128 ==="
timeout 3000 python -u experiments/fused_phase_decomp.py 2>&1 | tail -8
