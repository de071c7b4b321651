#!/bin/bash
# Round-3 sweep phase 2: block size under the r8 plan family (now the
# default), plus the lt512 leftover cross-check. B=2^19 halves the
# overlap factor (1.185 -> 1.088) at the cost of one extra stage in
# phase 1; the fused kernel's VMEM residency still fits (zA/zB 16 MiB).
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  timeout 1800 python bench.py --segment-blocks "$SB" --reps 4 \
      ${BS:+--block-size "$BS"} 2>&1 |
    grep -E "device-resident|kernel:" | tail -2
}

SB=252 BS=
echo "--- r8 default, B=2^18 (re-measure) ---"
run r8_b18

SB=126 BS=524288
echo "--- r8, B=2^19 ---"
run r8_b19

SB=504 BS=131072
echo "--- r8, B=2^17 ---"
run r8_b17
