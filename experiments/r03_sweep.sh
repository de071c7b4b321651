#!/bin/bash
# Round-3 hardware sweep over the fused-kernel tuning knobs, all measured
# with the production segment bench (large grid in one dispatch, so the
# ~1.4 ms per-call tunnel floor doesn't swamp kernel marginals).
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  timeout 1500 python bench.py --segment-blocks "$SB" --reps "$REPS" 2>&1 |
    grep -E "device-resident|kernel:" | tail -2
}

SB=63 REPS=12
echo "--- baseline sb=63 (call floor ~10%) ---"
run base63

SB=252 REPS=4
echo "--- sb=252 (call floor ~2.5%) ---"
run base252

echo "--- base plan r8, sb=252 ---"
LOWCUT_KERNEL_BASE_PLAN=r8 run r8

echo "--- roll_below 4, sb=252 ---"
LOWCUT_ROLL_BELOW_DF64=4 run rb4

echo "--- roll_below 16, sb=252 ---"
LOWCUT_ROLL_BELOW_DF64=16 run rb16

echo "--- lane tile 256, sb=252 ---"
LOWCUT_LANE_TILE=256 run lt256

echo "--- lane tile 512, sb=252 ---"
LOWCUT_LANE_TILE=512 run lt512
