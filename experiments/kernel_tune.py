#!/usr/bin/env python
"""Fused-kernel tuning sweeps, each case a fresh subprocess (the knobs —
LOWCUT_ROLL_BELOW_*, LOWCUT_LANE_TILE, LOWCUT_KERNEL_BASE_PLAN — are read
at import and bake into table caches). Measures via bench.py's segment
harness and parses its device-resident line.

Cases:
  1. df64: coarse plan family r4 (prod) vs r8 (fewer stages — the XLA
     engine measured r8 slower due to fusion scheduling, but in-kernel
     cost is pure VPU arithmetic where the model says ~6% fewer ops).
  2. df64: LANE_TILE 128 (prod) vs 256 (halves fori_loop trip counts).
  3. f32: all-roll (prod) vs roll_below=8 (reproduces the compile failure
     seen in an earlier sweep — capture the actual error).
"""

import os
import re
import subprocess
import sys

CASES = [
    ("df64 prod (r4, lt128, rb8)", "high", {}),
    ("df64 base-plan r8", "high", {"LOWCUT_KERNEL_BASE_PLAN": "r8"}),
    ("df64 lane-tile 256", "high", {"LOWCUT_LANE_TILE": "256"}),
    ("df64 r8 + lt256", "high", {"LOWCUT_KERNEL_BASE_PLAN": "r8",
                                 "LOWCUT_LANE_TILE": "256"}),
    ("f32 prod (all-roll)", "fast", {}),
    ("f32 roll-below 8", "fast", {"LOWCUT_ROLL_BELOW_F32": "8"}),
]


def main():
    for name, precision, env_extra in CASES:
        env = dict(os.environ, **env_extra)
        p = subprocess.run(
            [sys.executable, "bench.py", "--precision", precision,
             "--reps", "12"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=3200)
        m = re.search(r"-> ([0-9.]+) Msamples/s \(([0-9]+)x realtime\)",
                      p.stderr)
        if p.returncode != 0 or not m:
            print(f"=== {name}: FAILED rc={p.returncode}", flush=True)
            tail = "\n".join(p.stderr.strip().splitlines()[-25:])
            print(tail, flush=True)
            continue
        print(f"=== {name}: {m.group(1)} Ms/s ({m.group(2)}x realtime)",
              flush=True)


if __name__ == "__main__":
    main()
