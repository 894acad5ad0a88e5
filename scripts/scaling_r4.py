"""Round-4 scaling measurement driver (VERDICT r3 item 1).

Runs the cooldown-controlled same-window protocol end to end:
  * SPARK_GRAFT_CHILD_COOLDOWN idle seconds before EVERY child so each
    parallelism level starts from the same host burst-credit state (the r3
    bimodality diagnosis), at levels 2/8/32 → both ×4 pairs per round;
  * N rounds (default 8, SPARK_GRAFT_SCALE_ROUNDS);
  * then ONE full-suite bench (min-of-2 per stage) and the hardware
    calibration, and writes BENCH/BASELINE.md.

Run from the repo root with nothing else on the box — any concurrent load
contaminates the intra-round ratios the protocol exists to protect.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CHILD_COOLDOWN", "135")
os.environ.setdefault("SPARK_GRAFT_SCALE_ROUNDS", "8")

import bench  # noqa: E402

scaling = bench.run_scaling(bench.SF_DIR)
print("SCALING DONE", json.dumps({k: scaling[k] for k in
                                  ("speedup", "efficiency", "best_efficiency")}))
full = bench.run_full(bench.SF_DIR, bench.CPUS)
calib = bench.hardware_calibration()
bench.write_baseline_md(scaling, full, calib)
print(json.dumps(full))
