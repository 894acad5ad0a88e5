"""One-shot scaling measurement + BENCH/BASELINE.md writer (uses the last
full-suite bench json passed on stdin or embedded)."""
import json, sys, os
sys.path.insert(0, "/root/repo")
import bench

bench_json = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {"sf": bench.SF_DIR, "cpus": bench.CPUS}
calib = bench.hardware_calibration()
scaling = bench.run_scaling(bench.SF_DIR)
bench.write_baseline_md(scaling, bench_json, calib)
print(json.dumps(scaling))
