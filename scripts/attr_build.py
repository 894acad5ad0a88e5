"""Round-5 build substage attribution driver (VERDICT r4 item 2).

The r4 scaling protocol showed the shuffle-inclusive postings stage scaling
2.81x at 2->8 cores while the post-shuffle residual (docstore/blocks writes,
metric re-scans, finalize — ~80% of wall) scaled only 1.54x. This driver
answers the open question — sink-bandwidth-bound vs job-structure-bound —
by running the SAME workload (`bench._attr_child`: replicate x192, 32
buckets, /dev/shm sink) in build-profile mode at two parallelism levels,
cooldown-controlled like scaling_r4, and pairing substage ratios WITHIN
each round.

Substage semantics (see build.build_index profile docs):
  * *_lineage_noop   — the full lineage executed into Spark's noop sink
                       (compute + shuffle, write elided)
  * *_write          — the same lineage re-executed INTO the parquet sink
                       (Spark SQL does not reuse shuffles across actions),
                       so write - noop ~= sink cost (warm-biased low: the
                       noop pass runs first and warms JIT/page cache)
  * pack kernel      — blocks_lineage_noop - postings_lineage_noop
  * metrics_scan     — the per-bucket lineage-metric re-scans
  * finalize         — stats + termstats jobs

Run from the repo root with nothing else on the box.
"""
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

LEVELS = tuple(int(x) for x in os.environ.get(
    "SPARK_GRAFT_ATTR_LEVELS", "2,8").split(","))
ROUNDS = int(os.environ.get("SPARK_GRAFT_ATTR_ROUNDS", "3"))
COOLDOWN = int(os.environ.get("SPARK_GRAFT_CHILD_COOLDOWN", "135"))

# derived rows: (name, fn(profile) -> seconds)
DERIVED = [
    ("docstore compute+shuffle", lambda p: p.get("docstore_lineage_noop")),
    ("docstore sink (write-noop)", lambda p: _sub(
        p, "docstore_write", "docstore_lineage_noop")),
    ("postings compute+shuffle", lambda p: p.get("postings_lineage_noop")),
    ("pack kernel (blocks-postings noop)", lambda p: _sub(
        p, "blocks_lineage_noop", "postings_lineage_noop")),
    ("blocks sink (write-noop)", lambda p: _sub(
        p, "blocks_write", "blocks_lineage_noop")),
    ("metrics_scan", lambda p: p.get("metrics_scan")),
    ("finalize", lambda p: p.get("finalize")),
]


def _sub(p, a, b):
    if p.get(a) is None or p.get(b) is None:
        return None
    return p[a] - p[b]


def _child(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "bench.py", "--attr-child", str(cpus), sf_dir],
        capture_output=True, text=True, check=True, env=env,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = bench.SF_DIR
    rounds = []
    for rnd in range(ROUNDS):
        window = {}
        for cpus in LEVELS:
            if COOLDOWN:
                time.sleep(COOLDOWN)
            t0 = time.time()
            window[cpus] = _child(cpus, sf_dir)
            print(f"round {rnd} local[{cpus}]: build "
                  f"{window[cpus]['seconds']:.1f} s (child wall "
                  f"{time.time() - t0:.0f} s)", flush=True)
        burns = bench._burn_speedup(LEVELS[0], LEVELS[-1])
        rounds.append({"levels": window, "burns": burns})
        os.makedirs("BENCH", exist_ok=True)
        with open(os.path.join("BENCH", "attr_build.json"), "w") as f:
            json.dump({"levels": list(LEVELS), "rounds": rounds}, f, indent=1)

    lo, hi = LEVELS[0], LEVELS[-1]
    nominal = hi / lo
    # per-round substage ratios (same-window pairing), then medians
    rows = []
    for name, fn in DERIVED:
        per_round = []
        for rd in rounds:
            a = fn(rd["levels"][lo]["profile"])
            b = fn(rd["levels"][hi]["profile"])
            if a is None or b is None or b <= 0:
                continue
            per_round.append((a, b, a / b))
        if not per_round:
            continue
        med = sorted(per_round, key=lambda r: r[2])[(len(per_round) - 1) // 2]
        rows.append((name, med[0], med[1], med[2], med[2] / nominal))
    total_lo = statistics.median(
        rd["levels"][lo]["seconds"] for rd in rounds)
    total_hi = statistics.median(
        rd["levels"][hi]["seconds"] for rd in rounds)
    hw = statistics.median(rd["burns"]["cpu"] for rd in rounds)
    hw_mem = statistics.median(rd["burns"]["mem"] for rd in rounds)

    lines = [
        f"| substage | local[{lo}] s | local[{hi}] s | speedup | eff vs {nominal:.0f}x |",
        "|---|---|---|---|---|",
    ]
    for name, a, b, sp, eff in rows:
        lines.append(f"| {name} | {a:.1f} | {b:.1f} | {sp:.2f}x | {eff:.2f} |")
    lines.append(f"| **profiled build total** | {total_lo:.1f} | {total_hi:.1f} "
                 f"| {total_lo / total_hi:.2f}x | "
                 f"{total_lo / total_hi / nominal:.2f} |")
    table = "\n".join(lines)
    print(table)
    print(f"hardware burns this window: cpu {hw:.2f}x, mem {hw_mem:.2f}x "
          f"(nominal {nominal:.0f}x)")
    with open(os.path.join("BENCH", "attr_build_table.md"), "w") as f:
        f.write(table + "\n\n" +
                f"hardware burns (median across {len(rounds)} rounds): "
                f"cpu {hw:.2f}x, mem {hw_mem:.2f}x of nominal {nominal:.0f}x\n")


if __name__ == "__main__":
    main()
