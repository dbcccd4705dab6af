#!/usr/bin/env python3
"""Scaling-efficiency probe (BASELINE.md protocol).

Measures N -> 4N scaling two ways, interleaved, with each run CPU-pinned
to exactly its core budget in a fresh subprocess:

1. the real index build (bench.build_at) at local[LOW] vs local[HIGH]
2. a pure-JVM control: a build-shaped shuffle (hash + groupBy-agg over
   a generated range, zero Python) at the same two levels

The control separates engine scaling from host effects: if the
JVM-only job scales at e, any build efficiency ~e is the host ceiling,
not the pipeline. Prints one JSON line; run on a quiet host
(loadavg < 1 sustained).

    python tools/scaling_probe.py [LOW] [HIGH] [PAIRS]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

LOW = int(sys.argv[1]) if len(sys.argv) > 1 else 2
HIGH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
PAIRS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def run_pinned(code: str, cores: int) -> dict:
    argv = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        argv = ["taskset", "-c", f"0-{cores - 1}"] + argv
    proc = subprocess.run(
        argv, capture_output=True, text=True, cwd=_ROOT,
        env=os.environ, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE "):
            return json.loads(line[len("PROBE "):])
    raise RuntimeError(proc.stderr[-1500:])


def main():
    import bench

    bench.make_corpus()
    results = {"low": LOW, "high": HIGH, "pairs": []}
    for i in range(PAIRS):
        pair = {}
        for n in (LOW, HIGH):
            b = bench.build_at(n)
            j = run_pinned(
                "import json, bench; "
                f"print('PROBE ' + json.dumps(bench.jvm_shuffle_inprocess({n})))",
                n,
            )
            pair[str(n)] = {
                "build_docs_per_sec": b["docs_per_sec"],
                "build_wall": b["wall_sec"],
                "jvm_shuffle_wall": round(j, 2),
            }
            print(
                f"pair {i} local[{n}]: build {b['docs_per_sec']}/s "
                f"jvm {j:.2f}s loadavg {os.getloadavg()[0]:.2f}",
                file=sys.stderr, flush=True,
            )
        results["pairs"].append(pair)

    def best(key, n):
        vals = [p[str(n)][key] for p in results["pairs"]]
        return max(vals) if key == "build_docs_per_sec" else min(vals)

    ratio = HIGH / LOW
    b_eff = best("build_docs_per_sec", HIGH) / (
        ratio * best("build_docs_per_sec", LOW)
    )
    j_eff = best("jvm_shuffle_wall", LOW) / (
        ratio * best("jvm_shuffle_wall", HIGH)
    )
    results["build_scaling_efficiency"] = round(b_eff, 3)
    results["jvm_shuffle_scaling_efficiency"] = round(j_eff, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
