"""Interleaved cross-version query-latency probe (round-3 verdict item
2): run the SAME queries over the SAME prebuilt index alternating
between two source trees (e.g. the round-2 snapshot and HEAD), median
of N pairs. Adjacent interleaving exposes both versions to the same
host-drift window, so the version ratio is meaningful on a noisy
shared VM (BASELINE.md documents +-23% absolute drift).

Usage:
  python tools/regression_probe.py /tmp/bleve_r2 /root/repo [pairs]
The bench index must exist (bench.py leaves /tmp/bleve_bench_idx_32)
or is built first from the bench corpus.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

IDX = "/tmp/bleve_bench_idx_32"
CORPUS_N = 250000

WORKER = r'''
import json, sys, time
sys.path.insert(0, sys.argv[1])
from bleve_spark import SearchIndex, Searcher, SearchRequest, code_corpus_mapping
from bleve_spark import query as Q
from bleve_spark.session import get_spark

spark = get_spark(master="local[32]", app_name="regprobe")
idx = SearchIndex(spark, sys.argv[2], code_corpus_mapping())

QUERIES = {
    "q_bool_conj": Q.BooleanQuery(
        must=[Q.TermQuery(field="content", term="index"),
              Q.TermQuery(field="content", term="merge")],
        must_not=[Q.TermQuery(field="content", term="license")]),
    "q_match_topk": Q.MatchQuery(field="content", text="parse index stream"),
}
# warm: one run of each outside the timers
for q in QUERIES.values():
    Searcher(idx).search(SearchRequest(query=q, size=10)).hits.collect()
out = {}
for name, q in QUERIES.items():
    t0 = time.time()
    Searcher(idx).search(SearchRequest(query=q, size=10)).hits.collect()
    out[name] = time.time() - t0
print("PROBERESULT " + json.dumps(out))
'''


def run_tree(tree: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, tree, IDX],
        capture_output=True, text=True, timeout=900,
        cwd=tree, env=os.environ,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PROBERESULT "):
            return json.loads(line[len("PROBERESULT "):])
    raise RuntimeError(proc.stderr[-2000:])


def ensure_index():
    if os.path.exists(os.path.join(IDX, "_STAGE_stats.json")) or os.path.isdir(
        os.path.join(IDX, "stats")
    ):
        return
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.make_corpus(CORPUS_N)
    bench.build_at(32, CORPUS_N)


def main():
    old_tree = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bleve_r2"
    new_tree = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    ensure_index()
    res = {"old": {}, "new": {}}
    for i in range(pairs):
        for label, tree in (("old", old_tree), ("new", new_tree)):
            r = run_tree(tree)
            for k, v in r.items():
                res[label].setdefault(k, []).append(v)
            print(f"pair {i} {label}: "
                  + " ".join(f"{k}={v:.2f}s" for k, v in r.items()),
                  file=sys.stderr, flush=True)
            time.sleep(1)
    summary = {}
    for k in res["new"]:
        mo = statistics.median(res["old"][k])
        mn = statistics.median(res["new"][k])
        summary[k] = {
            "old_median": round(mo, 3),
            "new_median": round(mn, 3),
            "new_over_old": round(mn / mo, 3),
            "old_runs": [round(v, 3) for v in res["old"][k]],
            "new_runs": [round(v, 3) for v in res["new"][k]],
        }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
