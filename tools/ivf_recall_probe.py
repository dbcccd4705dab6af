"""IVF recall/latency probe at 10^6 vectors — the ops/ivf.py analogue
of the round-3 LSH study in BASELINE.md (same synthetic corpus shape:
1000 clusters x 1000 members, 32 dims, noise sigma 0.1; ground truth =
exact numpy top-10 per query).

Usage: python tools/ivf_recall_probe.py [n] [n_cells] [out_json]
Measures recall@10 mean/min + scanned-fraction at several nprobe
levels, plus per-query latency stamped-cells vs brute force.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_CELLS = int(sys.argv[2]) if len(sys.argv) > 2 else 256
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ivf_recall.json"
DIM, N_CLUSTERS, SIGMA, N_QUERIES = 32, 1000, 0.1, 20


def main():
    from pyspark.sql import functions as F

    from bleve_spark.ops import ivf
    from bleve_spark.session import get_spark

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((N_CLUSTERS, DIM)).astype(np.float32)
    cl = np.arange(N) % N_CLUSTERS
    vecs = centers[cl] + SIGMA * rng.standard_normal((N, DIM)).astype(
        np.float32
    )

    spark = get_spark(master="local[32]", app_name="ivf_recall")
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": np.arange(N), "embedding": list(vecs)})
    df = spark.createDataFrame(pdf)

    t0 = time.time()
    cents = ivf.ivf_fit(
        df, n_cells=N_CELLS, iters=4, seed=7, sample=100_000
    )
    fit_s = time.time() - t0
    t0 = time.time()
    stamped = ivf.assign_cells(df, cents).persist()
    stamped.count()
    stamp_s = time.time() - t0

    cell_sizes = {
        r["ivf_cell"]: r["c"]
        for r in stamped.groupBy("ivf_cell").agg(
            F.count("*").alias("c")
        ).collect()
    }

    qids = rng.choice(N, N_QUERIES, replace=False)
    norms = np.linalg.norm(vecs, axis=1)
    out = {
        "n": N, "n_cells": N_CELLS, "fit_sec": round(fit_s, 2),
        "stamp_sec": round(stamp_s, 2),
        "nonempty_cells": len(cell_sizes),
        "max_cell_frac": round(max(cell_sizes.values()) / N, 4),
        "probes": {},
    }
    truth = {}
    for qid in qids:
        q = vecs[qid]
        cos = (vecs @ q) / (norms * np.linalg.norm(q) + 1e-12)
        truth[qid] = set(np.argsort(-cos)[:10].tolist())

    for nprobe in (1, 2, 4, 8):
        recalls, scan_fracs, lats = [], [], []
        for qid in qids:
            q = vecs[qid].tolist()
            cells = [
                int(c)
                for c in ivf._rank_cells(cents, q)[:nprobe]
            ]
            scan_fracs.append(
                sum(cell_sizes.get(c, 0) for c in cells) / N
            )
            t0 = time.time()
            got = {
                r["vec_id"]
                for r in ivf.ivf_topk(
                    stamped, cents, q, k=10, nprobe=nprobe,
                    id_col="vec_id",
                ).collect()
            }
            lats.append(time.time() - t0)
            recalls.append(len(got & truth[qid]) / 10.0)
        out["probes"][nprobe] = {
            "recall_mean": round(float(np.mean(recalls)), 3),
            "recall_min": round(float(np.min(recalls)), 3),
            "scan_frac": round(float(np.mean(scan_fracs)), 4),
            "lat_median_s": round(float(np.median(lats)), 3),
        }
        print(nprobe, out["probes"][nprobe], flush=True)

    # brute-force latency reference on the same cached frame
    lats = []
    from bleve_spark.ops.similarity import brute_force_topk

    for qid in qids[:5]:
        t0 = time.time()
        brute_force_topk(
            stamped.drop("ivf_cell"), vecs[qid].tolist(), k=10
        ).collect()
        lats.append(time.time() - t0)
    out["brute_lat_median_s"] = round(float(np.median(lats)), 3)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
