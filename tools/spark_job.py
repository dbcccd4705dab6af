#!/usr/bin/env python3
"""spark-submit entrypoint for the bleve_spark engine (north rule: the
full build+query job runs via ``spark-submit --py-files`` on
multi-executor clusters).

Package the library once:

    python tools/spark_job.py package            # -> dist/bleve_spark.zip

Then submit against any cluster (YARN/k8s/standalone/local):

    spark-submit --py-files dist/bleve_spark.zip tools/spark_job.py \
        build --corpus s3://bucket/corpus/ --index s3://bucket/index/ \
        --id-cols repo,path,commit

    spark-submit --py-files dist/bleve_spark.zip tools/spark_job.py \
        query --index s3://bucket/index/ \
        --query '{"match": "parse index stream", "field": "content"}' \
        --similarity bm25 --size 10

The build is checkpoint-resumable: re-submitting the same build command
skips completed stages via the per-stage fingerprint markers and appends
per-stage lineage/metrics rows to the index's ``manifest`` table
(bleve_spark/build.py). Executor-count scaling evidence comes from
bench.py, which runs the identical build at two parallelism levels.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# importable both under spark-submit --py-files (zip on the path) and
# when invoked directly from a checkout
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_ROOT, "bleve_spark")) and _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def _mapping(name: str):
    from bleve_spark import code_corpus_mapping, documents_mapping

    if name == "code":
        return code_corpus_mapping()
    if name == "documents":
        return documents_mapping()
    raise SystemExit(f"unknown mapping {name!r} (use: code | documents)")


def _session(args):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(args.app_name)
    if args.master:
        b = b.master(args.master)
    b = b.config("spark.sql.adaptive.enabled", "true")
    if args.shuffle_partitions:
        b = b.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    return b.getOrCreate()


def cmd_package(args):
    """Zip the bleve_spark package for --py-files shipping."""
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "dist", "bleve_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "bleve_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    print(out)


def cmd_build(args):
    from pyspark.sql import functions as F

    from bleve_spark import IndexBuilder

    spark = _session(args)
    corpus = spark.read.format(args.format).load(args.corpus)
    id_cols = args.id_cols.split(",")
    id_expr = (
        F.col(id_cols[0]) if len(id_cols) == 1 else F.concat_ws("|", *id_cols)
    )
    t0 = time.time()
    report = IndexBuilder(
        spark, _mapping(args.mapping), args.index
    ).build(corpus, id_expr=id_expr, resume=not args.no_resume)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "index": args.index,
                "wall_sec": round(wall, 2),
                "stages": report.stages,
            }
        )
    )


def cmd_query(args):
    from bleve_spark import (
        HighlightRequest,
        SearchIndex,
        Searcher,
        SearchRequest,
        parse_query,
    )
    from bleve_spark.query_string import parse_query_string

    spark = _session(args)
    idx = SearchIndex(spark, args.index, _mapping(args.mapping))
    try:
        q = parse_query(json.loads(args.query))
    except (json.JSONDecodeError, ValueError):
        q = parse_query_string(args.query)  # fall back to query-string syntax
    req = SearchRequest(
        query=q,
        size=args.size,
        from_=getattr(args, "from"),
        similarity=args.similarity,
        with_total=args.total,
        highlight=(
            HighlightRequest(fields=args.highlight.split(","))
            if args.highlight
            else None
        ),
    )
    t0 = time.time()
    res = Searcher(idx).search(req)
    rows = [r.asDict(recursive=True) for r in res.hits.collect()]
    out = {"took_sec": round(time.time() - t0, 3), "hits": rows}
    if res.total is not None:
        out["total_hits"] = res.total
    print(json.dumps(out, default=str))


def cmd_serve(args):
    """Host the REST handler layer (bleve_spark/http_api.py) from the
    Spark driver — the reference's http/*.go surface over spark-submit."""
    import time as _time

    from bleve_spark.http_api import HttpServer

    spark = _session(args)
    srv = HttpServer(spark, args.base_path, port=args.port).start()
    print(
        json.dumps(
            {"status": "serving", "port": srv.port, "base_path": args.base_path}
        ),
        flush=True,
    )
    try:
        while True:
            _time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


def main(argv=None):
    p = argparse.ArgumentParser(prog="spark_job.py", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("package", help="zip bleve_spark for --py-files")

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--master", default=None)
    common.add_argument("--app-name", default="bleve_spark")
    common.add_argument("--shuffle-partitions", type=int, default=None)
    common.add_argument("--mapping", default="code")

    b = sub.add_parser("build", parents=[common], help="build the index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--format", default="parquet")
    b.add_argument("--id-cols", default="repo,path,commit")
    b.add_argument("--no-resume", action="store_true")

    q = sub.add_parser("query", parents=[common], help="run one query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True, help="JSON query or query-string")
    q.add_argument("--size", type=int, default=10)
    q.add_argument("--from", type=int, default=0)
    q.add_argument("--similarity", default="tfidf", choices=["tfidf", "bm25"])
    q.add_argument("--total", action="store_true")
    q.add_argument("--highlight", default=None, help="comma-separated fields")

    s = sub.add_parser(
        "serve", parents=[common], help="serve the HTTP API"
    )
    s.add_argument("--base-path", required=True)
    s.add_argument("--port", type=int, default=8094)

    args = p.parse_args(argv)
    if args.cmd == "package":
        return cmd_package(args)
    if args.cmd == "build":
        return cmd_build(args)
    if args.cmd == "serve":
        return cmd_serve(args)
    return cmd_query(args)


if __name__ == "__main__":
    sys.exit(main())
