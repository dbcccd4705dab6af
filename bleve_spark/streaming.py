"""Continuous ingestion: Structured Streaming -> index segments.

The reference is batch-only (its online path is Index/Batch calls,
/root/reference/index.go:45-61); the Spark-native generalization is a
stream of documents micro-batched into immutable segments via
foreachBatch — each micro-batch is exactly one IndexWriter.batch_index
call, so upsert/tombstone semantics, docid offsets, and snapshot
isolation are identical to the batch path, and the streaming checkpoint
makes ingestion exactly-once per micro-batch (a replayed batch rebuilds
the same segment directory deterministically).

Scale shape: the streaming job runs beside query sessions; readers open
new SearchIndex snapshots to observe newly introduced segments (the
introducer analogue, /root/reference/index/scorch/introducer.go), and a
periodic compact() bounds segment counts like the reference's merger.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .writer import IndexWriter


def stream_index(
    writer: IndexWriter,
    stream: DataFrame,
    id_expr=None,
    checkpoint: Optional[str] = None,
    trigger_available_now: bool = True,
    compact_every: int = 0,
    merge_opts=None,
):
    """Start a streaming query that indexes every micro-batch as one
    segment. Returns the StreamingQuery (caller awaits/stops it).

    compact_every: if > 0, run the TIERED merger (writer.maybe_merge,
    ref mergeplan) whenever the segment count reaches this bound —
    over-full tiers of small segments merge incrementally instead of
    rewriting the whole index per compaction. merge_opts overrides the
    MergePlanOptions.
    """
    if id_expr is None:
        id_expr = F.col("_id")

    def handle_batch(df: DataFrame, batch_id: int):
        if df.isEmpty():
            return
        writer.batch_index(df, id_expr=id_expr)
        if compact_every > 0:
            from .writer import MergePlanOptions, segment_metas

            if len(segment_metas(writer.index_path)) >= compact_every:
                writer.maybe_merge(merge_opts or MergePlanOptions())

    out = stream.writeStream.foreachBatch(handle_batch)
    if checkpoint:
        out = out.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        out = out.trigger(availableNow=True)
    return out.start()
