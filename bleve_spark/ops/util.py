"""Shared op helpers."""

from pyspark.sql import Column, functions as F


def r4(col: Column) -> Column:
    """Explicit half-up rounding to 4 decimals: floor(x*10000+0.5)/10000.

    Used instead of round() so the DuckDB oracle can use the *same
    expression* — built-in round() differs in half-way tie handling
    across engines."""
    return F.floor(col * 10000 + F.lit(0.5)) / F.lit(10000.0)


R4_SQL = "floor({expr}*10000+0.5)/10000"


def ensure_parallelism(df, factor: int = 2):
    """Repartition up to factor x defaultParallelism when the source
    produced fewer partitions (e.g. a small parquet file with few row
    groups feeding a CPU-heavy shingle/UDF stage). A no-op on inputs
    that are already well-partitioned — at cluster scale the scan
    itself yields thousands of partitions and this adds no shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
