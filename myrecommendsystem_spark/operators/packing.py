"""Sequence packing — assign documents to fixed token-budget bins.

Training-data pipelines pack variable-length documents into fixed-size
context windows (e.g. 8k tokens) before tokenizer sharding.  The
distributed-friendly formulation is START-OFFSET CHUNKING: order the
stream deterministically, take the running token count, and a document
belongs to bin ``floor(start_offset / budget)``.  This is one window
cumsum — no sequential recurrence, no driver loop — and is the shape real
packers use (greedy first-fit is a per-row recurrence that cannot be
expressed as a window and parallelizes poorly; start-offset chunking
differs from it only in that a bin may overrun by the one document that
straddles its boundary, which downstream tokenizers truncate or carry
over anyway).

Scale shape: ONE shuffle on the partition column, then a single in-order
pass per partition (Window with ROWS frame is streaming — no buffer
growth).  Partitions are independent packing domains; at 100 TB pick a
partition key with bounded cardinality per value (source, or
source × date shard) so no single packing domain serializes the job —
the same consideration as any windowed recurrence.  Packing across ALL
data in one global order would force a single partition; that is a
semantics choice, not an engine limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from myrecommendsystem_spark.functions import text as TXT


def pack_by_token_budget(
    df: DataFrame,
    budget: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "source",
) -> DataFrame:
    """(id, part, n_tokens, end_offset, bin_id) — deterministic bin
    assignment per partition by cumulative token start offset.

    ``bin_id = floor((end_offset - n_tokens) / budget)`` — the bin the
    document's FIRST token lands in.  Documents are never split; a
    document longer than ``budget`` owns its start bin alone (the
    overrun is visible as ``end_offset`` crossing the next boundary).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = TXT.token_count(F.col(text_col)).cast("long")
    out = df.select(
        F.col(id_col), F.col(part_col), n_tok.alias("n_tokens")
    ).withColumn("end_offset", F.sum("n_tokens").over(w))
    return out.select(
        id_col,
        part_col,
        "n_tokens",
        "end_offset",
        F.floor((F.col("end_offset") - F.col("n_tokens")) / budget)
        .cast("int")
        .alias("bin_id"),
    )
