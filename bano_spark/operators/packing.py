"""GPT-style training-sequence packing (concat-and-cut): documents are
concatenated in a deterministic order into one global token stream and
cut into fixed-length context windows ("bins") of ``context_len``
tokens. The operator reports, per document, which bins it lands in
(and whether it is split across a window boundary — the tokens whose
attention span is truncated), and per bin, the document mix.

Scale design: the only global state is the exclusive prefix sum of
token counts in concat order — computed with
``selection.distributed_cumsum`` (range-bucketed two-pass prefix sum,
no single-partition exchange). Everything downstream is embarrassingly
parallel arithmetic: a document occupying stream interval
[cum-n, cum) spans bins floor((cum-n)/C) .. floor((cum-1)/C). The
per-bin rollup explodes each document to the bins it touches —
sum(bins-per-doc) = total_tokens/C + O(n_docs) rows, i.e. linear in
input — then one hash aggregation on bin id.

This is the packing bookkeeping of LLM pretraining loaders (GPT-3
appendix B "documents are packed into sequences"; T5's "pack
sequences" preprocessing): the engine computes WHERE every document
lands without materializing token arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bano_spark.operators.selection import distributed_cumsum


def pack_sequences(docs: DataFrame, tokens_col: str, id_col: str,
                   context_len: int,
                   num_buckets: int | None = None) -> DataFrame:
    """Per-document packing map in ``id_col`` concat order. Output:
    id, n_tokens, start_off (exclusive prefix sum), first_bin,
    last_bin, n_bins, crosses_boundary. Documents with a non-positive
    token count are rejected loudly (they would produce an empty bin
    span and silently vanish from the rollup)."""
    C = int(context_len)
    if C <= 0:
        raise ValueError("context_len must be positive")
    guarded = docs.withColumn(
        tokens_col,
        F.when(F.col(tokens_col) <= 0,
               F.raise_error(F.lit(
                   "pack_sequences: non-positive token count — filter "
                   "empty documents upstream")))
        .otherwise(F.col(tokens_col)))
    cum = distributed_cumsum(guarded, id_col, [F.asc(id_col)],
                             tokens_col, out_col="_cum",
                             num_buckets=num_buckets)
    start = F.col("_cum") - F.col(tokens_col)
    first_bin = F.floor(start / C)
    last_bin = F.floor((F.col("_cum") - 1) / C)
    return (cum.withColumn("start_off", start.cast("bigint"))
            .withColumn("first_bin", first_bin.cast("bigint"))
            .withColumn("last_bin", last_bin.cast("bigint"))
            .withColumn("n_bins",
                        (F.col("last_bin") - F.col("first_bin") + 1)
                        .cast("bigint"))
            .withColumn("crosses_boundary", F.col("n_bins") > 1)
            .drop("_cum"))


def packing_bin_stats(packed: DataFrame, tokens_col: str, id_col: str,
                      context_len: int) -> DataFrame:
    """Per-bin mix from a :func:`pack_sequences` output: number of
    documents touching the bin, documents starting in it, documents
    split across either of its edges, and the token count the bin
    holds (== context_len for every bin but the last). One explode
    (linear) + one hash aggregation on bin id."""
    C = int(context_len)
    e = packed.withColumn(
        "bin", F.explode(F.sequence("first_bin", "last_bin")))
    end = F.col("start_off") + F.col(tokens_col)
    tok_in_bin = (F.least(end, (F.col("bin") + 1) * C)
                  - F.greatest(F.col("start_off"), F.col("bin") * C))
    return (e.withColumn("_tok", tok_in_bin)
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("first_bin") == F.col("bin"), 1)
                       .otherwise(0)).cast("bigint").alias("n_start_docs"),
                 F.sum(F.when(F.col("crosses_boundary"), 1)
                       .otherwise(0)).cast("bigint").alias("n_split_docs"),
                 F.sum("_tok").cast("bigint").alias("n_tokens")))
