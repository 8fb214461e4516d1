"""Bloom-filter pre-filtered joins: drop non-matching probe rows
BEFORE the shuffle, with exact join semantics.

At 100 TB the dominant cost of a selective join is shuffling probe
rows that will never match (a fact table joined to a filtered
dimension typically matches <1% of its rows). Spark's runtime
row-level filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
injects this automatically for some shapes; this operator is the
explicit, composable version — usable where the optimizer doesn't
fire (e.g. a build side produced by Python-backed stages, or a probe
feeding a non-join consumer).

Design: the filter is built DISTRIBUTED (one groupBy over the build
keys' bit positions, `bit_or` partial-aggregated map-side) and shipped
as a SINGLE array literal — a constant, not 2^k expression nodes — so
the probe-side membership test is pure whole-stage codegen:
k× (xxhash64 -> word index -> getbit). False positives only ever let
extra rows THROUGH to the exact join that follows, so results are
exact for any filter size; `num_bits` tunes the shuffle saving
(default 2^16 bits ≈ 5% FP at 10k build keys; size ~10 bits/key for
~1% at larger builds — the array literal costs 8 bytes per 64 bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def build_bloom_words(keys: DataFrame, key_col: str, *,
                      num_bits: int = 1 << 16,
                      num_hashes: int = 3) -> list[int]:
    """Distributed bloom build: returns the dense word array (python
    ints, one per 64 bits). The shuffle carries at most one row per
    set word (<= num_bits/64 rows), never the key set. `num_bits`
    rounds UP to a multiple of 64 — the probe side recovers the
    modulus as len(words)*64, so build and probe must agree on it (a
    truncated word array would hash probe keys with a different
    modulus and silently drop true matches)."""
    num_bits = ((num_bits + 63) // 64) * 64
    m, n_words = num_bits, num_bits // 64
    pos = F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m))
        for i in range(num_hashes)])).alias("pos")
    words = (keys.select(pos)
             .select((F.col("pos") / 64).cast("int").alias("word"),
                     F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("bit"))
             .groupBy("word")
             .agg(F.bit_or(F.call_function(
                 "shiftleft", F.lit(1).cast("long"), F.col("bit")))
                 .alias("w"))
             .collect())
    dense = [0] * n_words
    for r in words:
        dense[r["word"]] = r["w"]
    return dense


def bloom_might_contain(words: list[int], col: Column, *,
                        num_hashes: int = 3) -> Column:
    """Codegen membership test against a word array built by
    `build_bloom_words` (shipped as ONE array literal)."""
    arr = F.lit(words)
    m = len(words) * 64
    cond = F.lit(True)
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.pmod(pos, F.lit(64)).cast("int")
        cond = cond & (F.call_function("getbit", word, bit) == 1)
    return cond


def bloom_pruned_join(probe: DataFrame, build: DataFrame, key: str, *,
                      num_bits: int = 1 << 16, num_hashes: int = 3,
                      how: str = "inner") -> DataFrame:
    """Exact `probe JOIN build ON key` with a bloom pre-filter on the
    probe side: rows whose key cannot be in `build` never reach the
    join shuffle. Output-identical to the plain join for any
    `num_bits` (false positives are removed by the exact join).

    Only inner and semi joins admit probe-side pruning: an outer or
    anti join NEEDS the non-matching probe rows the filter removes,
    so other `how` values are rejected rather than silently wrong."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_pruned_join: probe-side pruning breaks how={how!r}; "
            "only inner/semi joins are supported")
    words = build_bloom_words(build.select(key).distinct(), key,
                              num_bits=num_bits, num_hashes=num_hashes)
    # xxhash64 is TYPE-sensitive (hash(int 5) != hash(bigint 5)): align
    # the probe's hash input to the build key's type or a mismatched
    # pair silently drops every row
    probe_key = F.col(key).cast(build.schema[key].dataType)
    pruned = probe.filter(bloom_might_contain(words, probe_key,
                                              num_hashes=num_hashes))
    return pruned.join(build, key, how)
