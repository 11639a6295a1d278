"""Benchmark decontamination: flag training documents that overlap an
evaluation set by shared word n-grams.

The standard pretraining hygiene step (GPT-3 appendix C, PaLM,
Llama): any training document sharing ≥1 distinct n-gram (13-grams at
production scale; configurable here) with a benchmark document is
flagged (and usually dropped) so evaluation numbers aren't inflated by
memorized test data.

Scale shape — the asymmetry is the whole design: the benchmark side is
tiny (eval suites are MBs) while the corpus side is the full 100 TB.

* benchmark → distinct n-gram set: vocabulary-sized, **broadcast**
* corpus → ``explode`` of per-document *distinct* n-grams: a narrow
  generator (no shuffle); ``array_distinct`` before the explode bounds
  the fan-out per document at its distinct-gram count
* the membership probe is a broadcast LEFT join (no shuffle of the
  corpus side), followed by one partial-agg-friendly per-doc count

So the full pass is: one scan of the corpus, zero corpus-side
shuffles beyond the final per-doc aggregation keyed by the (unique)
document key — which AQE coalesces since the output is one row per
document. Exact DuckDB oracle: `__spark_entry__.q_contamination`
replays gram construction (string_split + list_slice) and the
overlap join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _distinct_ngrams(text_col: Column, n: int) -> Column:
    """Distinct word ``n``-grams of a single-space-joined word split.

    Splits on the literal space character (consecutive spaces yield
    empty-string words on BOTH engines — Spark ``split`` with the
    default -1 limit and DuckDB ``string_split`` agree), so the oracle
    replay is exact on any input."""
    words = F.split(text_col, " ")
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(words, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_set(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """One row per (document, distinct n-gram)."""
    return df.select(
        key_col, F.explode(_distinct_ngrams(F.col(text_col), n)).alias("gram")
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document contamination report against ``benchmark``.

    Returns one row per input document: ``n_grams`` (distinct n-grams
    in the document), ``n_hit`` (of those, how many occur anywhere in
    the benchmark), ``contaminated`` (n_hit ≥ 1). Documents shorter
    than ``n`` words report (0, 0, false).

    The benchmark's distinct gram set is broadcast — see the module
    docstring for why every heavy step stays on the corpus side as a
    narrow pass. Truly ONE corpus scan: gram-less documents ride
    through as a null-gram row (``explode_outer``) rather than being
    recovered by a second scan + corpus-sized join-back."""
    bench_grams = (
        ngram_set(benchmark, key_col, text_col, n)
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    grams = docs.select(
        key_col,
        F.explode_outer(_distinct_ngrams(F.col(text_col), n)).alias("gram"),
    )
    return (
        grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(key_col)
        .agg(
            # count(gram) skips the null row a gram-less doc carries
            F.count("gram").cast("long").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"),
        )
        .select(
            key_col, "n_grams", "n_hit", (F.col("n_hit") > 0).alias("contaminated")
        )
    )


def contamination_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """``contamination`` for benchmark gram sets too large to
    broadcast as strings: broadcast a Bloom BIT TABLE of the grams
    instead (m_bits/8 bytes total, vs the raw gram strings), pre-drop
    corpus grams the filter rejects (definitely-not-present — Bloom
    has no false negatives), and exact-verify only the tiny surviving
    superset against the real gram set.

    Decision-identical to ``contamination`` by construction (pinned in
    test_trainingdata_ops): the pre-filter only removes grams the
    exact join would reject anyway. Corpus-side cost: the same one
    narrow scan, plus k md5s per gram; the exact-verify join now
    carries only the survivors, so the benchmark side no longer needs
    to fit in a string broadcast.
    """
    from .bloom import bloom_build, bloom_probe

    # bench_grams feeds bloom_build AND the exact-verify join; the
    # exploded corpus grams feed the totals agg AND the survivor path —
    # lazy-checkpoint both so neither lineage (benchmark gram explode /
    # the full corpus scan) runs twice (repo two-consumer rule)
    bench_grams = (
        ngram_set(benchmark, key_col, text_col, n)
        .select("gram")
        .distinct()
        .localCheckpoint(eager=False)
    )
    blocks = bloom_build(bench_grams, "gram", m_bits, k)

    grams_all = docs.select(
        F.col(key_col),
        F.explode_outer(_distinct_ngrams(F.col(text_col), n)).alias("gram"),
    ).localCheckpoint(eager=False)
    totals = grams_all.groupBy(key_col).agg(
        # count(gram) skips the null row a gram-less doc carries
        F.count("gram").cast("long").alias("n_grams")
    )

    survivors = bloom_probe(
        grams_all.filter(F.col("gram").isNotNull()),
        F.broadcast(blocks),
        "gram",
        m_bits,
        k,
    ).filter(F.col("maybe_member")).drop("maybe_member")
    hits = (
        survivors.join(
            bench_grams.withColumn("_hit", F.lit(1)), "gram", "left"
        )
        .groupBy(key_col)
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"))
    )
    return (
        totals.join(hits, key_col, "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)).cast("long"))
        .select(
            key_col, "n_grams", "n_hit",
            (F.col("n_hit") > 0).alias("contaminated"),
        )
    )
