"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016) —
the tokenizer-construction half of a training-data pipeline (the
token-COUNTING side lives in operators/textstats.py).

Scale shape — the part worth getting right at 100 TB: BPE statistics
live on the WORD VOCABULARY, not the corpus. One corpus-scale
tokenize+groupBy produces (word, count) — vocabulary-sized (Heaps'
law: ~10⁶–10⁷ rows for any web corpus) — and every merge iteration
after that runs on that small table: explode adjacent symbol pairs
weighted by count, one partial-agg sum, a driver-side argmax of ONE
row, and a narrow fold applying the merge. The corpus is touched
exactly once.

Determinism: merge selection is (count DESC, pair lexicographic ASC)
— a total order, so the learned merge sequence is replayable;
test_bpe pins the whole trajectory against a pure-Python reference
and q_bpe_first_merge gives the count+argmax stage an exact SQL
oracle.

``apply_bpe`` replays the merge list as chained narrow folds — fine
for the moderate merge counts this demo trains (each merge is one
codegen'd fold pass); a production 30k-merge tokenizer would compile
the merges into a trie and run one mapInPandas pass instead, which
is an encode-time concern, not a training one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (classic BPE: lets merges learn suffixes
#: without crossing word boundaries)
EOW = "</w>"


def _words(df: DataFrame, text_col: str) -> Column:
    # textstats._tokens is THE tokenizer (shared with BM25/LM-score/
    # span/dedup operators) — one definition to keep oracles in step
    from .textstats import _tokens

    return _tokens(F.col(text_col))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the ONE corpus-scale pass; everything downstream
    is vocabulary-sized."""
    return (
        df.select(F.explode(_words(df, text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    """word → [c1, c2, ..., cn, EOW]."""
    return F.concat(
        F.split(word, ""), F.array(F.lit(EOW))
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of adjacent
    (a, b) with a||b — one fold, the textbook BPE application rule
    ('aaa' + merge(a,a) → ['aa','a'])."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt) — adjacent-symbol pair frequencies over the
    segmented vocabulary, weighted by word count. The explode is
    vocabulary-sized × word length; the shuffle carries (a, b)
    partial sums."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def segment_vocab(words: DataFrame) -> DataFrame:
    """(word, cnt, syms) — initial character segmentation + EOW."""
    return words.select(
        "word", "cnt", _initial_symbols(F.col("word")).alias("syms")
    )


def bpe_train(
    df: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` merges; returns (merges, final segmented
    vocab). Stops early if no pair remains. Each round: one
    vocab-sized pair count, a 1-row driver argmax (count DESC, then
    (a, b) lexicographic — total order), one narrow fold."""
    vocab = segment_vocab(word_counts(df, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "word", "cnt", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, vocab


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word,
    character segmentation + the merges replayed in order (chained
    narrow folds — see the module docstring for the 30k-merge
    caveat). Output: flat token array per document."""
    words = _words(df, text_col)

    def seg(w: Column) -> Column:
        syms = _initial_symbols(w)
        for a, b in merges:
            syms = _apply_merge(syms, a, b)
        return syms

    return df.withColumn(
        out_col,
        F.flatten(F.transform(words, seg)),
    )
