"""Bitext candidate mining from parallel URL structure — the
ParaCrawl/CCMatrix first-stage heuristic: two pages whose URLs are
identical except for a language path segment
(``/en/article/7`` vs ``/de/article/7``) are translation candidates.
URL pairing finds the candidates cheaply; content alignment
(embedding cosine — operators/simsearch.py) then scores them. The
single-site reference has nothing multilingual; beyond-reference
webtext surface (SURVEY §6).

Semantics (exact, oracle-replayable in RE2-safe SQL — no lookarounds):

- the language slot is the FIRST path segment matching ``xx`` or
  ``xx-YY`` (regexp_extract of the first match); the template key is
  the URL with every LITERAL ``/<lang>/`` occurrence replaced by
  ``/{L}/`` (plain ``replace`` — both engines replace all literal
  occurrences, so the rule is engine-identical; a URL whose language
  code recurs verbatim as another segment templates both, which is
  deterministic and documented);
- URLs with no language segment never pair;
- groups larger than ``max_group`` distinct (lang, url) members are
  dropped whole — the stop-key cap (dedup.py's stop-shingle idiom)
  that keeps a mega-template from emitting O(n²) pairs;
- pairs are emitted once per unordered pair, ordered lang_a < lang_b
  (ties on equal langs with different URLs are NOT pairs — same
  language twice is a duplicate, not a translation).

Scale shape: one narrow regex projection, one distinct, one
group-count join for the cap, one self-equi-join on the template key
whose fan-out is bounded by ``max_group²`` — the inverted-index pair
pattern used by every dedup family here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LANG_SEG = "/([a-z]{2}(-[A-Z]{2})?)/"


def url_lang_slot(url: Column) -> tuple[Column, Column]:
    """``(lang, template)`` columns: the first language-looking path
    segment and the URL with that literal segment templated to
    ``/{L}/``; lang is NULL (template = NULL) when no segment
    matches."""
    lang = F.regexp_extract(url, _LANG_SEG, 1)
    has = F.length(lang) > 0
    tmpl = F.replace(
        url,
        F.concat(F.lit("/"), lang, F.lit("/")),
        F.lit("/{L}/"),
    )
    return F.when(has, lang), F.when(has, tmpl)


def parallel_url_pairs(
    df: DataFrame, url_col: str = "url", max_group: int = 20
) -> DataFrame:
    """Translation-candidate URL pairs: ``(template, lang_a, url_a,
    lang_b, url_b)`` with ``lang_a < lang_b``, from groups of ≤
    ``max_group`` distinct (lang, url) members sharing a template."""
    lang, tmpl = url_lang_slot(F.col(url_col))
    rows = (
        df.filter(F.col(url_col).isNotNull())
        .select(
            tmpl.alias("template"),
            lang.alias("lang"),
            F.col(url_col).alias("url"),
        )
        .filter(F.col("template").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)  # feeds the cap count AND both join sides
    )
    ok = (
        rows.groupBy("template")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_group)
        .select("template")
    )
    kept = rows.join(ok, "template")
    a = kept.select(
        "template", F.col("lang").alias("lang_a"), F.col("url").alias("url_a")
    )
    b = kept.select(
        "template", F.col("lang").alias("lang_b"), F.col("url").alias("url_b")
    )
    return a.join(b, "template").filter(F.col("lang_a") < F.col("lang_b"))


def bitext_lang_matrix(
    df: DataFrame, url_col: str = "url", max_group: int = 20
) -> DataFrame:
    """Per language-pair candidate volume: ``(lang_a, lang_b,
    n_pairs)`` — the mining-yield report that decides which alignment
    runs are worth scheduling."""
    return (
        parallel_url_pairs(df, url_col, max_group)
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
