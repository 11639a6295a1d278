"""Schema.org structured-data (JSON-LD) extraction from raw HTML —
the modern web's SELF-DECLARED knowledge graph. Publishers embed
``<script type="application/ld+json">`` blocks describing entities
(MusicGroup, MusicAlbum, Person, Event …) precisely so machines can
read facts without NLP; a web-scale KG pipeline mines these FIRST and
lets text extraction (operators/extract.py) fill the gaps. The
reference extracts the same fact shapes from prose via LLM calls
(src/extraction/); this operator gets them for free where the page
declares them, emitting rows the existing triples/canonicalize stages
can consume alongside text-derived mentions.

Scope (documented contract): top-level properties of top-level JSON
OBJECTS. Nested objects/arrays are captured as their minified JSON
text (both Jackson and DuckDB's JSON type re-serialize minified, which
is what makes the oracle exact) — callers needing depth re-run the
operator over those values. Top-level arrays and malformed JSON are
dropped: the garbage lane of real-world markup. ``@``-prefixed keys
are JSON-LD syntax, not facts; ``@type`` is surfaced as its own
column and the rest are skipped.

Scale shape: block extraction is one narrow ``regexp_extract_all`` +
``posexplode`` (whole-stage codegen, fuses into the HTML scan);
parsing is the native ``from_json`` to ``map<string,string>`` (JVM
Jackson — NO Python in the loop, unlike a BeautifulSoup-style parse);
property explosion is the map generator. No shuffle anywhere — the
output lands partitioned exactly like the input pages, ready for the
mention-keyed stages downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: lazy across newlines, case-insensitive; group 1 = the JSON payload.
#: Shared verbatim (RE2/Java common subset) with the DuckDB oracle.
JSONLD_SCRIPT_RE = (
    r'(?is)<script[^>]*type="application/ld\+json"[^>]*>(.*?)</script>'
)


def extract_jsonld_blocks(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, block_idx, json_text): every JSON-LD script payload in
    page order, 0-indexed per page. One narrow generator projection."""
    return df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(JSONLD_SCRIPT_RE), 1)
        ).alias("block_idx", "json_text"),
    )


def jsonld_properties(blocks: DataFrame) -> DataFrame:
    """(url, block_idx, item_type, prop, value) from parsed top-level
    objects; malformed JSON / top-level arrays are dropped, ``@`` keys
    skipped (``@type`` becomes the item_type column, NULL when the
    block does not declare one). Values are strings: scalars as their
    JSON text (unquoted), nested structures as minified JSON."""
    m = F.from_json(F.trim(F.col("json_text")), "map<string,string>")
    return (
        blocks.select("url", "block_idx", m.alias("m"))
        .filter(F.col("m").isNotNull())
        .select(
            "url",
            "block_idx",
            F.col("m")["@type"].alias("item_type"),
            F.explode("m").alias("prop", "value"),
        )
        .filter(~F.col("prop").startswith("@"))
    )


def jsonld_typed_entities(props: DataFrame) -> DataFrame:
    """Per (item_type, prop) corpus rollup: how many declared entities
    of each type carry each property, and how many distinct values —
    the coverage table that decides which schema.org predicates are
    worth wiring into the KG predicate whitelist. One partial-agg
    groupBy on a vocabulary-sized key."""
    return props.groupBy("item_type", "prop").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("value").cast("long").alias("n_values"),
    )


def extract_jsonld(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Pages → (url, block_idx, item_type, prop, value): the one-call
    composition."""
    return jsonld_properties(extract_jsonld_blocks(df, html_col, url_col))
