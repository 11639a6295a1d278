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


#: schema.org → pipeline entity-type mapping (the declared-fact lanes
#: this KG consumes; unlisted types stay in the property table for
#: audits but emit no mentions).
SCHEMA_ORG_TYPES = {"MusicGroup": "band", "MusicAlbum": "album",
                    "Person": "person"}


def jsonld_extracted(props: DataFrame) -> DataFrame:
    """Publisher-declared facts as EXTRACTION ROWS: re-shape the
    property table into the exact union-typed stream
    ``operators/extract.py`` emits (EXTRACTED_SCHEMA — kind ∈
    {mention, rel}), so JSON-LD entities flow through the SAME
    canonicalize → triples → materialize path as text mentions and
    merge with them by name. Confidence is 1.0: the publisher said so
    (the blend in functions/confidence.py then favors declared facts
    over pattern hits, which is the point).

    Emitted lanes: MusicGroup → band mention (+ formed_year from
    foundingDate); Person → person mention; MusicAlbum → album
    mention (+ artist from the nested byArtist object) AND a
    band-RELEASED-album relationship row when byArtist is present.
    chunk_id = ``url#ld#block`` keeps provenance per block. One
    block-keyed pivot agg + narrow projections — no extra corpus
    pass."""
    from .extract import EXTRACTED_SCHEMA

    spark = props.sparkSession
    target = spark.createDataFrame([], EXTRACTED_SCHEMA).schema
    blocks = props.groupBy("url", "block_idx", "item_type").agg(
        F.map_from_entries(F.collect_list(F.struct("prop", "value"))).alias(
            "m"
        )
    )
    chunk_id = F.format_string(
        "%s#ld#%04d", F.col("url"), F.col("block_idx")
    )
    name = F.element_at("m", "name")
    artist = F.get_json_object(F.element_at("m", "byArtist"), "$.name")

    def _rows(base: DataFrame, values: dict) -> DataFrame:
        cols = []
        for f in target.fields:
            if f.name in values:
                cols.append(values[f.name].cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return base.select(*cols)

    typed = blocks.filter(
        F.col("item_type").isin(*SCHEMA_ORG_TYPES)
        & name.isNotNull()
        & (name != "")
    )
    mentions = _rows(
        typed,
        {
            "kind": F.lit("mention"),
            "chunk_id": chunk_id,
            "url": F.col("url"),
            "chunk_index": F.col("block_idx"),
            "idx": F.lit(0),
            "entity_type": F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in SCHEMA_ORG_TYPES.items() for x in kv]
                ),
                F.col("item_type"),
            ),
            "name": name,
            "confidence": F.lit(1.0),
            "formed_year": F.when(
                F.col("item_type") == "MusicGroup",
                F.element_at("m", "foundingDate"),
            ),
            "title": F.when(F.col("item_type") == "MusicAlbum", name),
            "artist": F.when(F.col("item_type") == "MusicAlbum", artist),
        },
    )
    rels = _rows(
        typed.filter(
            (F.col("item_type") == "MusicAlbum")
            & artist.isNotNull()
            & (artist != "")
        ),
        {
            "kind": F.lit("rel"),
            "chunk_id": chunk_id,
            "url": F.col("url"),
            "chunk_index": F.col("block_idx"),
            "idx": F.lit(1),
            "rel_type": F.lit("RELEASED"),
            "from_entity_type": F.lit("band"),
            "from_entity_name": artist,
            "to_entity_type": F.lit("album"),
            "to_entity_name": name,
        },
    )
    return mentions.unionByName(rels)
