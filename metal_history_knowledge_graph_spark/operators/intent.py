"""Semantic-query intent dispatch: natural-language query → intent →
vector search + graph-context enrichment + pre-canned catalog routing.

Re-expresses the reference's ``SemanticQueryEngine``
(``scripts/search/semantic_query.py:70-130`` intent table,
``:134-199`` graph context, ``:203-257`` explanations, ``:259-331``
enhanced query loop) Spark-first:

* ``parse_intent`` keeps the reference's regex table and first-match
  semantics (including ``extracted = match.group(1)``);
* the reference fetches graph context with one Cypher round trip *per
  hit per context kind*; here ``graph_context`` builds every per-entity
  context (genres, member count, album count, person→bands, origin) as
  ONE set-oriented aggregation over the edges table, joined to the
  k-row hit set — at web scale the context table is entity-vocabulary
  sized and the joins are broadcastable;
* ``intent_route`` maps each intent to the existing query catalog
  (similar→semantic top-k, location→scenes_by_city, genre→band_genres,
  influence→influence edges, members→band_members) — the reference's
  "pre-canned graph queries";
* ``intent_search`` is the full enhanced loop: hybrid hits → context
  join → explanation column → intent-conditional 1.2× score boost
  (``semantic_query.py:305-310``).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans import queries as Q
from .embeddings import hybrid_search

#: intent regex table, reference semantic_query.py:79-109 (same order,
#: first match wins; dict order is the reference's enum order).
INTENT_PATTERNS: list[tuple[str, list[str]]] = [
    ("find_similar", [
        r"similar to (.+)",
        r"like (.+)",
        r"bands like (.+)",
        r"sounds like (.+)",
    ]),
    ("find_by_location", [
        r"(british|american|norwegian|swedish|german) .*(bands?|artists?)",
        r"bands? from (.+)",
        r"(.+) metal scene",
    ]),
    ("find_by_attribute", [
        r"from the (\d{2,4}s?)",
        r"(\d{4}) albums?",
        r"formed in (\d{4})",
    ]),
    ("find_by_genre", [
        r"(thrash|death|black|doom|power|heavy) metal",
        r"(.+) metal bands?",
    ]),
    ("find_influence", [
        r"influenced by (.+)",
        r"bands? that influenced (.+)",
        r"pioneers? of (.+)",
    ]),
    ("find_members", [
        r"(guitarist|drummer|bassist|vocalist)s? (?:in|of|from) (.+)",
        r"members? of (.+)",
    ]),
]

_MEMBER_BAND_RES = [
    re.compile(r"(?:guitarist|drummer|bassist|vocalist)s? (?:in|of|from) (.+)"),
    re.compile(r"members? of (.+)"),
]


def parse_intent(query: str) -> tuple[str, Optional[str]]:
    """(intent, extracted) — reference parse_intent
    (semantic_query.py:111-132): lowercased search, first pattern that
    matches wins, extracted = group(1)."""
    q = query.lower()
    for intent, patterns in INTENT_PATTERNS:
        for pattern in patterns:
            m = re.search(pattern, q)
            if m:
                return intent, (m.group(1) if m.groups() else None)
    return "general_search", None


def graph_context(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-entity 1-hop context table (canonical_id, genres, n_members,
    n_albums, bands, origin) — the set-oriented replacement for the
    reference's per-hit Cypher lookups (semantic_query.py:134-199)."""
    genres = (
        edges.filter(F.col("pred") == "PLAYS_GENRE")
        .groupBy(F.col("subj_id").alias("canonical_id"))
        .agg(F.sort_array(F.collect_set("obj_name")).alias("genres"))
    )
    members = (
        edges.filter(F.col("pred") == "MEMBER_OF")
        .groupBy(F.col("obj_id").alias("canonical_id"))
        .agg(F.countDistinct("subj_id").alias("n_members"))
    )
    albums = (
        edges.filter(F.col("pred") == "RELEASED")
        .groupBy(F.col("subj_id").alias("canonical_id"))
        .agg(F.countDistinct("obj_id").alias("n_albums"))
    )
    person_bands = (
        edges.filter(F.col("pred") == "MEMBER_OF")
        .groupBy(F.col("subj_id").alias("canonical_id"))
        .agg(F.sort_array(F.collect_set("obj_name")).alias("bands"))
    )
    origin = Q.entity_view(entities, "bands").select(
        "canonical_id", "origin_city", "origin_country"
    )
    base = entities.select("canonical_id")
    return (
        base.join(genres, "canonical_id", "left")
        .join(members, "canonical_id", "left")
        .join(albums, "canonical_id", "left")
        .join(person_bands, "canonical_id", "left")
        .join(origin, "canonical_id", "left")
    )


def intent_route(
    entities: DataFrame, edges: DataFrame, intent: str,
    extracted: Optional[str], query: str = "",
) -> Optional[DataFrame]:
    """Pre-canned catalog query for an intent (None → vector-only).
    Mirrors the reference's intent→query wiring with the existing
    plans.queries catalog."""
    if intent == "find_by_location":
        return Q.scenes_by_city(edges, min_bands=1)
    if intent == "find_by_genre":
        out = Q.band_genres(edges)
        if extracted:
            # genre names are canonical_names that keep first-seen
            # surface casing ('Thrash Metal') while parse_intent
            # lowercases the query — compare case-insensitively
            g = extracted.strip().lower()
            out = out.filter(
                F.exists("genres", lambda x: F.lower(x).contains(F.lit(g)))
            )
        return out
    if intent == "find_influence":
        inf = edges.filter(F.col("pred") == "INFLUENCED_BY").select(
            F.col("subj_name").alias("influenced"),
            F.col("obj_name").alias("influencer"),
        )
        if extracted:
            inf = inf.filter(F.lower("influencer").contains(extracted.strip()))
        return inf.orderBy("influenced", "influencer")
    if intent == "find_members":
        band = None
        for rx in _MEMBER_BAND_RES:
            m = rx.search(query.lower())
            if m:
                band = m.group(m.re.groups).strip()
                break
        if band:
            return Q.band_members(edges, band)
        return None
    if intent == "find_by_attribute" and extracted:
        bands = Q.entity_view(entities, "bands").filter(
            F.col("formed_year").isNotNull()
        )
        # the decade form must be tested FIRST: '1980s' is a decade
        # (1980–1989), not the exact year 1980 that a bare \d{4}
        # findall would claim
        decade = re.fullmatch(r"(\d{2}|\d{4})s", extracted.strip())
        if decade:
            d = decade.group(1)
            lo = 1900 + int(d) if len(d) == 2 else int(d) // 10 * 10
            return bands.filter(F.col("formed_year").between(lo, lo + 9)) \
                .select("canonical_name", "formed_year").orderBy("canonical_name")
        years = re.findall(r"\d{4}", extracted)
        if years:
            return bands.filter(F.col("formed_year") == int(years[0])) \
                .select("canonical_name", "formed_year").orderBy("canonical_name")
    return None


def intent_search(
    spark, entities: DataFrame, entity_vectors: DataFrame, edges: DataFrame,
    query: str, k: int = 10,
) -> DataFrame:
    """Enhanced semantic query (semantic_query.py:259-331): hybrid
    vector+keyword hits, graph-context enrichment, explanation string,
    intent-conditional combined score (1.2× on location-origin match).

    Returns (entity_type, canonical_name, intent, combined_score,
    explanation, genres, n_members)."""
    intent, extracted = parse_intent(query)
    # find_similar routes the *extracted target* into the vector search
    # (the "similar→cosine top-k" dispatch); other intents search the
    # full query like the reference.
    search_text = extracted if intent == "find_similar" and extracted else query
    hits = hybrid_search(spark, entities, entity_vectors, search_text, k=k * 2)
    ctx = graph_context(entities, edges)
    enriched = hits.join(ctx, "canonical_id", "left")

    sim = F.col("final_score")
    base_expl = (
        F.when(sim > 0.8, "Very high semantic similarity")
        .when(sim > 0.6, "Strong semantic match")
        .when(sim > 0.4, "Moderate semantic match")
    )
    intent_expl = {
        "find_similar": F.lit("Similar musical style and characteristics"),
        "find_by_location": F.when(
            F.col("origin_city").isNotNull(),
            F.concat(F.lit("Origin: "), F.col("origin_city")),
        ),
    }.get(intent, F.lit(None).cast("string"))
    explanation = F.concat_ws(
        " | ",
        *[e for e in (
            base_expl,
            intent_expl,
            F.when(F.size(F.coalesce("genres", F.array())) > 0,
                   F.concat(F.lit("Genres: "),
                            F.array_join(F.slice("genres", 1, 3), ", "))),
            F.when(F.col("n_members").isNotNull(),
                   F.concat(F.col("n_members").cast("string"),
                            F.lit(" known members"))),
        )],
    )

    boost = F.lit(1.0)
    if intent == "find_by_location" and extracted:
        origin = F.lower(F.concat_ws(" ", F.coalesce("origin_city", F.lit("")),
                                     F.coalesce("origin_country", F.lit(""))))
        boost = F.when(origin.contains(extracted.strip()), F.lit(1.2)) \
            .otherwise(F.lit(1.0))

    return (
        enriched
        .withColumn("intent", F.lit(intent))
        .withColumn("combined_score", F.round(sim * boost, 6))
        .withColumn("explanation", explanation)
        .select("entity_type", "canonical_name", "intent", "combined_score",
                "explanation", "genres", "n_members")
        .orderBy(F.desc("combined_score"), "canonical_name")
        .limit(k)
    )
