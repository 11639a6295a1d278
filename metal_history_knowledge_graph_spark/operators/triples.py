"""Triple emission: relationship candidates → resolved, deduplicated,
provenance-tagged (subj, pred, obj) edges.

Pipeline (all set-oriented; the reference does this with per-row Kuzu
calls in ``scripts/automation/load_to_kuzu.py:638-861``):

1. union explicit relationship candidates with *inferred* ones
   (person.associated_bands ⇒ MEMBER_OF, album.artist ⇒ RELEASED —
   ``scripts/pipeline/03_deduplicate_entities.sh:223-259``);
2. normalize predicates (lowercase alias map → UPPER,
   ``load_to_kuzu.py:800-810``) and filter through the predicate
   whitelist — the reference's 27 base predicates
   (``load_to_kuzu.py:813-821``) plus the enhanced-schema predicates we
   emit (``src/schema/metal_history_schema_enhanced.cypher:104-198``);
3. dedup on ``rel_hash = md5(type|from_type|lower(from)|to_type|
   lower(to))`` keeping the first occurrence in the pinned total order
   (``extraction_pipeline.py:336-353``) — fused with provenance
   pooling into ONE mention-scale aggregation (min-struct + url
   collect_set, both map-side combinable), so the observation set is
   scanned exactly once per edges build;
4. resolve names → canonical ids via a **broadcast** join against the
   resolution map (vocabulary-sized dim table — no shuffle of the big
   side, no skew: this is the famous-band hot-key join done right);
5. provenance = normalized (edge_key, url) table + bounded sample on
   the edge rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: base whitelist, load_to_kuzu.py:813-821.
BASE_PREDICATES = [
    "FORMED_IN", "PLAYS_GENRE", "RELEASED", "ACTIVE_DURING", "MEMBER_OF",
    "PRODUCED", "PERFORMED_ON", "CONTAINS_TRACK", "RECORDED_AT", "RELEASED_BY",
    "REPRESENTS_GENRE", "INFLUENCED_BY", "EVOLVED_INTO", "ORIGINATED_IN",
    "EMERGED_DURING", "SCENE_SPAWNED", "SCENE_DEVELOPED", "DOCUMENTED_IN",
    "FEATURED_IN", "PARTICIPATED_IN", "INFLUENCED_EVENT", "HAS_CHARACTERISTIC",
    "USES_TECHNIQUE", "ALBUM_FEATURES", "MENTIONED_WITH", "CONTEMPORARY_OF",
    "CITATION",
]
#: enhanced-schema predicates this engine emits
#: (metal_history_schema_enhanced.cypher:104-198).
ENHANCED_PREDICATES = [
    "PART_OF_MOVEMENT", "USES_EQUIPMENT", "VENUE_HOSTED", "PROMOTED_ON",
    "PRODUCED_WITH_STYLE", "WENT_VIRAL",
]
PREDICATE_WHITELIST = frozenset(BASE_PREDICATES + ENHANCED_PREDICATES)

#: lowercase alias → schema predicate (load_to_kuzu.py:800-810).
PREDICATE_ALIASES = {
    "member_of": "MEMBER_OF", "formed_in": "FORMED_IN", "released": "RELEASED",
    "plays_genre": "PLAYS_GENRE", "influenced_by": "INFLUENCED_BY",
    "produced": "PRODUCED", "recorded_at": "RECORDED_AT",
}

#: relationship endpoint types are singular (extraction contract);
#: entity tables use the plural extraction types.
SINGULAR_TO_PLURAL = {
    "band": "bands", "person": "people", "album": "albums", "song": "songs",
    "subgenre": "subgenres", "genre": "subgenres", "location": "locations",
    "event": "events", "equipment": "equipment", "studio": "studios",
    "label": "labels", "movement": "movements", "venue": "venues",
    "platform": "platforms", "production_style": "production_styles",
    "era": "eras", "media_outlet": "media_outlets",
    "characteristic": "characteristics",
    "viral_phenomenon": "viral_phenomena",
}

PROVENANCE_SAMPLE = 100


def infer_relationships(entities: DataFrame) -> DataFrame:
    """Inferred rels from canonical entity attrs
    (03_deduplicate_entities.sh:223-259): person.associated_bands ⇒
    MEMBER_OF (role = first instrument, default 'member'); album.artist
    ⇒ RELEASED (year = release_year). Emitted in the canonical
    entity's first_seen order slot so dedup stays deterministic."""
    attrs = F.from_json(
        "attrs_json",
        "struct<associated_bands:array<string>, instruments:array<string>, "
        "title:string, artist:string, release_year:int, "
        "album:string, track_number:int>",
    )
    e = entities.withColumn("a", attrs)

    member_of = (
        e.filter(F.col("entity_type") == "people")
        .select(
            F.col("canonical_name").alias("from_entity_name"),
            F.explode("a.associated_bands").alias("to_entity_name"),
            F.coalesce(F.element_at("a.instruments", 1), F.lit("member")).alias("rel_role"),
            F.col("first_seen").alias("order_key"),
        )
        .select(
            F.lit("MEMBER_OF").alias("rel_type"),
            F.lit("person").alias("from_entity_type"), "from_entity_name",
            F.lit("band").alias("to_entity_type"), "to_entity_name",
            F.lit(None).cast("int").alias("rel_year"), "rel_role",
            F.lit("Inferred from associated_bands").alias("rel_context"),
            "order_key",
            F.lit(None).cast("string").alias("url"),
        )
    )
    released = (
        e.filter((F.col("entity_type") == "albums") & F.col("a.artist").isNotNull())
        .select(
            F.lit("RELEASED").alias("rel_type"),
            F.lit("band").alias("from_entity_type"),
            F.col("a.artist").alias("from_entity_name"),
            F.lit("album").alias("to_entity_type"),
            F.col("canonical_name").alias("to_entity_name"),
            F.col("a.release_year").alias("rel_year"),
            F.lit(None).cast("string").alias("rel_role"),
            F.lit("Inferred from album data").alias("rel_context"),
            F.col("first_seen").alias("order_key"),
            F.lit(None).cast("string").alias("url"),
        )
    )
    # song.album ⇒ CONTAINS_TRACK (the reference's
    # _create_contains_track_relationships, load_to_kuzu.py:765-791)
    contains_track = (
        e.filter((F.col("entity_type") == "songs") & F.col("a.album").isNotNull())
        .select(
            F.lit("CONTAINS_TRACK").alias("rel_type"),
            F.lit("album").alias("from_entity_type"),
            F.col("a.album").alias("from_entity_name"),
            F.lit("song").alias("to_entity_type"),
            F.col("canonical_name").alias("to_entity_name"),
            F.lit(None).cast("int").alias("rel_year"),
            F.lit(None).cast("string").alias("rel_role"),
            F.lit("Inferred from song data").alias("rel_context"),
            F.col("first_seen").alias("order_key"),
            F.lit(None).cast("string").alias("url"),
        )
    )
    return member_of.unionByName(released).unionByName(contains_track)


def normalize_predicates(rels: DataFrame) -> DataFrame:
    """Alias-map + uppercase + whitelist (broadcastable literal set)."""
    alias_map = F.create_map(
        *[F.lit(x) for kv in PREDICATE_ALIASES.items() for x in kv]
    )
    pred = F.coalesce(
        alias_map[F.lower(F.col("rel_type"))], F.upper(F.col("rel_type"))
    )
    return (
        rels.withColumn("pred", pred)
        .filter(F.col("pred").isin(list(PREDICATE_WHITELIST)))
    )


def _keep_first(df: DataFrame, key: str) -> DataFrame:
    """First-occurrence-wins dedup on ``key`` in the pinned total order
    — as a min(struct(order_key, ...)) aggregation, NOT a row_number
    window: struct-min partial-aggregates map-side, so a hot fact
    observed in millions of pages collapses inside each input partition
    instead of funnelling through one window sorter."""
    others = [c for c in df.columns if c != key]
    agg = df.groupBy(key).agg(
        F.min(F.struct("order_key", *[c for c in others if c != "order_key"])).alias("_r")
    )
    return agg.select(key, "_r.order_key",
                      *[F.col(f"_r.{c}") for c in others if c != "order_key"])


def dedup_relationships(rels: DataFrame) -> DataFrame:
    """md5 canonical-key dedup, first occurrence wins (pinned order)."""
    rel_hash = F.md5(
        F.concat_ws(
            "|",
            F.col("pred"),
            F.col("from_entity_type"),
            F.lower(F.col("from_entity_name")),
            F.col("to_entity_type"),
            F.lower(F.col("to_entity_name")),
        )
    )
    return _keep_first(rels.withColumn("rel_hash", rel_hash), "rel_hash")


def resolve_triples(rels: DataFrame, resolution: DataFrame) -> DataFrame:
    """Name → canonical id resolution via two broadcast joins
    (subject, object). Unresolved endpoints are dropped (the reference
    skips relationships whose entities are unknown) — count them via
    ``resolution_stats`` for the metrics checkpoint."""
    singular_map = F.create_map(
        *[F.lit(x) for kv in SINGULAR_TO_PLURAL.items() for x in kv]
    )
    r = (
        rels.withColumn("subj_etype", singular_map[F.col("from_entity_type")])
        .withColumn("obj_etype", singular_map[F.col("to_entity_type")])
        .withColumn("subj_norm", F.lower(F.trim("from_entity_name")))
        .withColumn("obj_norm", F.lower(F.trim("to_entity_name")))
    )
    res_subj = resolution.select(
        F.col("entity_type").alias("subj_etype"),
        F.col("form_norm").alias("subj_norm"),
        F.col("canonical_id").alias("subj_id"),
        F.col("canonical_name").alias("subj_name"),
    )
    res_obj = resolution.select(
        F.col("entity_type").alias("obj_etype"),
        F.col("form_norm").alias("obj_norm"),
        F.col("canonical_id").alias("obj_id"),
        F.col("canonical_name").alias("obj_name"),
    )
    return (
        r.join(F.broadcast(res_subj), ["subj_etype", "subj_norm"], "left")
        .join(F.broadcast(res_obj), ["obj_etype", "obj_norm"], "left")
    )


def build_triples(
    rels: DataFrame,
    entities: DataFrame,
    resolution: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Full triple pipeline. Returns (edges, edge_provenance).

    edges: (rel_hash, subj_id, subj_type, pred, obj_id, obj_type,
    subj_name, obj_name, props map<string,string>, n_sources,
    provenance array<string> sample).
    """
    explicit = rels.select(
        "rel_type", "from_entity_type", "from_entity_name",
        "to_entity_type", "to_entity_name",
        "rel_year", "rel_role", "rel_context", "order_key", "url",
    )
    candidates = explicit.unionByName(infer_relationships(entities))
    hashed = normalize_predicates(candidates).withColumn(
        "rel_hash",
        F.md5(F.concat_ws(
            "|", F.col("pred"), F.col("from_entity_type"),
            F.lower(F.col("from_entity_name")), F.col("to_entity_type"),
            F.lower(F.col("to_entity_name")),
        )),
    )

    # ONE mention-scale shuffle does BOTH first-occurrence dedup and
    # provenance pooling: min(struct) picks the representative row in
    # the pinned total order (identical to dedup_relationships) and
    # collect_set(url) pools every observing url — both partial-agg
    # friendly, so a fact observed in millions of pages collapses
    # map-side. The observation set is scanned exactly once per edges
    # build (previously: a materialization pass + a dedup shuffle + a
    # provenance-distinct shuffle, three mention-scale passes).
    # Buffer = distinct urls per fact; exact at sandbox scales,
    # hash-subsample urls first if a fact's source set ever outgrows
    # executor memory.
    keep_cols = [c for c in hashed.columns if c not in ("rel_hash", "order_key")]
    per_fact = (
        hashed.groupBy("rel_hash")
        .agg(
            F.min(F.struct("order_key", *keep_cols)).alias("_r"),
            F.sort_array(F.collect_set("url")).alias("_urls"),
        )
        .select("rel_hash", "_r.order_key",
                *[F.col(f"_r.{c}") for c in keep_cols], "_urls")
    )

    resolved = resolve_triples(per_fact, resolution)
    complete = resolved.filter(
        F.col("subj_id").isNotNull() & F.col("obj_id").isNotNull()
    ).withColumn(
        # Canonical edge key: two misspelled surfaces of the same fact
        # hash differently at the surface level but resolve to the same
        # (subj_id, pred, obj_id) — dedup again post-resolution.
        "edge_key",
        F.md5(F.concat_ws("|", F.col("pred"), F.col("subj_id"), F.col("obj_id"))),
    )

    # Vocabulary-sized: representative per canonical edge (same pinned
    # min-struct order as before, _urls excluded from the tie-break —
    # distinct rel_hashes always differ in an earlier field) + url pools
    # merged across the fact's surface spellings.
    rep_cols = [c for c in complete.columns
                if c not in ("edge_key", "order_key", "_urls")]
    rep = (
        complete.groupBy("edge_key")
        .agg(
            F.min(F.struct("order_key", *rep_cols)).alias("_r"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_urls")))
            ).alias("_urls"),
        )
        .select("edge_key", "_r.order_key",
                *[F.col(f"_r.{c}") for c in rep_cols], "_urls")
        # feeds both the edges table and the edge_provenance table; the
        # cut stops the mention-scale lineage re-running per consumer.
        # localCheckpoint blocks are executor-local and not
        # fault-tolerant; at cluster scale this spot is a reliable
        # checkpoint / intermediate table commit.
        .localCheckpoint(eager=True)
    )

    edges = rep.select(
        "edge_key", "rel_hash",
        "subj_id", F.col("subj_etype").alias("subj_type"), "subj_name",
        "pred",
        "obj_id", F.col("obj_etype").alias("obj_type"), "obj_name",
        F.map_filter(
            F.create_map(
                F.lit("year"), F.col("rel_year").cast("string"),
                F.lit("role"), F.col("rel_role"),
                F.lit("context"), F.col("rel_context"),
            ),
            lambda _, v: v.isNotNull(),
        ).alias("props"),
        "order_key",
        F.size("_urls").alias("n_sources"),
        F.when(F.size("_urls") > 0, F.slice("_urls", 1, PROVENANCE_SAMPLE))
        .alias("provenance"),
    )
    prov_canon = rep.select("edge_key", F.explode("_urls").alias("url"))
    return edges, prov_canon


def resolution_stats(resolved: DataFrame) -> DataFrame:
    """Unresolved-endpoint counts per predicate (metrics checkpoint)."""
    return resolved.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("subj_id").isNull(), 1).otherwise(0)).alias("unresolved_subj"),
        F.sum(F.when(F.col("obj_id").isNull(), 1).otherwise(0)).alias("unresolved_obj"),
    )
