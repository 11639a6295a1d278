"""Entity validation + quality scoring.

Port of the reference's validation semantics
(``scripts/automation/entity_validation.py:63-219``): per-type rule
checks emitting error/warning rows, referential-integrity left-anti
joins, and the quality score ``100 − 5·errors − 2·warnings`` floored at
0. All rules are native ``F.when`` column expressions — one scan per
entity partition, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.queries import entity_view, mutual_edges

#: year sanity ranges (entity_validation.py:100-131).
BAND_YEAR_RANGE = (1960, 2026)
ALBUM_YEAR_RANGE = (1968, 2026)
MAX_NAME_LEN = 100

#: warn-list of recognized subgenres (entity_validation.py:32-33 style).
KNOWN_SUBGENRES = [
    "heavy metal", "thrash metal", "doom metal", "black metal",
    "death metal", "power metal", "speed metal", "groove metal",
    "progressive metal", "hard rock",
]


def _issues(df: DataFrame, etype: str, checks: list[tuple]) -> DataFrame:
    """checks: (severity, rule_name, condition-col that is TRUE when violated)."""
    selected = []
    for severity, rule, cond in checks:
        selected.append(
            df.filter(cond).select(
                F.lit(etype).alias("entity_type"),
                F.col("canonical_name").alias("name"),
                F.lit(severity).alias("severity"),
                F.lit(rule).alias("rule"),
            )
        )
    out = selected[0]
    for s in selected[1:]:
        out = out.unionByName(s)
    return out


def validate_entities(entities: DataFrame) -> DataFrame:
    """All rule violations: (entity_type, name, severity, rule)."""
    issues = []

    bands = entity_view(entities, "bands")
    issues.append(_issues(bands, "bands", [
        ("error", "missing_name", F.col("canonical_name").isNull() | (F.trim("canonical_name") == "")),
        ("error", "year_out_of_range",
         F.col("formed_year").isNotNull()
         & ~F.col("formed_year").between(*BAND_YEAR_RANGE)),
        ("warning", "missing_formed_year", F.col("formed_year").isNull()),
        ("warning", "missing_origin", F.col("origin_city").isNull() & F.col("origin_country").isNull()),
        ("warning", "name_too_long", F.length("canonical_name") > MAX_NAME_LEN),
    ]))

    albums = entity_view(entities, "albums")
    issues.append(_issues(albums, "albums", [
        ("error", "year_out_of_range",
         F.col("release_year").isNotNull()
         & ~F.col("release_year").between(*ALBUM_YEAR_RANGE)),
        ("warning", "missing_artist", F.col("artist").isNull()),
        ("warning", "missing_release_year", F.col("release_year").isNull()),
    ]))

    people = entity_view(entities, "people")
    issues.append(_issues(people, "people", [
        ("warning", "no_instruments", F.size(F.coalesce("instruments", F.array())) == 0),
        ("warning", "no_associated_bands", F.size(F.coalesce("associated_bands", F.array())) == 0),
    ]))

    genres = entity_view(entities, "subgenres")
    issues.append(_issues(genres, "subgenres", [
        # name_norm, not canonical_name: canonical names keep first-seen
        # surface casing ('Thrash Metal') while the known list is
        # lowercase
        ("warning", "unknown_subgenre", ~F.col("name_norm").isin(KNOWN_SUBGENRES)),
    ]))

    # duplicate canonical names within a type (should be impossible
    # post-canonicalization — an error if it happens)
    dupes = (
        entities.groupBy("entity_type", "name_norm")
        .agg(F.count(F.lit(1)).alias("n"), F.first("canonical_name").alias("canonical_name"))
        .filter(F.col("n") > 1)
        .select(
            "entity_type", F.col("canonical_name").alias("name"),
            F.lit("error").alias("severity"), F.lit("duplicate_name").alias("rule"),
        )
    )
    issues.append(dupes)

    out = issues[0]
    for s in issues[1:]:
        out = out.unionByName(s)
    return out


def referential_integrity(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """Dangling references: album.artist that resolves to no band
    entity (entity_validation.py:160-176) — left-anti join."""
    albums = entity_view(entities, "albums").filter(F.col("artist").isNotNull()) \
        .select(F.col("canonical_name").alias("album"),
                F.lower(F.trim("artist")).alias("artist_norm"))
    bands = entities.filter(F.col("entity_type") == "bands").select(
        F.explode(F.col("variations")).alias("v")
    ).select(F.lower(F.trim("v")).alias("artist_norm")).distinct()
    return albums.join(bands, "artist_norm", "left_anti").select(
        F.lit("albums").alias("entity_type"),
        F.col("album").alias("name"),
        F.lit("warning").alias("severity"),
        F.lit("unresolved_artist").alias("rule"),
    )


def graph_consistency(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """Graph-level checks expecting 0 rows
    (query_pattern_tester.py:515-612): album released before its band
    formed; self-influence loops; circular (mutual) influence pairs.
    The reference's remaining two checks are covered elsewhere: the
    missing-year warnings live in :func:`validate_entities`
    (missing_formed_year / missing_release_year), and its
    born-after-formed check is vacuous here because birth_year is not
    in the extraction schema (SURVEY §1.2 attribute scope)."""
    bands = entity_view(entities, "bands").select(
        F.col("canonical_id").alias("subj_id"), F.col("formed_year")
    )
    albums = entity_view(entities, "albums").select(
        F.col("canonical_id").alias("obj_id"), F.col("release_year")
    )
    released_too_early = (
        edges.filter(F.col("pred") == "RELEASED")
        .join(bands, "subj_id").join(albums, "obj_id")
        .filter(
            F.col("release_year").isNotNull() & F.col("formed_year").isNotNull()
            & (F.col("release_year") < F.col("formed_year"))
        )
        .select(
            F.lit("edges").alias("entity_type"),
            F.concat_ws(" RELEASED ", "subj_name", "obj_name").alias("name"),
            F.lit("error").alias("severity"),
            F.lit("released_before_formed").alias("rule"),
        )
    )
    self_loops = (
        edges.filter(F.col("subj_id") == F.col("obj_id"))
        .filter(F.col("pred") != "MENTIONED_WITH")
        .filter(~((F.col("pred") == "RELEASED") & (F.col("subj_type") == "bands")))
        .select(
            F.lit("edges").alias("entity_type"),
            F.concat_ws(" ", "subj_name", "pred", "obj_name").alias("name"),
            F.lit("warning").alias("severity"),
            F.lit("self_loop").alias("rule"),
        )
    )
    # 'Circular influence relationships' (query_pattern_tester.py:546):
    # the mutual-edge detector from the query catalog, projected into a
    # report row — ONE implementation of the 2-cycle join
    circular = mutual_edges(edges, pred="INFLUENCED_BY").select(
        F.lit("edges").alias("entity_type"),
        F.concat_ws(" <~> ", "a", "b").alias("name"),
        F.lit("error").alias("severity"),
        F.lit("circular_influence").alias("rule"),
    )
    return released_too_early.unionByName(self_loops).unionByName(circular)


def orphan_nodes(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """Entities participating in NO edge in either direction — the
    reference's orphaned-node report (``graph_explorer.py:108-135``:
    ``WHERE NOT EXISTS {{ MATCH (n)-[]-() }}`` per node type).

    Two left-anti joins against the distinct endpoint-id sets. The
    endpoint sets are canonical-entity-sized (vocabulary, not mentions)
    and the distinct collapses map-side, so at 100 TB this is two
    small-side joins AQE turns into broadcasts — never a scan-vs-scan
    shuffle of the entity table."""
    endpoint_ids = (
        edges.select(F.col("subj_id").alias("canonical_id"))
        .unionByName(edges.select(F.col("obj_id").alias("canonical_id")))
        .distinct()
    )
    return entities.join(endpoint_ids, "canonical_id", "left_anti").select(
        "entity_type", "canonical_name", "canonical_id"
    )


def quality_score(issues: DataFrame) -> float:
    """100 − 5·errors − 2·warnings, floored at 0
    (entity_validation.py:200-219)."""
    row = issues.agg(
        F.sum(F.when(F.col("severity") == "error", 1).otherwise(0)).alias("e"),
        F.sum(F.when(F.col("severity") == "warning", 1).otherwise(0)).alias("w"),
    ).head()
    errors = row.e or 0
    warnings = row.w or 0
    return max(0.0, 100.0 - 5.0 * errors - 2.0 * warnings)
