"""Read-side query catalog over the entity/edge tables.

Every Cypher pattern the reference's serving layer issues
(``src/api/routers/*.py``, ``scripts/analysis/query_pattern_tester.py:34-612``)
re-expressed as a DataFrame plan. All plans are Catalyst-optimizable:
filters and projections push into the parquet/Iceberg scan, the
entity-side of every join is the small dimension (broadcast), and the
per-type/per-predicate partitioning gives partition pruning for free.

Graph traversals (k-hop, shortest path) are bounded loops of self-joins
— the depth caps come from the reference API (≤3, ≤10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: typed attr projections per entity type (from attrs_json).
_TYPE_SCHEMAS = {
    "bands": "struct<formed_year:int, origin_city:string, origin_country:string, description:string>",
    "people": "struct<instruments:array<string>, associated_bands:array<string>, description:string>",
    "albums": "struct<title:string, artist:string, release_year:int, release_date:string, label:string, studio:string, description:string>",
    "songs": "struct<title:string, artist:string, album:string, track_number:int, bpm:int>",
    "subgenres": "struct<era_start:int, era_end:int, key_characteristics:string, parent_influences:array<string>>",
    "locations": "struct<city:string, region:string, country:string, scene_description:string>",
    "movements": "struct<start_year:int, key_bands:array<string>, description:string>",
    "studios": "struct<location:string, famous_for:string>",
    "labels": "struct<founded_year:int>",
    "events": "struct<date:string, type:string, description:string>",
    "equipment": "struct<type:string, manufacturer:string>",
    "venues": "struct<type:string, location:string>",
    "platforms": "struct<type:string>",
    "production_styles": "struct<key_characteristics:string>",
    "eras": "struct<era_start:int, era_end:int>",
    "media_outlets": "struct<description:string>",
    "characteristics": "struct<description:string>",
    "viral_phenomena": "struct<description:string>",
}


def entity_view(entities: DataFrame, entity_type: str) -> DataFrame:
    """Typed per-type view: partition-pruned scan + attrs unpacked."""
    schema = _TYPE_SCHEMAS.get(entity_type)
    df = entities.filter(F.col("entity_type") == entity_type)
    if schema is None:
        return df
    return df.withColumn("a", F.from_json("attrs_json", schema)).select(
        "canonical_id", "canonical_name", "name_norm", "variations",
        "first_seen", "n_mentions", "n_sources", "confidence", "a.*",
    )


# --- filter / project / sort / paginate (bands.py:13-56) -------------------

def bands_by_country(
    entities: DataFrame, country: str | None = None,
    formed_after: int | None = None, page: int = 1, page_size: int = 20,
) -> DataFrame:
    bands = entity_view(entities, "bands")
    if country:
        bands = bands.filter(F.col("origin_country") == country)
    if formed_after:
        bands = bands.filter(F.col("formed_year") >= formed_after)
    w = Window.orderBy("canonical_name")
    return (
        bands.withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") > (page - 1) * page_size)
            & (F.col("_rn") <= page * page_size)
        )
        .drop("_rn")
    )


def bands_by_country_topk(
    entities: DataFrame, country: str | None = None,
    formed_after: int | None = None, page: int = 1, page_size: int = 20,
) -> DataFrame:
    """Scale path for shallow pagination: ``ORDER BY … OFFSET/LIMIT``
    compiles to ``TakeOrderedAndProject`` — each task keeps only the
    top page·page_size rows and the merge touches k rows per partition,
    with NO unpartitioned window funnelling every surviving row through
    a single task (the scale-killer in ``bands_by_country``, kept there
    only as the oracle-compatible rn-emitting variant). Same rows as
    ``bands_by_country`` for any (page, page_size)."""
    bands = entity_view(entities, "bands")
    if country:
        bands = bands.filter(F.col("origin_country") == country)
    if formed_after:
        bands = bands.filter(F.col("formed_year") >= formed_after)
    return (
        bands.orderBy("canonical_name")
        .offset((page - 1) * page_size)
        .limit(page_size)
    )


def bands_keyset_page(
    entities: DataFrame, after_name: str | None = None,
    country: str | None = None, page_size: int = 20,
) -> DataFrame:
    """Keyset (cursor) pagination: ``WHERE canonical_name > :cursor
    ORDER BY canonical_name LIMIT ps`` — constant work per page at any
    depth (deep offsets never re-sort skipped rows); the cursor
    predicate pushes into the scan."""
    bands = entity_view(entities, "bands")
    if country:
        bands = bands.filter(F.col("origin_country") == country)
    if after_name is not None:
        bands = bands.filter(F.col("canonical_name") > after_name)
    return bands.orderBy("canonical_name").limit(page_size)


def entity_by_id(entities: DataFrame, canonical_id: int) -> DataFrame:
    """Point lookup (bands.py:58-72); id predicate prunes via stats."""
    return entities.filter(F.col("canonical_id") == canonical_id)


# --- 1-hop joins (bands.py:74-110) -----------------------------------------

def band_albums(entities: DataFrame, edges: DataFrame, band_name: str) -> DataFrame:
    albums = entity_view(entities, "albums").select(
        F.col("canonical_id").alias("obj_id"),
        F.col("canonical_name").alias("album"), "release_year",
    )
    return (
        edges.filter((F.col("pred") == "RELEASED") & (F.lower("subj_name") == band_name.lower()))
        .join(F.broadcast(albums), "obj_id")
        .select("subj_name", "album", "release_year")
        .orderBy(F.asc_nulls_last("release_year"), "album")
    )


def album_tracks(edges: DataFrame, album_name: str | None = None) -> DataFrame:
    """Album → tracks via CONTAINS_TRACK (web_graph.py album detail
    family; schema initialize_kuzu.py:186)."""
    tracks = edges.filter(F.col("pred") == "CONTAINS_TRACK").select(
        F.col("subj_name").alias("album"),
        F.col("obj_name").alias("track"),
    )
    if album_name:
        tracks = tracks.filter(F.lower("album") == album_name.lower())
    return tracks.orderBy("album", "track")


def band_cooccurrence(edges: DataFrame) -> DataFrame:
    """Band↔band co-mention pairs over MENTIONED_WITH|CONTEMPORARY_OF
    (the reference's web-graph 'related bands' query,
    src/api/routers/web_graph.py:181-186), undirected-normalized with
    per-predicate counts."""
    e = edges.filter(F.col("pred").isin("MENTIONED_WITH", "CONTEMPORARY_OF"))
    und = e.select(
        F.least("subj_name", "obj_name").alias("band1"),
        F.greatest("subj_name", "obj_name").alias("band2"),
        "pred",
    )
    return (
        und.groupBy("band1", "band2")
        .agg(
            F.sort_array(F.collect_set("pred")).alias("predicates"),
            F.count(F.lit(1)).alias("n_links"),
        )
        .orderBy("band1", "band2")
    )


def band_members(edges: DataFrame, band_name: str) -> DataFrame:
    return (
        edges.filter((F.col("pred") == "MEMBER_OF") & (F.lower("obj_name") == band_name.lower()))
        .select(
            F.col("subj_name").alias("person"),
            F.col("obj_name").alias("band"),
            F.col("props")["role"].alias("role"),
            F.col("props")["year"].alias("year"),
        )
        .orderBy("person")
    )


# --- bounded traversals (graph.py:13-63, query_pattern_tester.py) ----------

def neighborhood(edges: DataFrame, node_id: int, depth: int = 2) -> DataFrame:
    """Undirected var-length neighborhood ``-[*1..depth]-`` (depth ≤ 3):
    iterative frontier expansion, each hop one (broadcastable) join."""
    depth = min(depth, 3)
    sym = edges.select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst"), "pred"
    ).unionByName(
        edges.select(
            F.col("obj_id").alias("src"), F.col("subj_id").alias("dst"), "pred"
        )
    )
    frontier = sym.filter(F.col("src") == node_id).select(
        "dst", F.lit(1).alias("hops")
    )
    seen = frontier
    for hop in range(2, depth + 1):
        frontier = (
            sym.join(
                F.broadcast(frontier.select(F.col("dst").alias("src"))).distinct(), "src"
            )
            .select("dst", F.lit(hop).alias("hops"))
            .join(seen.select("dst").distinct(), "dst", "left_anti")
            .distinct()
        )
        seen = seen.unionByName(frontier)
    return (
        seen.filter(F.col("dst") != node_id)
        .groupBy("dst").agg(F.min("hops").alias("hops"))
    )


def influence_chains(
    edges: DataFrame, min_hops: int = 2, max_hops: int = 3,
    pred: str = "INFLUENCED_BY",
) -> DataFrame:
    """pred*min..max unrolled (query_pattern_tester.py:49-56 is the
    *2..3 default); ``pred`` also serves the reference's
    EVOLVED_INTO*1..3 tester pattern (min_hops=1)."""
    inf = edges.filter(F.col("pred") == pred).select(
        F.col("subj_id").alias("a"), F.col("subj_name").alias("a_name"),
        F.col("obj_id").alias("b"), F.col("obj_name").alias("b_name"),
    )
    cur = inf.select(
        F.col("a").alias("src"), F.col("a_name").alias("src_name"),
        F.col("b").alias("dst"), F.col("b_name").alias("dst_name"),
        F.lit(1).alias("hops"),
    ).filter(F.col("src") != F.col("dst"))
    levels = {1: cur}
    for h in range(2, max_hops + 1):
        cur = (
            cur.alias("h")
            .join(inf.alias("z"), F.col("h.dst") == F.col("z.a"))
            .select(
                F.col("h.src").alias("src"), F.col("h.src_name").alias("src_name"),
                F.col("z.b").alias("dst"), F.col("z.b_name").alias("dst_name"),
                F.lit(h).alias("hops"),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        levels[h] = cur
    selected = [lv for h, lv in levels.items() if min_hops <= h <= max_hops]
    if not selected:
        raise ValueError(f"empty hop range: min_hops={min_hops}, max_hops={max_hops}")
    out = selected[0]
    for lv in selected[1:]:
        out = out.unionByName(lv)
    return out.distinct()


def shortest_path_length(edges: DataFrame, src_id: int, dst_id: int, max_hops: int = 10) -> int | None:
    """Bounded undirected BFS (query_pattern_tester.py:365-373)."""
    sym = edges.select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    ).unionByName(
        edges.select(F.col("obj_id").alias("src"), F.col("subj_id").alias("dst"))
    ).distinct()
    frontier = sym.filter(F.col("src") == src_id).select("dst").distinct()
    visited = frontier
    for hops in range(1, max_hops + 1):
        if frontier.filter(F.col("dst") == dst_id).limit(1).count() > 0:
            return hops
        frontier = (
            sym.join(F.broadcast(frontier.select(F.col("dst").alias("src"))), "src")
            .select("dst").distinct()
            .join(visited, "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.limit(1).count() == 0:
            return None
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return None


# --- self-joins / graph analytics ------------------------------------------

def shared_members(edges: DataFrame) -> DataFrame:
    """(b1)<-[:MEMBER_OF]-(p)-[:MEMBER_OF]->(b2) (graph.py:110-174)."""
    m = edges.filter(F.col("pred") == "MEMBER_OF").select(
        F.col("subj_id").alias("person_id"), F.col("subj_name").alias("person"),
        F.col("obj_id").alias("band_id"), F.col("obj_name").alias("band"),
    )
    return (
        m.alias("x")
        .join(m.alias("y"), "person_id")
        .filter(F.col("x.band_id") < F.col("y.band_id"))
        .select(
            F.col("x.person").alias("person"),
            F.col("x.band").alias("band1"),
            F.col("y.band").alias("band2"),
        )
        .distinct()
    )


def mutual_edges(edges: DataFrame, pred: str = "INFLUENCED_BY") -> DataFrame:
    """A→B ∧ B→A (query_pattern_tester.py:74-80)."""
    e = edges.filter(F.col("pred") == pred).select("subj_id", "subj_name", "obj_id", "obj_name")
    return (
        e.alias("x")
        .join(
            e.alias("y"),
            (F.col("x.subj_id") == F.col("y.obj_id"))
            & (F.col("x.obj_id") == F.col("y.subj_id")),
        )
        .filter(F.col("x.subj_id") < F.col("x.obj_id"))
        .select(
            F.col("x.subj_name").alias("a"), F.col("x.obj_name").alias("b")
        )
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node in/out degree (graph_metrics.py:34-95)."""
    out_deg = edges.groupBy(F.col("subj_id").alias("node_id"), F.col("subj_name").alias("name")) \
        .agg(F.countDistinct("obj_id").alias("out_degree"))
    in_deg = edges.groupBy(F.col("obj_id").alias("node_id"), F.col("obj_name").alias("name")) \
        .agg(F.countDistinct("subj_id").alias("in_degree"))
    return (
        out_deg.join(in_deg, ["node_id", "name"], "full_outer")
        .fillna(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    return degree_stats(edges).groupBy("degree").count().orderBy("degree")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Undirected triangles per node via 3-way self-join
    (graph_metrics.py:177-227 clustering coefficient core)."""
    und = (
        edges.select(F.col("subj_id").alias("a"), F.col("obj_id").alias("b"))
        .unionByName(edges.select(F.col("obj_id").alias("a"), F.col("subj_id").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e_fwd = und.filter(F.col("a") < F.col("b"))
    tri = (
        e_fwd.alias("e1")
        .join(e_fwd.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            e_fwd.alias("e3"),
            (F.col("e2.b") == F.col("e3.b")) & (F.col("e1.a") == F.col("e3.a")),
        )
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node_id"))
        .groupBy("node_id").agg(F.count(F.lit(1)).alias("triangles"))
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node
    (graph_metrics.py:177-227): C(v) = 2·T(v) / (deg(v)·(deg(v)−1))
    over the undirected simple graph; nodes with degree < 2 get 0.
    Completes the triangle numerator with the coefficient division the
    reference reports."""
    und = (
        edges.select(F.col("subj_id").alias("a"), F.col("obj_id").alias("b"))
        .unionByName(edges.select(F.col("obj_id").alias("a"), F.col("subj_id").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy(F.col("a").alias("node_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    tri = triangle_counts(edges)
    return (
        deg.join(tri, "node_id", "left")
        .withColumn("triangles", F.coalesce("triangles", F.lit(0)))
        .withColumn(
            "clustering",
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0 * F.col("triangles")
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                4,
            ),
        )
    )


def influence_score(edges: DataFrame) -> DataFrame:
    """direct + 0.5·indirect influence (query_pattern_tester.py:378-389)."""
    inf = edges.filter(F.col("pred") == "INFLUENCED_BY").select(
        F.col("obj_id").alias("influencer"), F.col("obj_name").alias("name"),
        F.col("subj_id").alias("influenced"),
    )
    direct = inf.groupBy("influencer", "name").agg(
        F.countDistinct("influenced").alias("direct")
    )
    indirect = (
        inf.alias("x")
        .join(inf.alias("y"), F.col("x.influenced") == F.col("y.influencer"))
        .groupBy(F.col("x.influencer").alias("influencer"))
        .agg(F.countDistinct("y.influenced").alias("indirect"))
    )
    return (
        direct.join(indirect, "influencer", "left")
        .fillna(0, ["indirect"])
        .withColumn("score", F.col("direct") + 0.5 * F.col("indirect"))
        .orderBy(F.desc("score"), "name")
    )


# --- aggregations -----------------------------------------------------------

def bands_per_decade(entities: DataFrame) -> DataFrame:
    """(formed_year/10)*10 buckets (query_pattern_tester.py:84-93)."""
    return (
        entity_view(entities, "bands")
        .filter(F.col("formed_year").isNotNull())
        .withColumn("decade", (F.col("formed_year") / 10).cast("int") * 10)
        .groupBy("decade").agg(F.count(F.lit(1)).alias("n_bands"))
        .orderBy("decade")
    )


def band_genres(edges: DataFrame) -> DataFrame:
    """band → COLLECT(genres) (query_pattern_tester.py:104-110)."""
    return (
        edges.filter(F.col("pred") == "PLAYS_GENRE")
        .groupBy(F.col("subj_name").alias("band"))
        .agg(F.sort_array(F.collect_set("obj_name")).alias("genres"))
        .orderBy("band")
    )


def genre_popularity(edges: DataFrame, top_n: int = 10) -> DataFrame:
    return (
        edges.filter(F.col("pred") == "PLAYS_GENRE")
        .groupBy(F.col("obj_name").alias("genre"))
        .agg(F.countDistinct("subj_id").alias("n_bands"))
        .orderBy(F.desc("n_bands"), "genre")
        .limit(top_n)
    )


def scenes_by_city(edges: DataFrame, min_bands: int = 2) -> DataFrame:
    """cities with >1 band (HAVING pattern, query_pattern_tester.py:240-262)."""
    return (
        edges.filter(F.col("pred") == "FORMED_IN")
        .groupBy(F.col("obj_name").alias("city"))
        .agg(F.countDistinct("subj_id").alias("n_bands"))
        .filter(F.col("n_bands") >= min_bands)
        .orderBy(F.desc("n_bands"), "city")
    )


def activity_overlap(entities: DataFrame) -> DataFrame:
    """Theta/range join: bands active in overlapping eras
    (query_pattern_tester.py:418-431). Here: formed within 5 years."""
    b = entity_view(entities, "bands").filter(F.col("formed_year").isNotNull()) \
        .select(F.col("canonical_name").alias("band"), "formed_year")
    return (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.band") < F.col("y.band"))
            & (F.abs(F.col("x.formed_year") - F.col("y.formed_year")) <= 5),
        )
        .select(
            F.col("x.band").alias("band1"), F.col("y.band").alias("band2"),
            F.col("x.formed_year").alias("year1"), F.col("y.formed_year").alias("year2"),
        )
    )


def guest_artists(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """People with no MEMBER_OF edge (anti-join,
    query_pattern_tester.py:344-353)."""
    people = entity_view(entities, "people").select(
        F.col("canonical_id").alias("subj_id"), F.col("canonical_name").alias("person")
    )
    members = edges.filter(F.col("pred") == "MEMBER_OF").select("subj_id").distinct()
    return people.join(members, "subj_id", "left_anti").orderBy("person")


def timeline(entities: DataFrame, year_from: int, year_to: int) -> DataFrame:
    """Entities active in a year window (metal_graph_api.py:348-407)."""
    bands = entity_view(entities, "bands").select(
        F.col("canonical_name").alias("name"), F.lit("band").alias("kind"),
        F.col("formed_year").alias("year"),
    )
    albums = entity_view(entities, "albums").select(
        F.col("canonical_name").alias("name"), F.lit("album").alias("kind"),
        F.col("release_year").alias("year"),
    )
    return (
        bands.unionByName(albums)
        .filter(F.col("year").between(year_from, year_to))
        .orderBy("year", "name")
    )


def substring_search(entities: DataFrame, q: str, limit: int = 20) -> DataFrame:
    """CONTAINS search with exact/prefix-first ranking
    (src/api/routers/search.py:27-89)."""
    qn = q.lower().strip()
    hits = entities.filter(F.col("name_norm").contains(qn))
    return (
        hits.withColumn(
            "rank_key",
            F.when(F.col("name_norm") == qn, 0)
            .when(F.col("name_norm").startswith(qn), 1)
            .otherwise(2),
        )
        .orderBy("rank_key", "canonical_name")
        .limit(limit)
        .select("entity_type", "canonical_name", "rank_key")
    )


def db_stats(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """Node/edge counts per table (metal_graph_api.py:483-525)."""
    e = entities.groupBy(F.col("entity_type").alias("name")).count() \
        .withColumn("kind", F.lit("nodes"))
    r = edges.groupBy(F.col("pred").alias("name")).count() \
        .withColumn("kind", F.lit("edges"))
    return e.unionByName(r).orderBy("kind", "name")
