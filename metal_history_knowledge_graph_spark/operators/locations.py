"""Location synthesis from band data.

Port of ``scripts/pipeline/03_deduplicate_entities.sh:68-111`` (also
``scripts/automation/load_to_kuzu.py:48-90``): when the extractor found
few locations, derive location entities from each band's origin
(city, country), accumulating the band names into ``cultural_context``
("Home to bands: X, Y") — as one set-oriented aggregation instead of
the reference's driver-side dict loop.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.queries import entity_view


def synthesize_locations(entities: DataFrame, min_locations: int = 10) -> DataFrame:
    """Location rows derived from bands, for union into the entity
    table when the extracted location count is below ``min_locations``
    (the reference's trigger). Returns rows in the canonical entity
    schema with ``entity_type='locations'``."""
    n_locations = entities.filter(F.col("entity_type") == "locations").count()
    if n_locations >= min_locations:
        return entities.filter(F.lit(False))  # empty, same schema

    bands = entity_view(entities, "bands").filter(
        F.col("origin_city").isNotNull() & (F.trim("origin_city") != "")
    )
    locs = (
        bands.groupBy(
            F.col("origin_city").alias("city"),
            F.coalesce("origin_country", F.lit("")).alias("country"),
        )
        .agg(
            F.sort_array(F.collect_set("canonical_name")).alias("band_names"),
            F.min("first_seen").alias("first_seen"),
            F.sum("n_mentions").alias("n_mentions"),
        )
    )

    def attrs(city, country, bands_str):
        return F.to_json(F.struct(
            city.alias("city"),
            country.alias("country"),
            F.concat(F.lit("Metal scene in "), city).alias("scene_description"),
            F.concat(F.lit("Home to bands: "), bands_str).alias("cultural_context"),
        ))

    return locs.select(
        F.lit("locations").alias("entity_type"),
        F.col("city").alias("canonical_name"),
        F.lower(F.trim("city")).alias("name_norm"),
        "first_seen",
        attrs(F.col("city"), F.col("country"),
              F.array_join("band_names", ", ")).alias("attrs_json"),
        F.array(F.col("city")).alias("variations"),
        F.array(F.lower(F.trim("city"))).alias("member_forms"),
        "n_mentions",
        F.lit(1).alias("n_forms"),
        F.lit(0.5).alias("confidence"),
    ).withColumn(
        "canonical_id", F.xxhash64(F.lit("locations"), F.col("name_norm"))
    ).withColumn("n_sources", F.lit(0).cast("long")) \
     .withColumn("source_urls", F.array().cast("array<string>"))


def merge_synthesized_locations(entities: DataFrame, min_locations: int = 10) -> DataFrame:
    """Entity table with synthesized locations unioned in (existing
    locations win on name collision — left-anti on name_norm)."""
    synth = synthesize_locations(entities, min_locations)
    existing = entities.filter(F.col("entity_type") == "locations") \
        .select("name_norm").distinct()
    fresh = synth.join(existing, "name_norm", "left_anti")
    return entities.unionByName(fresh, allowMissingColumns=True)
