"""JSON-LD extraction: block regex shapes, parse lanes (object /
array / malformed), value serialization, and the rollup."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.structured import (
    extract_jsonld,
    extract_jsonld_blocks,
    jsonld_typed_entities,
)

PAGE = (
    "<html><head>"
    '<script src="app.js"></script>'
    '<script type="application/ld+json">'
    '{"@context":"https://schema.org","@type":"MusicGroup",'
    '"name":"Mayhem","foundingDate":"1984","active":true}'
    "</script><body><p>text</p>"
    '<SCRIPT TYPE="application/ld+json">'
    '{"@type":"MusicAlbum","name":"DMDS","numTracks":8,'
    '"byArtist":{"@type":"MusicGroup","name":"Mayhem"}}'
    "</SCRIPT>"
    '<script type="application/ld+json">{broken</script>'
    '<script type="application/ld+json">[{"@type":"ItemList"}]</script>'
    '<script type="application/ld+json">{"name":"untyped"}</script>'
    "</body></html>"
)


def _pages(spark):
    return spark.createDataFrame(
        [("http://m.com/p", PAGE)], "url string, html string"
    )


def test_blocks_in_page_order(spark):
    rows = extract_jsonld_blocks(_pages(spark)).orderBy("block_idx").collect()
    assert [r["block_idx"] for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0]["json_text"].startswith('{"@context"')
    assert rows[2]["json_text"] == "{broken"


def test_properties_lanes_and_serialization(spark):
    got = {
        (r["block_idx"], r["prop"]): (r["item_type"], r["value"])
        for r in extract_jsonld(_pages(spark)).collect()
    }
    # block 0: three non-@ props; @context/@type skipped
    assert got[(0, "name")] == ("MusicGroup", "Mayhem")
    assert got[(0, "foundingDate")] == ("MusicGroup", "1984")
    assert got[(0, "active")] == ("MusicGroup", "true")
    # block 1: number as raw text, nested object minified
    assert got[(1, "numTracks")] == ("MusicAlbum", "8")
    assert got[(1, "byArtist")] == (
        "MusicAlbum",
        '{"@type":"MusicGroup","name":"Mayhem"}',
    )
    # block 4: no @type declared -> NULL item_type
    assert got[(4, "name")] == (None, "untyped")
    # malformed (2) and top-level array (3) dropped entirely
    assert not any(b in (2, 3) for b, _ in got)
    assert len(got) == 7


def test_rollup(spark):
    roll = {
        (r["item_type"], r["prop"]): (r["n_rows"], r["n_values"])
        for r in jsonld_typed_entities(extract_jsonld(_pages(spark))).collect()
    }
    assert roll[("MusicGroup", "name")] == (1, 1)
    assert roll[("MusicAlbum", "numTracks")] == (1, 1)


def test_no_shuffle_in_extract_plan(spark):
    plan = (
        extract_jsonld(_pages(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_jsonld_extracted_matches_pipeline_schema(spark):
    from metal_history_knowledge_graph_spark.operators.extract import (
        EXTRACTED_SCHEMA,
        mentions_of,
        relationships_of,
    )
    from metal_history_knowledge_graph_spark.operators.structured import (
        jsonld_extracted,
    )

    rows = jsonld_extracted(extract_jsonld(_pages(spark)))
    want = spark.createDataFrame([], EXTRACTED_SCHEMA).schema
    # literals make some fields non-nullable; names+types must match
    assert [(f.name, f.dataType) for f in rows.schema.fields] == [
        (f.name, f.dataType) for f in want.fields
    ]

    m = {r["name"]: r for r in mentions_of(rows).collect()}
    assert m["Mayhem"]["entity_type"] == "band"
    assert m["Mayhem"]["formed_year"] == 1984
    assert m["Mayhem"]["confidence"] == 1.0
    assert m["DMDS"]["entity_type"] == "album"
    assert m["DMDS"]["artist"] == "Mayhem"
    # untyped block emits nothing
    assert "untyped" not in m

    r = relationships_of(rows).collect()
    assert len(r) == 1
    assert (r[0]["rel_type"], r[0]["from_entity_name"],
            r[0]["to_entity_name"]) == ("RELEASED", "Mayhem", "DMDS")


def test_jsonld_unions_with_text_extraction(spark):
    from metal_history_knowledge_graph_spark.operators.structured import (
        jsonld_extracted,
    )

    rows = jsonld_extracted(extract_jsonld(_pages(spark)))
    both = rows.unionByName(rows)  # schema-compatible by construction
    assert both.count() == 2 * rows.count()
