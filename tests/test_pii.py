

def test_blocklist_gate(spark):
    from metal_history_knowledge_graph_spark.operators.scrub import (
        blocklist_gate,
    )

    docs = spark.createDataFrame(
        [
            (0, "clean text about metal history"),
            (1, "this has BadWord inside"),          # case-insensitive hit
            (2, "badwordish is not a token hit"),    # substring is NOT a hit
            (3, "badword badword twice"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_blocklist_hits"], r["blocklist_keep"])
        for r in blocklist_gate(docs, ["BADWORD", "other"]).collect()
    }
    assert got == {0: (0, True), 1: (1, False), 2: (0, True),
                   3: (2, False), 4: (0, True)}


def test_blocklist_plan_no_shuffle(spark):
    from metal_history_knowledge_graph_spark.operators.scrub import (
        blocklist_gate,
    )

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = (
        blocklist_gate(docs, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_blocklist_null_text_keeps(spark):
    from metal_history_knowledge_graph_spark.operators.scrub import (
        blocklist_gate,
    )

    docs = spark.createDataFrame(
        [(0, None), (1, "badword")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_blocklist_hits"], r["blocklist_keep"])
        for r in blocklist_gate(docs, ["badword"]).collect()
    }
    assert got == {0: (0, True), 1: (1, False)}
