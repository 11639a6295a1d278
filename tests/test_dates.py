"""Publication-date extraction (operators/dates): priority order,
validation (leap years, month lengths), the invalid-match-means-
undated decision, and the narrow-plan gate."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.dates import with_pub_date


def _extract(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string")
    rows = with_pub_date(df).orderBy("id").collect()
    return [(r.pub_date, r.date_kind) for r in rows]


def test_shapes_and_priority(spark):
    got = _extract(spark, [
        "released 2023-07-19 worldwide",
        "Published on March 5, 2021.",
        "Updated 11/23/2019 at noon",
        # iso beats us_long beats slash when several present
        "March 5, 2021 but canonical 2020-01-02",
        "9/9/1999 then September 9, 1999",
        "no date here",
    ])
    assert got == [
        ("2023-07-19", "iso"),
        ("2021-03-05", "us_long"),
        ("2019-11-23", "slash"),
        ("2020-01-02", "iso"),
        ("1999-09-09", "us_long"),
        (None, None),
    ]


def test_validation_and_leap(spark):
    got = _extract(spark, [
        "bad month 2021-13-01",
        "bad day 2021-04-31",
        "leap ok 2020-02-29",
        "leap bad 2021-02-29",
        "century not leap 1900-02-29",
        "400-year leap 2000-02-29",
        "February 30, 2021 nope",
        "13/13/2013 invalid slash",
    ])
    assert got == [
        (None, None),
        (None, None),
        ("2020-02-29", "iso"),
        (None, None),
        (None, None),
        ("2000-02-29", "iso"),
        (None, None),
        (None, None),
    ]


def test_invalid_does_not_fall_through(spark):
    # an invalid ISO match makes the page undated even though a valid
    # lower-priority shape exists — documented decision
    got = _extract(spark, ["2021-02-29 then March 5, 2021"])
    assert got == [(None, None)]


def test_single_digit_slash_and_us_day(spark):
    got = _extract(spark, ["on 1/2/2003", "July 4, 1976 parade"])
    assert got == [("2003-01-02", "slash"), ("1976-07-04", "us_long")]


def test_narrow_plan(spark):
    df = spark.createDataFrame([(1, "x 2020-01-01")], "id long, text string")
    plan = with_pub_date(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
