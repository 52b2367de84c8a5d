

def test_asof_ignores_null_time_right_rows(spark):
    from pg_datalake_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, t int")
    right = spark.createDataFrame(
        [(1, None, "phantom"), (1, 5, "real"), (None, 1, "nullkey")],
        "k int, t int, v string",
    )
    got = {(r.k, r.t): r.v for r in asof_join(left, right, "k", "t", "t").collect()}
    # the NULL-time right row must never be the match (SQL: r.t <= l.t
    # is NULL, not TRUE); the NULL-key row matches no key
    assert got == {(1, 10): "real", (1, 20): "real"}
