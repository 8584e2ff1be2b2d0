"""Time travel: as_of(seq) must equal the state right after batch seq."""

from __future__ import annotations

from spark_streaming_with_debezium_spark.cdc.timetravel import TimeTravelStateTable


def _rows(df):
    return sorted((r.id, r.v) for r in df.collect())


def test_as_of_reconstruction(spark, tmp_path):
    t = TimeTravelStateTable(spark, str(tmp_path / "tt"), ["id"], n_buckets=4)
    t.init(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))

    live_after = {0: _rows(t.read())}
    b1 = spark.createDataFrame(
        [(2, "b2", False), (3, "c", False)], "id long, v string, deleted boolean"
    )
    t.merge_logged(b1)
    live_after[1] = _rows(t.read())

    b2 = spark.createDataFrame(
        [(1, None, True), (3, "c3", False), (4, "d", False)],
        "id long, v string, deleted boolean",
    )
    t.merge_logged(b2)
    live_after[2] = _rows(t.read())

    assert live_after[1] == [(1, "a"), (2, "b2"), (3, "c")]
    assert live_after[2] == [(2, "b2"), (3, "c3"), (4, "d")]
    for seq in (0, 1, 2):
        assert _rows(t.as_of(seq)) == live_after[seq], f"as_of({seq})"


def test_as_of_key_churn(spark, tmp_path):
    """A key deleted then re-inserted across batches reconstructs
    correctly at every point."""
    t = TimeTravelStateTable(spark, str(tmp_path / "tt"), ["id"], n_buckets=4)
    t.init(spark.createDataFrame([(7, "x")], "id long, v string"))
    t.merge_logged(
        spark.createDataFrame([(7, None, True)], "id long, v string, deleted boolean")
    )
    t.merge_logged(
        spark.createDataFrame([(7, "y", False)], "id long, v string, deleted boolean")
    )
    assert _rows(t.as_of(0)) == [(7, "x")]
    assert _rows(t.as_of(1)) == []
    assert _rows(t.as_of(2)) == [(7, "y")] == _rows(t.read())
