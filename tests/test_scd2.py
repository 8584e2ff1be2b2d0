"""Incremental SCD2 maintenance (cdc/scd2.py): the core invariant is
batch-split independence — folding micro-batches onto the store must
equal the one-shot recompute over the whole log, for ANY events and
ANY batching."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable
from spark_streaming_with_debezium_spark.cdc.scd2 import scd2_apply, scd2_schema_ddl

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=0, max_value=99),  # attr value
    ),
    min_size=1,
    max_size=18,
)
CUTS = st.lists(st.integers(min_value=0, max_value=18), max_size=3)


def _reference(events):
    """Driver-side fold: the SCD2 contract, one key at a time."""
    hist = {}  # key -> list of dicts
    vnum = {}
    for i, (k, op, val) in enumerate(events):
        ts = 1000 + i
        rows = hist.setdefault(k, [])
        if rows and rows[-1]["valid_to_ms"] is None:
            rows[-1]["valid_to_ms"] = ts
            rows[-1]["is_current"] = False
        if op != "d":
            vnum[k] = vnum.get(k, 0) + 1
            rows.append(
                {
                    "id": k,
                    "val": val,
                    "version": vnum[k],
                    "valid_from_ms": ts,
                    "valid_to_ms": None,
                    "is_current": True,
                }
            )
    out = []
    for rows in hist.values():
        out.extend(rows)
    return sorted(
        (r["id"], r["version"], r["val"], r["valid_from_ms"],
         r["valid_to_ms"], r["is_current"])
        for r in out
    )


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(events=EVENTS, cuts=CUTS)
def test_scd2_incremental_equals_batch(spark, tmp_path_factory, events, cuts):
    tmp = tmp_path_factory.mktemp("scd2")
    dim = ParquetStateTable(
        spark, str(tmp / "dim"), ["id", "version"], n_buckets=4
    )
    dim.init(
        spark.createDataFrame([], scd2_schema_ddl("id long", "val long"))
    )
    rows = [
        (k, op, v, 1000 + i, i) for i, (k, op, v) in enumerate(events)
    ]
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    start = 0
    for b in bounds:
        chunk = rows[start:b]
        start = b
        if not chunk:
            continue
        batch = spark.createDataFrame(
            chunk, "id long, op string, val long, ts_ms long, offset long"
        )
        scd2_apply(dim, batch, ["id"], ["val"])
    got = sorted(
        (r["id"], r["version"], r["val"], r["valid_from_ms"],
         r["valid_to_ms"], r["is_current"])
        for r in dim.read().collect()
    )
    assert got == _reference(events)


def test_scd2_delete_then_reinsert(spark, tmp_path):
    """Deletes close without consuming a version; a later insert
    continues the numbering and becomes current."""
    dim = ParquetStateTable(
        spark, str(tmp_path / "dim"), ["id", "version"], n_buckets=2
    )
    dim.init(spark.createDataFrame([], scd2_schema_ddl("id long", "val long")))
    b1 = spark.createDataFrame(
        [(1, "c", 10, 1000, 0), (1, "u", 11, 1001, 1), (1, "d", 0, 1002, 2)],
        "id long, op string, val long, ts_ms long, offset long",
    )
    scd2_apply(dim, b1, ["id"], ["val"])
    rows = {r["version"]: r for r in dim.read().collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["valid_to_ms"] == 1001 and not rows[1]["is_current"]
    assert rows[2]["valid_to_ms"] == 1002 and not rows[2]["is_current"]

    b2 = spark.createDataFrame(
        [(1, "c", 12, 1005, 3)],
        "id long, op string, val long, ts_ms long, offset long",
    )
    scd2_apply(dim, b2, ["id"], ["val"])
    rows = {r["version"]: r for r in dim.read().collect()}
    assert rows[3]["is_current"] and rows[3]["valid_from_ms"] == 1005
    assert rows[3]["valid_to_ms"] is None
