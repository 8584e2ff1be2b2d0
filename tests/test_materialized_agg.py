"""Incremental aggregate maintenance == from-scratch recompute, for any
random CDC replay (before/after-image delta folding)."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_with_debezium_spark.cdc.envelope import TableSpec, parse_envelope
from spark_streaming_with_debezium_spark.streaming.materialized_agg import (
    MaterializedAggregate,
    changes_to_deltas,
)

SPEC = TableSpec(
    name="accounts",
    key_cols=("id",),
    value_schema=T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("nation", T.LongType()),
            T.StructField("balance", T.DoubleType()),
        ]
    ),
)

RAW_SCHEMA = "key string, value string, partition int, offset long"


def _env(op, i, off, nation=None, balance=None, before=None):
    after = None if op == "d" else {"id": i, "nation": nation, "balance": balance}
    return (
        json.dumps({"payload": {"id": i}}),
        json.dumps(
            {
                "payload": {
                    "before": before,
                    "after": after,
                    "source": {"ts_ms": 1},
                    "op": op,
                    "ts_ms": 1,
                }
            }
        ),
        0,
        off,
    )


def test_incremental_agg_matches_recompute(spark, tmp_path):
    rng = random.Random(11)
    live = {}  # id -> (nation, balance): the source-of-truth replica
    batches = []
    off = 0
    for _ in range(3):  # 3 micro-batches
        batch = []
        for _ in range(60):
            i = rng.randrange(15)
            if i in live and rng.random() < 0.25:
                before = {"id": i, "nation": live[i][0], "balance": live[i][1]}
                batch.append(_env("d", i, off, before=before))
                del live[i]
            elif i in live:
                before = {"id": i, "nation": live[i][0], "balance": live[i][1]}
                nation, bal = rng.randrange(4), round(rng.uniform(0, 100), 2)
                batch.append(_env("u", i, off, nation, bal, before))
                live[i] = (nation, bal)
            else:
                nation, bal = rng.randrange(4), round(rng.uniform(0, 100), 2)
                batch.append(_env("c", i, off, nation, bal))
                live[i] = (nation, bal)
            off += 1
        batches.append(batch)

    view = MaterializedAggregate(
        spark, str(tmp_path / "agg"), ["nation"], n_buckets=4
    )
    view.init_empty()
    for batch in batches:
        raw = spark.createDataFrame(batch, RAW_SCHEMA)
        changes = parse_envelope(raw, SPEC, include_before=True)
        # NOTE: no LWW compaction here — every event's delta must be
        # folded (compaction would drop intermediate +/- pairs).
        deltas = changes_to_deltas(changes, ["nation"], "balance")
        view.apply_deltas(deltas)

    got = {
        r.nation: (float(r.agg_sum), r.agg_count) for r in view.read().collect()
    }
    # from-scratch recompute over the final replica
    expected = {}
    for nation, bal in live.values():
        s, c = expected.get(nation, (0.0, 0))
        expected[nation] = (round(s + bal, 6), c + 1)
    got_rounded = {k: (round(v[0], 6), v[1]) for k, v in got.items()}
    assert got_rounded == expected
