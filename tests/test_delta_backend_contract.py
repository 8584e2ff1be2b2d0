"""Semantic contract test for the optional Delta backend.

delta-spark is not installed here, so ``DeltaStateTable.merge`` has
never executed against a real Delta table. This harness closes most of
that gap without the package: a fake ``DeltaTable`` implements the
builder API surface the backend uses and, at ``execute()``, runs the
clauses it captured under Delta's DOCUMENTED MERGE semantics
(delta.io "merge" reference):

- a source row matching a target row with the whenMatchedDelete
  condition deletes it; remaining matches apply whenMatchedUpdate;
- source rows matching no target row insert iff the
  whenNotMatchedInsert condition holds;
- >1 source row matching one target row raises (Delta's
  multiple-match error — the reason the engine compacts first,
  reference defect §2.11-4);
- unreferenced target rows are untouched.

The captured condition STRINGS and expression objects are executed
verbatim via ``F.expr`` on the aliased DataFrames — so this verifies
the exact clause structure ``DeltaStateTable.merge`` would hand to
delta-spark, not a re-implementation of it. The resulting state must
match ``ParquetStateTable`` row-for-row on an update/delete/insert/
unmatched-delete battery. What it cannot prove: delta-spark's own
internals (file layout, log protocol) — explicitly env-bound.
"""

from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import functions as F

from spark_streaming_with_debezium_spark.cdc.merge import ParquetStateTable


class FakeDeltaTable:
    """Executes the captured MERGE clauses with Delta's documented
    semantics over a parquet-backed target."""

    spark = None  # bound by the fixture

    def __init__(self, path: str):
        self.path = path
        self._talias = "t"
        self._clauses = []

    @classmethod
    def forPath(cls, spark, path):
        inst = cls(path)
        inst.spark = spark
        return inst

    def alias(self, a):
        self._talias = a
        return self

    def merge(self, source, condition):
        self._src = source
        self._cond = condition
        return self

    def whenMatchedDelete(self, condition=None):
        self._clauses.append(("matched_delete", condition, None))
        return self

    def whenMatchedUpdate(self, set=None):
        self._clauses.append(("matched_update", None, set))
        return self

    def whenNotMatchedInsert(self, condition=None, values=None):
        self._clauses.append(("not_matched_insert", condition, values))
        return self

    def execute(self):
        spark = self.spark
        tgt = spark.read.parquet(self.path)
        tgt_cols = tgt.columns
        t = tgt.withColumn("_t_present", F.lit(True)).alias(self._talias)
        # source arrives pre-aliased by the caller; re-aliasing a named
        # plan keeps the caller's alias in scope for F.expr resolution.
        s = self._src.withColumn("_s_present", F.lit(True)).alias("s")
        cond = self._cond if not isinstance(self._cond, str) else F.expr(self._cond)
        j = t.join(s, cond, "full_outer")

        matched = F.col("_t_present").isNotNull() & F.col("_s_present").isNotNull()
        # Delta errors when one target row matches multiple source rows.
        talias = self._talias
        dup = (
            j.filter(matched)
            .groupBy(*[F.col(f"{talias}.{c}") for c in tgt_cols])
            .count()
            .filter(F.col("count") > 1)
        )
        if dup.limit(1).count() > 0:
            raise RuntimeError(
                "DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE"
            )

        # Evaluate clauses in order on matched rows: first matching
        # clause wins (Delta semantics).
        delete_cond = None
        update_set = None
        insert_cond, insert_vals = None, None
        for kind, c, vals in self._clauses:
            if kind == "matched_delete":
                delete_cond = c if c is not None else F.lit(True)
            elif kind == "matched_update":
                update_set = vals
            elif kind == "not_matched_insert":
                insert_cond = c if c is not None else F.lit(True)
                insert_vals = vals

        def as_col(v):
            return F.expr(v) if isinstance(v, str) else v

        kept_target = j.filter(~matched & F.col("_t_present").isNotNull()).select(
            *[F.col(f"{talias}.{c}").alias(c) for c in tgt_cols]
        )
        surviving_matched = j.filter(matched & ~delete_cond).select(
            *[
                as_col(update_set[c]).alias(c)
                if update_set and c in update_set
                else F.col(f"{talias}.{c}").alias(c)
                for c in tgt_cols
            ]
        )
        # Delta inserts NULL for columns absent from the values map.
        inserted = j.filter(
            ~matched & F.col("_s_present").isNotNull() & insert_cond
        ).select(
            *[
                (as_col(insert_vals[c]) if c in insert_vals else F.lit(None)).alias(c)
                for c in tgt_cols
            ]
        )

        out = kept_target.unionByName(surviving_matched).unionByName(inserted)
        rows = out.collect()  # materialize before overwriting the source dir
        spark.createDataFrame(rows, tgt.schema).write.mode("overwrite").parquet(
            self.path
        )


@pytest.fixture()
def fake_delta(monkeypatch, spark):
    """Install fake `delta` / `delta.tables` modules so the backend's
    lazy import resolves to the semantic-executor fake."""
    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = FakeDeltaTable
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    yield


class ParquetBackedDeltaStateTable:
    """DeltaStateTable with init/read on parquet (the fake cannot
    intercept spark.read.format('delta')); merge() is the REAL method
    under test, exercised byte-for-byte."""

    def __init__(self, spark, path, key_cols):
        from spark_streaming_with_debezium_spark.cdc.delta_backend import (
            DeltaStateTable,
        )

        self._inner = DeltaStateTable(spark, path, key_cols)
        self.spark, self.path = spark, path

    def init(self, snapshot):
        snapshot.write.mode("overwrite").parquet(self.path)

    def read(self):
        return self.spark.read.parquet(self.path)

    def merge(self, changes, data_cols=None):
        self._inner.merge(changes, data_cols=data_cols)


def test_delta_merge_clauses_match_parquet_backend(fake_delta, spark, tmp_path):
    """The exact MERGE clause structure DeltaStateTable builds, executed
    under Delta's documented semantics, must produce the same state as
    ParquetStateTable for update/delete/insert/unmatched-delete."""
    snapshot = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id long, name string, val long",
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 11, False),   # matched update
            (2, None, None, True),  # matched delete
            (5, "e", 50, False),    # unmatched insert
            (6, None, None, True),  # unmatched delete -> NO-OP (§2.11-6)
        ],
        "id long, name string, val long, deleted boolean",
    )

    dt = ParquetBackedDeltaStateTable(spark, str(tmp_path / "delta"), ["id"])
    dt.init(snapshot)
    dt.merge(changes)
    delta_state = sorted(tuple(r) for r in dt.read().collect())

    pq = ParquetStateTable(spark, str(tmp_path / "pq"), ["id"], n_buckets=4)
    pq.init(snapshot)
    pq.merge(changes)
    parquet_state = sorted(tuple(r) for r in pq.read().collect())

    assert delta_state == parquet_state
    assert delta_state == [
        (1, "a2", 11),
        (3, "c", 30),
        (4, "d", 40),
        (5, "e", 50),
    ]


def test_delta_merge_data_cols_subset(fake_delta, spark, tmp_path):
    """data_cols restricts the update/insert column set — the
    balance-only merge shape — identically on both backends."""
    snapshot = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, val long"
    )
    changes = spark.createDataFrame(
        [(1, "IGNORED", 99, False)], "id long, name string, val long, deleted boolean"
    )
    dt = ParquetBackedDeltaStateTable(spark, str(tmp_path / "delta"), ["id"])
    dt.init(snapshot)
    dt.merge(changes, data_cols=["val"])
    got = {r["id"]: (r["name"], r["val"]) for r in dt.read().collect()}
    assert got == {1: ("a", 99), 2: ("b", 20)}

    pq = ParquetStateTable(spark, str(tmp_path / "pq"), ["id"], n_buckets=4)
    pq.init(snapshot)
    pq.merge(changes, data_cols=["val"])
    assert {r["id"]: (r["name"], r["val"]) for r in pq.read().collect()} == got


def test_delta_merge_rejects_uncompacted_batch(fake_delta, spark, tmp_path):
    """Two source rows for one key must raise Delta's multiple-match
    error — documenting WHY the engine compacts before merging
    (reference defect §2.11-4)."""
    dt = ParquetBackedDeltaStateTable(spark, str(tmp_path / "delta"), ["id"])
    dt.init(spark.createDataFrame([(1, 10)], "id long, val long"))
    dup = spark.createDataFrame(
        [(1, 11, False), (1, 12, False)], "id long, val long, deleted boolean"
    )
    with pytest.raises(RuntimeError, match="MULTIPLE_SOURCE_ROW"):
        dt.merge(dup)


def test_delta_backend_raises_cleanly_without_package(spark, tmp_path):
    """Without delta-spark the constructor fails with guidance (the
    documented env-bound behavior)."""
    from spark_streaming_with_debezium_spark.cdc.delta_backend import (
        DeltaStateTable,
        delta_available,
    )

    if delta_available():  # pragma: no cover - not this environment
        pytest.skip("delta-spark present")
    with pytest.raises(ImportError, match="delta-spark is not installed"):
        DeltaStateTable(spark, str(tmp_path / "d"), ["id"])


def _real_delta_available() -> bool:
    """True only when delta-spark (the real package, not the fake) is
    importable OUTSIDE the fake_delta fixture."""
    import importlib.util

    spec = importlib.util.find_spec("delta")
    return spec is not None and spec.origin is not None


@pytest.mark.skipif(
    not _real_delta_available(),
    reason="delta-spark not installed (sandbox); contract frozen by the "
    "fake-executor matrix above",
)
def test_real_delta_backend_matches_parquet_backend(tmp_path):
    """Optional-Delta parity gate (VERDICT r7 item 7): when delta-spark
    IS installed, run the same update/delete/insert/unmatched-delete
    battery through the REAL DeltaTable.merge and assert row-for-row
    equality with ParquetStateTable. Runs in a subprocess because Delta
    needs its session extensions configured before the SparkContext
    exists (the suite's shared session has none)."""
    import subprocess
    import sys as _sys
    import textwrap

    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {repr(str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__)))))})
        from delta import configure_spark_with_delta_pip
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master("local[4]")
            .appName("delta-parity")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.sql.extensions",
                    "io.delta.sql.DeltaSparkSessionExtension")
            .config("spark.sql.catalog.spark_catalog",
                    "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        )
        spark = configure_spark_with_delta_pip(builder).getOrCreate()
        from spark_streaming_with_debezium_spark.cdc.delta_backend import (
            DeltaStateTable,
        )
        from spark_streaming_with_debezium_spark.cdc.merge import (
            ParquetStateTable,
        )

        snapshot = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            "id long, name string, val long",
        )
        changes = spark.createDataFrame(
            [
                (1, "a2", 11, False),
                (2, None, None, True),
                (5, "e", 50, False),
                (6, None, None, True),
            ],
            "id long, name string, val long, deleted boolean",
        )
        d = DeltaStateTable(spark, {repr(str(tmp_path / "delta"))}, ["id"])
        d.init(snapshot)
        d.merge(changes)
        p = ParquetStateTable(spark, {repr(str(tmp_path / "pq"))}, ["id"], n_buckets=4)
        p.init(snapshot)
        p.merge(changes)
        got = sorted(tuple(r) for r in d.read().collect())
        want = sorted(tuple(r) for r in p.read().select(*d.read().columns).collect())
        assert got == want, (got, want)
        print("DELTA_PARITY_OK")
        """
    )
    out = subprocess.run(
        [_sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DELTA_PARITY_OK" in out.stdout
