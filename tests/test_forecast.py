"""Property sweep for the EWMA backtest operator (operators/forecast.py)
— the invariants the fixed-data DuckDB oracle can't reach: arbitrary
series lengths, gap patterns, and values."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_streaming_with_debezium_spark.operators.forecast import (
    _H,
    _WEIGHTS,
    _WSUM,
    ewma_backtest,
)


def _reference(series):
    """Python reference with the SAME left-associated float ops as the
    Spark expression tree (bit-identical IEEE doubles before round)."""
    out = {}
    for i in range(_H, len(series)):
        acc = float(series[i - 1][1]) * _WEIGHTS[0]
        for j in range(1, _H):
            acc = acc + float(series[i - 1 - j][1]) * _WEIGHTS[j]
        out[series[i][0]] = acc / _WSUM
    return out


def test_ewma_backtest_matches_reference(spark):
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(  # per-day (gap_days ≥ 1, count) steps — gaps included
            st.tuples(
                st.integers(min_value=1, max_value=4),
                st.integers(min_value=0, max_value=1000),
            ),
            min_size=0,
            max_size=20,
        )
    )
    def run(steps):
        day = dt.date(2025, 1, 1)
        series = []
        for gap, v in steps:
            day = day + dt.timedelta(days=gap)
            series.append((day, v))
        daily = spark.createDataFrame(
            [("t", d, float(v)) for d, v in series] or [("t", day, 0.0)],
            "event_type string, day date, n_events double",
        )
        if not series:
            daily = daily.limit(0)
        got = {
            r["day"]: (r["n_events"], r["forecast"], r["abs_error"])
            for r in ewma_backtest(daily).collect()
        }
        want = _reference(series)
        assert set(got) == set(want)
        values = dict(series)
        for d, fc in want.items():
            n, forecast, abs_err = got[d]
            assert n == values[d]
            assert forecast == pytest.approx(fc, abs=5e-7)
            assert abs_err == pytest.approx(abs(values[d] - fc), abs=1e-6)

    run()


def test_cusum_changepoint_matches_reference(spark):
    """The integer-exact CUSUM argmax must agree with a direct Python
    reference on arbitrary series — including exact ties in |CUSUM|
    (earliest day wins) and flat series (every prefix sums to zero)."""
    from spark_streaming_with_debezium_spark.registry import load_all

    q = load_all()["events_changepoint_cusum"]

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.integers(min_value=0, max_value=50),
            min_size=1,
            max_size=25,
        )
    )
    def run(counts):
        # materialize a synthetic events table: counts[i] events on day i
        import shutil
        import tempfile

        rows = []
        eid = 0
        for i, c in enumerate(counts):
            for _ in range(c):
                rows.append(
                    (eid, dt.datetime(2025, 3, 1 + i, 12, 0, 0), 1, "t", 1.0, "{}")
                )
                eid += 1
        if not rows:  # all-zero days produce no events at all
            return
        tmp = tempfile.mkdtemp(prefix="cusum_prop_")
        try:
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string",
            ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
            got = q.fn(spark, tmp).collect()
            # python reference over days WITH events (grouped series)
            series = [(i, c) for i, c in enumerate(counts) if c > 0]
            n = len(series)
            total = sum(c for _, c in series)
            best = None  # (abs_num, day_index) — max abs, earliest day
            prefix = 0
            for i, (day_idx, c) in enumerate(series, start=1):
                prefix += c
                num = n * prefix - i * total
                key = (-abs(num), day_idx)
                if best is None or key < best[0]:
                    best = (key, day_idx, num)
            assert len(got) == 1
            row = got[0]
            assert row["n_days"] == n
            assert row["changepoint_day"] == dt.date(2025, 3, 1 + best[1])
            assert row["cusum_at_peak"] == pytest.approx(best[2] / n, abs=1e-6)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    run()
