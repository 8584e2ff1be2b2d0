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
