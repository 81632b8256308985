"""Anomaly / level-shift detection over rolled tiers (ops/anomaly.py).

The operators decide in exact cross-multiplied int64, so every test here
compares against an independent numpy/python recomputation of the same
predicate — bit-equality, no tolerances. The registry queries'
cross-engine proof lives in the DuckDB mirror (pytest_only_oracles);
these tests pin semantics on planted series where the right answer is
known by construction.
"""

import datetime

import numpy as np
import pytest

from tmframe_spark.ops.anomaly import level_shifts, robust_anomalies

T0 = datetime.datetime(2024, 1, 1)


def _series(spark, values, conv="c0"):
    rows = [
        (conv, T0 + datetime.timedelta(minutes=i), int(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "conv_id string, bucket timestamp, turns long")


def _ref_anomalies(values, window, min_n, k):
    """Single-threaded reference: same predicate, python big ints."""
    out = []
    for i, v in enumerate(values):
        lo = max(0, i - window)
        base = values[lo:i]
        n = len(base)
        if n < min_n:
            continue
        s = sum(base)
        ss = sum(x * x for x in base)
        num = n * (n * v - s) ** 2
        den = n * ss - s * s
        if num > k * k * den:
            out.append((i, n, num, den))
    return out


def test_spike_on_noisy_baseline_flagged(spark):
    # deterministic "noisy" baseline (values 4..6), one 50-spike at i=80
    vals = [4 + (i * 7) % 3 for i in range(120)]
    vals[80] = 50
    got = sorted(
        robust_anomalies(_series(spark, vals), window=60, min_n=12, k=3).collect(),
        key=lambda r: r["bucket"],
    )
    ref = _ref_anomalies(vals, 60, 12, 3)
    assert [(r["bucket"].minute + 60 * r["bucket"].hour) for r in got] == [
        i for i, *_ in ref
    ]
    assert any(r["value"] == 50 for r in got)
    # exact decision integers match the reference bit-for-bit
    by_i = {i: (n, num, den) for i, n, num, den in ref}
    for r in got:
        i = r["bucket"].minute + 60 * r["bucket"].hour
        assert (r["n"], r["num"], r["den"]) == by_i[i]


def test_constant_series_flags_nothing_but_departures(spark):
    vals = [5] * 100
    assert robust_anomalies(_series(spark, vals), window=60, min_n=12).count() == 0
    # variance-0 baseline: ANY departing value must flag (den == 0 branch)
    vals[70] = 6
    got = robust_anomalies(_series(spark, vals), window=60, min_n=12).collect()
    assert [r["value"] for r in got] == [6]
    assert got[0]["den"] == 0 and got[0]["num"] > 0


def test_min_n_gates_short_history(spark):
    vals = [1, 1, 1, 1, 100]
    assert robust_anomalies(_series(spark, vals), window=60, min_n=12).count() == 0


def test_anomaly_multi_conv_partition_isolation(spark):
    # c1's wild values must not contaminate c0's baseline
    a = _series(spark, [5] * 40 + [50], conv="c0")
    b = _series(spark, [0, 1000] * 25, conv="c1")
    got = robust_anomalies(a.unionByName(b), window=30, min_n=12, k=3)
    flagged = {(r["conv_id"], r["value"]) for r in got.collect()}
    assert ("c0", 50) in flagged
    assert all(c == "c0" or v in (0, 1000) for c, v in flagged)


def _ref_shifts(values, window, min_n, delta):
    out = []
    for i in range(len(values)):
        prev = values[max(0, i - window) : i]
        nxt = values[i : i + window]
        n_p, n_n = len(prev), len(nxt)
        if n_p < min_n or n_n < min_n:
            continue
        diff = sum(nxt) * n_p - sum(prev) * n_n
        if abs(diff) > delta * n_p * n_n:
            out.append((i, diff))
    return out


def test_step_function_shift_detected_at_boundary(spark):
    vals = [2] * 60 + [8] * 60
    got = level_shifts(_series(spark, vals), window=30, min_n=30, delta=2).collect()
    ref = _ref_shifts(vals, 30, 30, 2)
    idx = sorted(r["bucket"].minute + 60 * r["bucket"].hour for r in got)
    assert idx == [i for i, _ in ref]
    # the exact-boundary row (first minute of the new regime) qualifies,
    # and the maximal contrast is achieved there
    assert 60 in idx
    by_i = {r["bucket"].minute + 60 * r["bucket"].hour: r["diff"] for r in got}
    assert by_i[60] == max(by_i.values())
    assert {r["diff"] for r in got} == {d for _, d in ref}


def test_flat_series_has_no_shifts(spark):
    vals = [3] * 120
    assert level_shifts(_series(spark, vals), window=30, min_n=30, delta=1).count() == 0


def test_shift_reference_parity_on_irregular_series(spark):
    rng = np.random.RandomState(7)
    vals = [int(x) for x in rng.randint(0, 6, 90)] + [
        int(x) for x in rng.randint(10, 16, 90)
    ]
    got = level_shifts(_series(spark, vals), window=25, min_n=25, delta=3).collect()
    ref = dict(_ref_shifts(vals, 25, 25, 3))
    assert len(got) == len(ref)
    for r in got:
        i = r["bucket"].minute + 60 * r["bucket"].hour
        assert r["diff"] == ref[i]
        assert r["s_next"] * r["n_prev"] - r["s_prev"] * r["n_next"] == r["diff"]


def test_empty_input(spark):
    e = _series(spark, [])
    assert robust_anomalies(e).count() == 0
    assert level_shifts(e).count() == 0


@pytest.mark.parametrize(
    "qname", ["anomaly_1m", "seasonal_anomaly_1h", "level_shift_1h"]
)
def test_registry_queries_non_vacuous(spark, qname):
    """The driver-corpus queries must actually flag rows at sf0.001 —
    an empty result would make the DuckDB oracle pass vacuously."""
    from tmframe_spark import queries as Q
    from tests.conftest import SF_DIR

    assert Q.queries()[qname](spark, SF_DIR).count() > 0


def test_seasonal_baseline_ignores_periodic_peaks(spark):
    """Daily-periodic series: hour-14 peaks are normal against their own
    season slot (but WOULD flag against the flat global baseline); a
    doubled peak on the last day is a true seasonal anomaly."""
    days, vals = 20, []
    for d in range(days):
        for h in range(24):
            vals.append(40 if h == 14 else 5)
    vals[-10] = 80  # last day's hour 14 doubled

    rows = [
        ("c0", T0 + datetime.timedelta(hours=i), int(v)) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "conv_id string, bucket timestamp, turns long")

    seasonal = robust_anomalies(
        df, window=14, min_n=7, k=3, season="hour_of_day"
    ).collect()
    assert [(r["bucket"].day, r["bucket"].hour, r["value"]) for r in seasonal] == [
        (20, 14, 80)
    ]
    # without the season the SAME normal daily peaks drown the signal:
    # every late 40 flags against the mostly-5 mixed baseline
    plain = robust_anomalies(df, window=14, min_n=7, k=3).collect()
    assert any(r["value"] == 40 for r in plain)


def test_seasonal_unknown_slot_is_loud(spark):
    df = _series(spark, [1, 2, 3])
    import pytest as _pytest

    with _pytest.raises(KeyError):
        robust_anomalies(df, season="fortnight")
