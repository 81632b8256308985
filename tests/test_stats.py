"""Cross-series correlation + cohort retention (ops/stats.py) against
sequential references — exact integer moments bit-equal, the IEEE corr
reproduced by the same pinned operation order in numpy doubles."""

import datetime
import math

from tmframe_spark.ops.stats import cohort_retention, rolling_corr

T0 = datetime.datetime(2024, 5, 1)


def _two_series(spark, xs, ys, conv="c0"):
    rows = [
        (conv, T0 + datetime.timedelta(hours=i), int(x), int(y))
        for i, (x, y) in enumerate(zip(xs, ys))
    ]
    return spark.createDataFrame(
        rows, "conv_id string, bucket timestamp, turns long, token_volume long"
    )


def _ref_corr(xs, ys, window, min_n):
    out = {}
    for i in range(len(xs)):
        lo = max(0, i - window + 1)
        wx, wy = xs[lo : i + 1], ys[lo : i + 1]
        n = len(wx)
        if n < min_n:
            continue
        sx, sy = sum(wx), sum(wy)
        sxx = sum(v * v for v in wx)
        syy = sum(v * v for v in wy)
        sxy = sum(a * b for a, b in zip(wx, wy))
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        corr = (
            float(n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
            if vx > 0 and vy > 0
            else None
        )
        out[i] = (n, sx, sy, sxx, syy, sxy, corr)
    return out


def test_rolling_corr_matches_reference_bitwise(spark):
    xs = [(i * 7) % 5 + 1 for i in range(60)]
    ys = [3 * x + (i % 4) for i, x in enumerate(xs)]  # strongly correlated
    got = rolling_corr(_two_series(spark, xs, ys), window=12, min_n=6).collect()
    ref = _ref_corr(xs, ys, 12, 6)
    assert len(got) == len(ref)
    for r in got:
        i = (r["bucket"] - T0).days * 24 + (r["bucket"] - T0).seconds // 3600
        n, sx, sy, sxx, syy, sxy, corr = ref[i]
        assert (r["n"], r["sx"], r["sy"], r["sxx"], r["syy"], r["sxy"]) == (
            n, sx, sy, sxx, syy, sxy
        )
        if corr is None:
            assert r["corr"] is None
        else:
            # IEEE bit-equality: same exact ints, same operation order
            assert r["corr"] == corr
        assert corr is None or corr > 0.8  # planted strong correlation


def test_rolling_corr_degenerate_window_is_null(spark):
    xs = [5] * 30  # zero variance in x
    ys = list(range(30))
    got = rolling_corr(_two_series(spark, xs, ys), window=10, min_n=5).collect()
    assert len(got) > 0
    assert all(r["corr"] is None for r in got)


def test_cohort_retention_reference(spark):
    rows = []
    # cohort A (day 0): convs a0, a1 — a0 active days 0,1,3; a1 day 0 only
    for c, days in [("a0", [0, 1, 3]), ("a1", [0])]:
        for d in days:
            rows.append((c, 0, "user", "x", None, T0 + datetime.timedelta(days=d, hours=2)))
    # cohort B (day 2): b0 active days 2, 4
    for d in [2, 4]:
        rows.append(("b0", 0, "user", "x", None, T0 + datetime.timedelta(days=d)))
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        (r["cohort_day"].day, r["offset_days"]): r["n_convs"]
        for r in cohort_retention(t).collect()
    }
    assert got == {(1, 0): 2, (1, 1): 1, (1, 3): 1, (3, 0): 1, (3, 2): 1}
    capped = cohort_retention(t, max_offset_days=1).collect()
    assert {(r["cohort_day"].day, r["offset_days"]) for r in capped} == {
        (1, 0), (1, 1), (3, 0)
    }


def test_stats_empty_inputs(spark):
    rolled = spark.createDataFrame(
        [], "conv_id string, bucket timestamp, turns long, token_volume long"
    )
    assert rolling_corr(rolled).count() == 0
    t = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    assert cohort_retention(t).count() == 0
