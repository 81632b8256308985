"""Mergeable Misra-Gries heavy-hitters tier (ops/rollup.rollup_topk_sketch
/ cascade_topk_up): MG bound invariants against exact counts on planted
high-cardinality data, the exactness limit, the all-tied survivor edge,
and error-bound telescoping through the cascade."""

import datetime

from pyspark.sql import functions as F

from tmframe_spark.ops.rollup import cascade_topk_up, rollup_topk_sketch

T0 = datetime.datetime(2024, 3, 1)


def _turns(spark, rows):
    """rows: (conv_id, minutes_offset)"""
    data = [(c, 0, "user", "x", None, T0 + datetime.timedelta(minutes=m)) for c, m in rows]
    return spark.createDataFrame(
        data,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def _mixed_corpus():
    """2 heavy convs + 120 light convs inside one hour; a second hour with
    different heavies — planted so true heavy counts far exceed any bound."""
    rows = []
    rows += [("heavy-a", i % 60) for i in range(300)]
    rows += [("heavy-b", i % 60) for i in range(200)]
    rows += [(f"light-{i}", i % 60) for i in range(120)]
    rows += [("heavy-c", 60 + i % 60) for i in range(250)]
    rows += [(f"lighter-{i}", 60 + i % 60) for i in range(90)]
    return rows


def _exact(rows, trunc_minutes):
    out: dict[tuple[int, str], int] = {}
    for c, m in rows:
        b = (m // trunc_minutes) * trunc_minutes
        out[(b, c)] = out.get((b, c), 0) + 1
    return out


def test_mg_bound_invariants_vs_exact(spark):
    rows = _mixed_corpus()
    sk = rollup_topk_sketch(_turns(spark, rows), "1h", "conv_id", k=8).collect()
    exact = _exact(rows, 60)
    per_bucket: dict[int, list] = {}
    for r in sk:
        per_bucket.setdefault(r["bucket"].hour * 60, []).append(r)
    for b, rs in per_bucket.items():
        assert len(rs) <= 8
        n_true = sum(v for (bb, _), v in exact.items() if bb == b)
        err = rs[0]["err"]
        assert all(r["err"] == err and r["n_total"] == n_true for r in rs)
        assert err == n_true - sum(r["cnt"] for r in rs)
        stored = {r["key"]: r["cnt"] for r in rs}
        for (bb, c), v in exact.items():
            if bb != b:
                continue
            # lower bound + bucket-wide band
            if c in stored:
                assert 0 <= v - stored[c] <= err
            # guaranteed presence of true heavy hitters
            if v > err:
                assert c in stored, (b, c, v, err)
    # compression genuinely exercised: the light tail forced decrements
    assert any(r["err"] > 0 for r in sk)
    assert {"heavy-a", "heavy-b"} <= {r["key"] for r in sk if r["bucket"].hour == 0}


def test_exactness_limit_at_low_cardinality(spark):
    rows = [(f"c{i}", i) for i in range(5) for _ in range(i + 1)]
    sk = rollup_topk_sketch(_turns(spark, rows), "1h", "conv_id", k=8).collect()
    assert {(r["key"], r["cnt"]) for r in sk} == {(f"c{i}", i + 1) for i in range(5)}
    assert all(r["err"] == 0 and r["n_total"] == 15 for r in sk)


def test_all_tied_bucket_keeps_one_carrier_row(spark):
    rows = [(f"c{i}", 0) for i in range(20)]
    sk = rollup_topk_sketch(_turns(spark, rows), "1h", "conv_id", k=4).collect()
    assert len(sk) == 1
    assert sk[0]["cnt"] == 0 and sk[0]["n_total"] == 20 and sk[0]["err"] == 20


def test_cascade_bound_telescopes(spark):
    rows = _mixed_corpus()
    fine = rollup_topk_sketch(_turns(spark, rows), "1h", "conv_id", k=8)
    day = cascade_topk_up(fine, "1d", k=8).collect()
    exact = _exact(rows, 24 * 60)
    n_true = sum(exact.values())
    assert len(day) <= 8
    err = day[0]["err"]
    assert all(r["err"] == err and r["n_total"] == n_true for r in day)
    assert err == n_true - sum(r["cnt"] for r in day)
    stored = {r["key"]: r["cnt"] for r in day}
    for (_, c), v in exact.items():
        if c in stored:
            assert 0 <= v - stored[c] <= err
        if v > err:
            assert c in stored
    assert {"heavy-a", "heavy-c"} <= set(stored)


def test_cascade_exact_at_low_cardinality_matches_direct(spark):
    """<= k keys everywhere: the cascaded day sketch IS the exact day count
    table — the condition the heavy_hitters_exactk oracle relies on."""
    rows = [(f"c{i % 4}", m) for i, m in [(i, (i * 37) % 1440) for i in range(200)]]
    fine = rollup_topk_sketch(_turns(spark, rows), "1h", "conv_id", k=8)
    day = {r["key"]: (r["cnt"], r["err"]) for r in cascade_topk_up(fine, "1d", k=8).collect()}
    exact = _exact(rows, 24 * 60)
    assert day == {c: (v, 0) for (_, c), v in exact.items()}


def test_empty_input(spark):
    e = _turns(spark, [])
    assert rollup_topk_sketch(e, "1h", "conv_id", k=4).count() == 0
    assert cascade_topk_up(rollup_topk_sketch(e, "1h", "conv_id", k=4), "1d").count() == 0
