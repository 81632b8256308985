"""Exact transliteration of the reference's as-of search semantic tables
(/root/reference/series_test.go Test015-Test018) onto the distributed
asof_join.

Series: GenerateSeriesWithRepeats(reps) — distinct timestamps 1s apart,
reps[i] tied frames at ts_i (util.go:105-123). Probes at exact timestamps,
+10ns past the end, -10ns before the start. Expected (status, index) pairs
are copied verbatim from the reference tests.

Note on untested reference behavior: for probes strictly *between* two
interior distinct timestamps the reference code returns the FOLLOWING tie
group from LastAtOrBefore (series.go:220-243 skips the i-1 step its sibling
FirstAtOrBefore has) — contradicting both its doc comment ("nearest s <= tm")
and the 'AtOrBefore' name. Our engine implements the documented contract
uniformly; every probe point the reference actually pins is asserted below.
"""

import pytest

from tmframe_spark.ops.asof import asof_join

SEC = 1_000_000_000

# (reps, [(frame_idx, delta_ns, exp_status, exp_idx), ...]) per variant
LAST_IN_FORCE_BEFORE = [
    ([5, 5, 5, 5], [(19, 10, "InFuture", 19), (19, 0, "Avail", 14), (14, 0, "Avail", 9),
                    (9, 0, "Avail", 4), (4, 0, "InPast", -1)]),
    ([1, 2, 1, 2], [(5, 10, "InFuture", 5), (5, 0, "Avail", 3), (4, 0, "Avail", 3),
                    (3, 0, "Avail", 2), (2, 0, "Avail", 0), (1, 0, "Avail", 0),
                    (0, 0, "InPast", -1)]),
    ([1, 1, 1, 1], [(3, 10, "InFuture", 3), (2, 0, "Avail", 1), (1, 0, "Avail", 0),
                    (0, 0, "InPast", -1)]),
    ([1], [(0, 10, "InFuture", 0), (0, 0, "InPast", -1)]),
    ([1, 1], [(1, 10, "InFuture", 1), (1, 0, "Avail", 0), (0, 0, "InPast", -1)]),
]

LAST_AT_OR_BEFORE = [
    ([5, 5, 5, 5], [(19, 10, "InFuture", 19), (15, 0, "Avail", 19), (10, 0, "Avail", 14),
                    (5, 0, "Avail", 9), (0, 0, "Avail", 4), (0, -10, "InPast", -1)]),
    ([1, 2, 1, 2], [(5, 10, "InFuture", 5), (5, 0, "Avail", 5), (4, 0, "Avail", 5),
                    (3, 0, "Avail", 3), (2, 0, "Avail", 2), (1, 0, "Avail", 2),
                    (0, 0, "Avail", 0), (0, -10, "InPast", -1)]),
    ([1, 1, 1, 1], [(3, 10, "InFuture", 3), (3, 0, "Avail", 3), (2, 0, "Avail", 2),
                    (1, 0, "Avail", 1), (0, 0, "Avail", 0), (0, -10, "InPast", -1)]),
    ([1], [(0, 10, "InFuture", 0), (0, 0, "Avail", 0), (0, -10, "InPast", -1)]),
    ([1, 1], [(1, 10, "InFuture", 1), (1, 0, "Avail", 1), (0, 0, "Avail", 0)]),
]

FIRST_AT_OR_BEFORE = [
    ([5, 5, 5, 5], [(19, 10, "InFuture", 15), (15, 0, "Avail", 15), (14, 0, "Avail", 10),
                    (9, 0, "Avail", 5), (4, 0, "Avail", 0), (0, -10, "InPast", -1)]),
    ([1, 2, 1, 2], [(5, 10, "InFuture", 4), (5, 0, "Avail", 4), (4, 0, "Avail", 4),
                    (3, 0, "Avail", 3), (2, 0, "Avail", 1), (1, 0, "Avail", 1),
                    (0, 0, "Avail", 0), (0, -10, "InPast", -1)]),
    ([1, 1, 1, 1], [(3, 10, "InFuture", 3), (3, 0, "Avail", 3), (2, 0, "Avail", 2),
                    (1, 0, "Avail", 1), (0, 0, "Avail", 0), (0, -10, "InPast", -1)]),
    ([1], [(0, 10, "InFuture", 0), (0, 0, "Avail", 0), (0, -10, "InPast", -1)]),
    ([1, 1], [(1, 10, "InFuture", 1), (1, 0, "Avail", 1), (0, 0, "Avail", 0)]),
]

FIRST_IN_FORCE_BEFORE = [
    ([5, 5, 5, 5], [(19, 10, "InFuture", 15), (19, 0, "Avail", 10), (14, 0, "Avail", 5),
                    (9, 0, "Avail", 0), (4, 0, "InPast", -1), (0, -10, "InPast", -1)]),
    ([1, 2, 1, 2], [(5, 10, "InFuture", 4), (5, 0, "Avail", 3), (4, 0, "Avail", 3),
                    (3, 0, "Avail", 1), (2, 0, "Avail", 0), (1, 0, "Avail", 0),
                    (0, 0, "InPast", -1), (0, -10, "InPast", -1)]),
    ([1, 1, 1, 1], [(3, 10, "InFuture", 3), (3, 0, "Avail", 2), (2, 0, "Avail", 1),
                    (1, 0, "Avail", 0), (0, 0, "InPast", -1), (0, -10, "InPast", -1)]),
    ([1], [(0, 10, "InFuture", 0), (0, 0, "InPast", -1), (0, -10, "InPast", -1)]),
    ([1, 1], [(1, 10, "InFuture", 1), (1, 0, "Avail", 0), (0, 0, "InPast", -1)]),
]

VARIANTS = [
    ("last_in_force_before", "last", True, LAST_IN_FORCE_BEFORE),
    ("last_at_or_before", "last", False, LAST_AT_OR_BEFORE),
    ("first_at_or_before", "first", False, FIRST_AT_OR_BEFORE),
    ("first_in_force_before", "first", True, FIRST_IN_FORCE_BEFORE),
]


def series_rows(reps):
    """(ts_ns, idx) rows: distinct timestamps 1s apart, reps[i] ties."""
    rows, idx = [], 0
    for i, r in enumerate(reps):
        for _ in range(r):
            rows.append((i * SEC, idx))
            idx += 1
    return rows


@pytest.mark.parametrize("name,tie,strict,table", VARIANTS, ids=[v[0] for v in VARIANTS])
def test_asof_matches_reference_tables(spark, name, tie, strict, table):
    # pack all patterns into ONE build/probe pair, keyed by pattern id —
    # exercises the per-series partitioning of the join as well
    build_rows, probe_rows, expected = [], [], {}
    for pat_id, (reps, cases) in enumerate(table):
        rows = series_rows(reps)
        for ts, idx in rows:
            build_rows.append((pat_id, ts, idx))
        for case_id, (fidx, delta, exp_status, exp_idx) in enumerate(cases):
            probe_ts = rows[fidx][0] + delta
            probe_rows.append((pat_id, probe_ts, case_id))
            expected[(pat_id, case_id)] = (exp_status, exp_idx)

    build = spark.createDataFrame(build_rows, "series long, ts long, idx long")
    probe = spark.createDataFrame(probe_rows, "series long, ts long, case_id long")
    out = asof_join(
        probe, build, on="ts", by=["series"], seq="idx", value_cols=[],
        tie=tie, strict=strict,
    ).collect()

    assert len(out) == len(probe_rows)
    for r in out:
        exp_status, exp_idx = expected[(r["series"], r["case_id"])]
        got_idx = -1 if r["b_idx"] is None else r["b_idx"]
        assert (r["status"], got_idx) == (exp_status, exp_idx), (
            f"{name} pattern={table[r['series']][0]} case={r['case_id']}: "
            f"got ({r['status']}, {got_idx}), want ({exp_status}, {exp_idx})"
        )
