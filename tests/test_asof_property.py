"""Property test: asof_join vs a direct transliteration of the reference's
binary-search semantics (series.go:58-244) over randomized series and
probes, including ties, probes between timestamps, before-start, after-end,
and exactly-at timestamps."""

import bisect

import numpy as np
import pytest

from tmframe_spark.ops.asof import asof_join


def ref_search(ts_sorted, utm, tie, strict):
    """(status, matched_index) per the reference's documented contract:
    nearest timestamp s < utm (strict) or s <= utm; tie picks first/last by
    arrival order. InFuture when utm > max ts (result = tie pick at max ts).

    Note: for probes strictly between two interior timestamps, the reference
    CODE of LastAtOrBefore returns the *following* tie group
    (series.go:220-243 lacks the i-1 step of FirstAtOrBefore) — contradicting
    its own doc comment and name; that path is untested in series_test.go.
    This transliteration (and the engine) follows the documented contract;
    the exact reference-pinned probe points are asserted separately in
    tests/test_asof.py.
    """
    m = len(ts_sorted)
    if m == 0:
        return ("InPast", -1)
    # i = first index with ts >= utm (strict) / ts > utm (non-strict target)
    if strict:
        target = [t for t in ts_sorted if t < utm]
    else:
        target = [t for t in ts_sorted if t <= utm]
    if not target:
        return ("InPast", -1)
    s = target[-1]  # nearest qualifying timestamp
    lo = bisect.bisect_left(ts_sorted, s)
    hi = bisect.bisect_right(ts_sorted, s) - 1
    idx = lo if tie == "first" else hi
    status = "InFuture" if utm > ts_sorted[-1] else "Avail"
    return (status, idx)


@pytest.mark.parametrize("tie,strict", [("last", False), ("first", False), ("last", True), ("first", True)])
def test_asof_random_vs_reference_semantics(spark, tie, strict):
    rng = np.random.default_rng(hash((tie, strict)) % 2**31)
    build_rows, probe_rows, series_ts = [], [], {}
    for s in range(25):
        n = int(rng.integers(1, 30))
        # timestamps with deliberate ties
        ts = np.sort(rng.choice(np.arange(100) * 10, size=n, replace=True)).tolist()
        series_ts[s] = ts
        for i, t in enumerate(ts):
            build_rows.append((s, int(t), i))
        # probes: at stamps, between, before, after
        probes = set()
        for _ in range(12):
            kind = rng.integers(0, 4)
            if kind == 0:
                p = int(rng.choice(ts))
            elif kind == 1:
                p = int(rng.choice(ts)) + int(rng.integers(1, 10))
            elif kind == 2:
                p = ts[0] - int(rng.integers(1, 20))
            else:
                p = ts[-1] + int(rng.integers(1, 20))
            probes.add(p)
        for j, p in enumerate(sorted(probes)):
            probe_rows.append((s, p, j))

    build = spark.createDataFrame(build_rows, "series long, ts long, idx long")
    probe = spark.createDataFrame(probe_rows, "series long, ts long, pid long")
    out = asof_join(
        probe, build, on="ts", by=["series"], seq="idx", value_cols=[],
        tie=tie, strict=strict,
    ).collect()
    assert len(out) == len(probe_rows)
    for r in out:
        exp_status, exp_idx = ref_search(series_ts[r["series"]], r["ts"], tie, strict)
        got_idx = -1 if r["b_idx"] is None else r["b_idx"]
        assert (r["status"], got_idx) == (exp_status, exp_idx), (
            f"series={r['series']} ts={series_ts[r['series']]} probe={r['ts']} "
            f"tie={tie} strict={strict}: got ({r['status']},{got_idx}) "
            f"want ({exp_status},{exp_idx})"
        )
