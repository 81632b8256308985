"""tfsum parity: v1 = first 8 bytes (LE) of the frame's BLAKE2b canonical
hash (cmd/tfsum/tfsum.go:56-71 + frame.go:532-564), distributed UDF vs the
numpy oracle. Plus the dedup dups side-output."""

import numpy as np

from tests.conftest import SF_DIR
from tmframe_spark.codec import frames as fc
from tmframe_spark.codec.udfs import frame_turns
from tmframe_spark.data.transcripts import load_transcripts
from tmframe_spark.ops.dedup import count_window_dedup
from tmframe_spark.ops.filters import tfsum_frames
from tmframe_spark.ops.rollup import with_ts_ns


def test_tfsum_matches_numpy_oracle(spark):
    t = with_ts_ns(load_transcripts(spark, SF_DIR)).limit(300)
    framed = frame_turns(t).persist()
    got = {
        r["ts_ns"] & ~7: r["v1"]
        for r in tfsum_frames(framed, "frame", "ts_ns").collect()
    }
    # oracle: unmarshal each wire frame single-node, blake2b, first 8 LE
    for r in framed.select("ts_ns", "frame").collect():
        fr = fc.unmarshal_frames(bytes(r["frame"]))
        digest = fc.blake2b_frames(fr)[0]
        want = int(np.frombuffer(digest[:8], dtype="<i8")[0])
        assert got[r["ts_ns"] & ~7] == want
    framed.unpersist()


def test_count_window_dedup_dups_side_output(spark):
    rows = [("c", i, "user", str(v), None, i) for i, v in enumerate([1, 2, 1, 3, 1])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts long"
    )
    kw = dict(window_size=3, by=["conv_id"], order_cols=["ts", "turn_idx"], hash_cols=["text"])
    kept = [r["turn_idx"] for r in count_window_dedup(df, emit="kept", **kw).orderBy("turn_idx").collect()]
    dups = [r["turn_idx"] for r in count_window_dedup(df, emit="dups", **kw).orderBy("turn_idx").collect()]
    assert kept == [0, 1, 3]
    assert dups == [2, 4]  # both masked duplicates captured (dedup.go:79-88)
