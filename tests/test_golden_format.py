"""Wire-format stability: the block and frame encodings for a fixed seeded
input must never change silently across versions — decoded archives written
by earlier engine versions must stay readable. If a format change is
INTENTIONAL, bump BLOCK_VERSION in codec/blocks.py and regenerate
tests/golden_digests.json (documenting the migration)."""

import hashlib
import json
import os

import numpy as np

from tmframe_spark.codec.blocks import encode_block
from tmframe_spark.codec.frames import EV_BLOCK, EV_TURN, make_frames, marshal_frames

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden_digests.json")))


def fixed_inputs():
    ts = np.arange(1000, dtype=np.int64) * 60_000_000_000 + 1_704_067_200_000_000_000
    rng = np.random.default_rng(12345)
    v1 = np.where(rng.random(1000) < 0.05, rng.integers(1, 4, 1000), 0).astype(np.int64)
    v0 = v1 * 37.5
    return ts, v0, v1


def test_block_format_stable():
    ts, v0, v1 = fixed_inputs()
    block = encode_block(ts, v0, v1)
    assert len(block) == GOLDEN["block_len"]
    assert hashlib.sha256(block).hexdigest() == GOLDEN["block_sha256"]


def test_frame_format_stable():
    ts, v0, v1 = fixed_inputs()
    block = encode_block(ts, v0, v1)
    wire = marshal_frames(make_frames([int(ts[0])], [EV_BLOCK], data=[block]))
    assert hashlib.sha256(wire).hexdigest() == GOLDEN["frame_sha256"]
    turn = marshal_frames(
        make_frames([int(ts[0]) + 5], [EV_TURN], data=["user\x1fsearch\x1fhello world".encode()])
    )
    assert len(turn) == GOLDEN["turn_frame_len"]
    assert hashlib.sha256(turn).hexdigest() == GOLDEN["turn_frame_sha256"]
