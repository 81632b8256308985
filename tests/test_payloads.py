"""Payload codec (msgpack/JSON) + Frame.String() display tests.

Msgpack vectors are hand-computed from the public spec; display strings
mirror /root/reference/frame.go:490-511 and display.go:35-77.
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tmframe_spark.codec.frames import (
    EV_MSGPACK,
    EV_TURN,
    make_frames,
    marshal_frames,
)
from tmframe_spark.codec.payloads import (
    mp_decode,
    mp_encode,
    render_payload,
)
from tmframe_spark.ops.display import go_float_str, render_frame_strings


# --- msgpack wire vectors (spec §formats) ----------------------------------

VECTORS = [
    (None, b"\xc0"),
    (True, b"\xc3"),
    (False, b"\xc2"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (128, b"\xcc\x80"),
    (256, b"\xcd\x01\x00"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (2**32, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (-33, b"\xd0\xdf"),
    (-129, b"\xd1\xff\x7f"),
    (-32769, b"\xd2\xff\xff\x7f\xff"),
    (-(2**31) - 1, b"\xd3\xff\xff\xff\xff\x7f\xff\xff\xff"),
    (1.5, b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00"),
    ("", b"\xa0"),
    ("abc", b"\xa3abc"),
    ("x" * 32, b"\xd9\x20" + b"x" * 32),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([], b"\x90"),
    ([1, "a"], b"\x92\x01\xa1a"),
    ({}, b"\x80"),
    ({"k": 7}, b"\x81\xa1k\x07"),
]


@pytest.mark.parametrize("obj,wire", VECTORS, ids=[repr(v)[:24] for v, _ in VECTORS])
def test_msgpack_known_vectors(obj, wire):
    assert mp_encode(obj) == wire
    assert mp_decode(wire) == obj


json_like = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**63), max_value=2**64 - 1)
    | st.floats(allow_nan=False)
    | st.text(max_size=40)
    | st.binary(max_size=40),
    lambda kids: st.lists(kids, max_size=6)
    | st.dictionaries(st.text(max_size=10), kids, max_size=6),
    max_leaves=25,
)


@settings(max_examples=200, deadline=None)
@given(json_like)
def test_msgpack_roundtrip_property(obj):
    assert mp_decode(mp_encode(obj)) == obj


def test_msgpack_errors():
    with pytest.raises(ValueError):
        mp_decode(b"\x81\xa1k")  # truncated map value
    with pytest.raises(ValueError):
        mp_decode(b"\x00\x00")  # trailing bytes
    with pytest.raises(TypeError):
        mp_encode(object())


# --- payload render conventions (display.go:41-76) --------------------------


def test_render_payload_conventions():
    mp = mp_encode({"a": 1, "b": [True, None]})
    assert render_payload(9, mp) == '{"a":1,"b":[true,null]}'  # EvMsgpack
    assert render_payload(15, mp) == '{"a":1,"b":[true,null]}'  # EvMsgpKafka
    assert render_payload(14, b'{"x": 1}') == '{"x": 1}'  # EvJson verbatim
    assert render_payload(2000, b'{"y":2}') == '{"y":2}'  # 2000..9999 as JSON
    assert render_payload(9999, b"[]") == "[]"
    assert render_payload(1999, b"zzz") is None  # below the JSON range
    assert render_payload(10000, b"zzz") is None
    assert render_payload(EV_TURN, b"u\x1f\x1fhi") is None  # app payload


# --- Go float formatting -----------------------------------------------------


@pytest.mark.parametrize(
    "v,s",
    [
        (5.0, "5"),
        (0.25, "0.25"),
        (-3.5, "-3.5"),
        (1e21, "1e+21"),
        (1e20, "100000000000000000000"),
        (1.5e-5, "1.5e-05"),
        (0.0001, "0.0001"),
        (0.0, "0"),
        (123.456, "123.456"),
    ],
)
def test_go_float_str(v, s):
    assert go_float_str(v) == s


def test_go_float_str_nan_inf():
    assert go_float_str(float("nan")) == "NaN"
    assert go_float_str(math.inf) == "+Inf"
    assert go_float_str(-math.inf) == "-Inf"


# --- Frame.String() rendering ------------------------------------------------


def _wire(ts, evs, **kw):
    fr = make_frames(ts, evs, **kw)
    return marshal_frames(fr)


def test_frame_string_branches():
    # one of each PTI branch, exact reference format
    ts = 1_500_000_000_000_000_000  # 2017-07-14T02:40:00Z
    lines = render_frame_strings(
        [
            _wire([ts], [0]),  # EvZero
            _wire([ts], [1], v1=[42]),  # OneInt64
            _wire([ts], [2], v0=[2.5]),  # OneFloat64
            _wire([ts], [3], v0=[5.0], v1=[-7]),  # Two64
            _wire([ts], [EV_TURN], data=[b"user\x1f\x1fhello"]),
            _wire([ts + 250_000_000], [4]),  # EvNull with fraction
        ]
    )
    assert lines[0] == "TMFRAME 2017-07-14T02:40:00Z EVTNUM EvZero [8 bytes] (UCOUNT 0)"
    assert lines[1] == (
        "TMFRAME 2017-07-14T02:40:00Z EVTNUM EvOneInt64 [16 bytes] (UCOUNT 0) V1:42"
    )
    assert lines[2] == (
        "TMFRAME 2017-07-14T02:40:00Z EVTNUM EvOneFloat64 [16 bytes] (UCOUNT 0) V0:2.5"
    )
    assert lines[3] == (
        "TMFRAME 2017-07-14T02:40:00Z EVTNUM EvTwo64 [24 bytes] (UCOUNT 0) V0:5 V1:-7"
    )
    # UDE: nbytes = 16 + len+1, UCOUNT = len+1; evtnum -1001 has no name case
    assert lines[4] == (
        "TMFRAME 2017-07-14T02:40:00Z EVTNUM Ev.-1001 [28 bytes] (UCOUNT 12)"
    )
    assert lines[5] == (
        "TMFRAME 2017-07-14T02:40:00.25Z EVTNUM EvNull [8 bytes] (UCOUNT 0)"
    )


def test_frame_string_payload_rendering():
    ts = 1_500_000_000_000_000_000
    mp = mp_encode({"k": 1})
    lines = render_frame_strings(
        [
            _wire([ts], [EV_MSGPACK], data=[mp]),
            _wire([ts], [14], data=[b'{"j":true}']),
            _wire([ts], [2345], data=[b'{"r":9}']),
        ],
        include_payload=True,
    )
    # msgpack: ONE space before the re-encoded JSON (display.go:62)
    assert lines[0].endswith('(UCOUNT 5) {"k":1}')
    # EvJson / 2000..9999: TWO spaces before verbatim payload (display.go:44)
    assert lines[1].endswith('(UCOUNT 11)  {"j":true}')
    assert lines[2].endswith('(UCOUNT 8)  {"r":9}')


def test_display_frames_spark(spark):
    from tmframe_spark.ops.display import display_frames

    ts = 1_500_000_000_000_000_000
    rows = [
        (1, _wire([ts], [1], v1=[11])),
        (2, _wire([ts], [EV_TURN], data=[b"a\x1f\x1fb"])),
    ]
    df = spark.createDataFrame(rows, "id long, frame binary")
    got = {r["id"]: r["display"] for r in display_frames(df).collect()}
    assert got[1].endswith("EVTNUM EvOneInt64 [16 bytes] (UCOUNT 0) V1:11")
    assert got[2].endswith("EVTNUM Ev.-1001 [21 bytes] (UCOUNT 5)")


def test_msgpack_frame_roundtrip_spark(spark):
    from tmframe_spark.codec.udfs import decode_msgpack_frames, frame_msgpack_turns

    rows = [
        ("c0", 0, "user", None, "hello world", 1_700_000_000_000_000_000),
        ("c0", 1, "assistant", "search", "hi", 1_700_000_000_100_000_000),
        ("c1", 0, "user", None, "", 1_700_000_001_000_000_000),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string, text string, ts_ns long",
    )
    out = decode_msgpack_frames(frame_msgpack_turns(df)).orderBy("conv_id", "turn_idx")
    got = [(r.conv_id, r.turn_idx, r.role, r.n_chars) for r in out.collect()]
    assert got == [("c0", 0, "user", 11), ("c0", 1, "assistant", 2), ("c1", 0, "user", 0)]


def test_zebrapack_with_schema():
    from tmframe_spark.codec.payloads import (
        LOGENTRY_SCHEMA,
        PAYLOAD_DECODERS,
        register_zebrapack_schema,
        render_zebrapack,
    )

    # LogEntry on the wire: msgpack map keyed by zid ints (testdata/logentry.go)
    wire = mp_encode({0: 42, 1: "put", 2: {"k": "v"}})
    assert (
        render_zebrapack(wire, LOGENTRY_SCHEMA)
        == '{"lsn":42,"op":"put","args":{"k":"v"}}'
    )
    # unknown zid -> placeholder name
    assert render_zebrapack(mp_encode({9: 1}), LOGENTRY_SCHEMA) == '{"zid9":1}'

    # without a registered schema the display path prints NOTHING for
    # EvZebraPack (a schema-less reference build cannot render it either)
    assert render_payload(16, wire) is None
    ts = 1_500_000_000_000_000_000
    line_before = render_frame_strings([_wire([ts], [16], data=[wire])], True)[0]
    assert line_before.endswith("(UCOUNT %d)" % (len(wire) + 1))

    register_zebrapack_schema(LOGENTRY_SCHEMA)
    try:
        assert render_payload(16, wire) == '{"lsn":42,"op":"put","args":{"k":"v"}}'
        line = render_frame_strings([_wire([ts], [16], data=[wire])], True)[0]
        # EvZebraPack: ONE space before the JSON (display.go:74)
        assert line.endswith(') {"lsn":42,"op":"put","args":{"k":"v"}}')
        assert " EVTNUM Ev.16 [" in line  # String() has no ZebraPack case
    finally:
        PAYLOAD_DECODERS.pop(16, None)


def test_indent_json_go_style():
    from tmframe_spark.ops.display import indent_json

    assert indent_json('{"a":1,"b":[2,3]}') == (
        '{\n          "a": 1,\n          "b": [\n              2,\n'
        '              3\n          ]\n      }'
    )
    assert indent_json("{}") == "{}"
    assert indent_json('{"s":"a,b:{c}"}') == '{\n          "s": "a,b:{c}"\n      }'
    assert indent_json("not json") == "not json"  # Go Indent error passthrough


def test_pretty_payload_rendering():
    ts = 1_500_000_000_000_000_000
    lines = render_frame_strings(
        [_wire([ts], [14], data=[b'{"j":1}'])], include_payload=True, pretty=True
    )
    assert lines[0].endswith('(UCOUNT 8)  {\n          "j": 1\n      }')


def test_stringify_for_r():
    from tmframe_spark.ops.display import render_frame_strings_for_r

    ts = 1_500_000_000_000_000_000
    mp = mp_encode({"k": 1})
    lines = render_frame_strings_for_r(
        [
            _wire([ts], [3], v0=[2.5], v1=[7]),
            _wire([ts], [14], data=[b'{"j":1}']),
            _wire([ts], [EV_MSGPACK], data=[mp]),
        ]
    )
    # '%v evtnum %v' + ' V0 x V1 y' (spaces, not colons) — display.go:236-258
    assert lines[0] == "2017-07-14T02:40:00Z evtnum EvTwo64 V0 2.5 V1 7"
    assert lines[1] == '2017-07-14T02:40:00Z evtnum EvJson  {"j":1}'
    # msgpack payload single-quoted after ONE space (display.go:276)
    assert lines[2] == "2017-07-14T02:40:00Z evtnum EvMsgpack '{\"k\":1}'"


def test_display_frames_r_style(spark):
    from tmframe_spark.ops.display import display_frames

    ts = 1_500_000_000_000_000_000
    df = spark.createDataFrame([(1, _wire([ts], [1], v1=[9]))], "id long, frame binary")
    got = display_frames(df, style="r").collect()[0]["display"]
    assert got == "2017-07-14T02:40:00Z evtnum EvOneInt64 V1 9"


def test_indent_json_whitespace_and_constants():
    from tmframe_spark.ops.display import indent_json

    # Go's scanner drops insignificant whitespace from the source
    assert indent_json('{"a": 1}') == '{\n          "a": 1\n      }'
    assert indent_json('{ }') == "{}"
    assert indent_json('[ ]') == "[]"
    # Go rejects NaN/Infinity -> Indent errors -> verbatim passthrough
    assert indent_json('{"a":NaN}') == '{"a":NaN}'
    assert indent_json('[Infinity]') == "[Infinity]"
    # whitespace INSIDE strings is significant and preserved
    assert indent_json('{"s":"a b"}') == '{\n          "s": "a b"\n      }'


def test_indent_json_trailing_whitespace_and_depth():
    from tmframe_spark.ops.display import indent_json

    # Go's Indent preserves trailing whitespace of src verbatim
    assert indent_json('{"a":1}\n') == '{\n          "a": 1\n      }\n'
    assert indent_json("{} \t") == "{} \t"
    # pathological nesting degrades to verbatim passthrough (Go errors too)
    deep = "[" * 20000 + "]" * 20000  # past Go's depth-10000 scanner cap
    assert indent_json(deep) == deep
