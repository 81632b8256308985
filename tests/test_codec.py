"""Frame codec round-trip tests (analog of /root/reference/frame_test.go).

The reference asserts marshal→unmarshal equality for every evtnum including
extreme user codes ±2^20 (frame_test.go:12-143) and validates inputs. We do
the same over the vectorized struct-of-arrays codec, plus hypothesis
property tests for arbitrary mixes.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tmframe_spark.codec import frames as fc

TS0 = 1_700_000_000_000_000_000  # positive unix ns


def roundtrip(fr: fc.Frames) -> fc.Frames:
    return fc.unmarshal_frames(fc.marshal_frames(fr))


def test_every_builtin_evtnum_roundtrips():
    # evtnums 0..16 plus -1, with payloads where allowed
    evs, datas, v0s, v1s, tss = [], [], [], [], []
    for i, ev in enumerate([-1] + list(range(17))):
        evs.append(ev)
        carries_data = ev < 0 or ev >= 7
        datas.append(bytes([1, 2, 3, i % 250 + 1]) if carries_data else b"")
        v0s.append(float(i) * 1.5)
        v1s.append(i * 100)
        tss.append(TS0 + i * 64)
    fr = fc.make_frames(tss, evs, v0s, v1s, datas)
    fr2 = roundtrip(fr)
    assert fc.frames_equal(fr, fr2)
    np.testing.assert_array_equal(fr.prim, fr2.prim)
    np.testing.assert_array_equal(fr.ude, fr2.ude)
    np.testing.assert_array_equal(fr.v0, fr2.v0)
    assert fr.data == fr2.data
    # evtnum recovery incl. sign extension through the UDE word
    np.testing.assert_array_equal(
        fc.get_evtnum(fr2.prim, fr2.ude), np.array([-1] + list(range(17)))
    )


def test_extreme_user_evtnums():
    # frame_test.go:102-143 exercises ±2^20 boundaries
    evs = [fc.EVTNUM_MIN, fc.EVTNUM_MIN + 1, -2, fc.EVTNUM_MAX, fc.EVTNUM_MAX - 1]
    fr = fc.make_frames(
        [TS0] * len(evs), evs, data=[b"payload-%d" % i for i in range(len(evs))]
    )
    fr2 = roundtrip(fr)
    assert fc.frames_equal(fr, fr2)
    np.testing.assert_array_equal(fc.get_evtnum(fr2.prim, fr2.ude), np.array(evs))


def test_evtnum_out_of_range_rejected():
    with pytest.raises(fc.EvtnumOutOfRangeError):
        fc.make_frames([TS0], [fc.EVTNUM_MAX + 1])
    with pytest.raises(fc.EvtnumOutOfRangeError):
        fc.make_frames([TS0], [fc.EVTNUM_MIN - 1])


def test_no_data_allowed_for_plain_evtnums():
    for ev in range(7):
        with pytest.raises(fc.NoDataAllowedError):
            fc.make_frames([TS0], [ev], data=[b"x"])


def test_8ns_truncation_and_pti():
    fr = fc.make_frames([TS0 + 5], [fc.EV_TWO64], [1.0], [2])
    assert int(fc.tm_ns(fr.prim)[0]) == (TS0 + 5) & ~7
    assert int(fc.get_pti(fr.prim)[0]) == fc.PTI_TWO64
    assert int(fr.ude[0]) == 2 and float(fr.v0[0]) == 1.0


def test_wire_sizes():
    # 8 / 16 / 16 / 24 / 8 / 8 / 8 / 16 / 16+n (frame.go:185-212)
    fr = fc.make_frames(
        [TS0] * 9,
        [0, 1, 2, 3, 4, 5, 6, 7, 13],
        data=[b""] * 8 + [b"abc"],
    )
    sizes = fc.frame_num_bytes(fr.prim, fr.ude)
    assert sizes.tolist() == [8, 16, 16, 24, 8, 8, 8, 16, 16 + 3 + 1]
    assert len(fc.marshal_frames(fr)) == sum(sizes.tolist())


def test_zero_termination_on_wire_only():
    fr = fc.make_frames([TS0], [fc.EV_UTF8], data=[b"hello"])
    wire = fc.marshal_frames(fr)
    assert wire[-1] == 0 and wire[16:21] == b"hello"
    fr2 = fc.unmarshal_frames(wire)
    assert fr2.data[0] == b"hello"  # terminator stripped on decode
    assert int(fc.get_ucount(fr2.ude)[0]) == 6  # UCOUNT includes terminator


def test_empty_ude_payload_is_16_bytes():
    fr = fc.make_frames([TS0], [fc.EV_BLOCK], data=[b""])
    assert len(fc.marshal_frames(fr)) == 16
    fr2 = roundtrip(fr)
    assert fc.frames_equal(fr, fr2)
    assert int(fc.get_evtnum(fr2.prim, fr2.ude)[0]) == fc.EV_BLOCK


def test_blake2b_matches_known_vector():
    # hash(prim||payload-words||data-without-terminator), BLAKE2b-512
    fr = fc.make_frames([TS0], [fc.EV_JSON], data=[b'{"a":1}'])
    import hashlib

    expected = hashlib.blake2b(digest_size=64)
    expected.update(np.asarray(fr.prim, "<i8").tobytes())
    expected.update(np.asarray(fr.ude, "<i8").tobytes())
    expected.update(b'{"a":1}')
    assert fc.blake2b_frames(fr)[0] == expected.digest()
    # null-like frames hash only the primary word
    fr_null = fc.make_frames([TS0], [fc.EV_NULL])
    h = hashlib.blake2b(np.asarray(fr_null.prim, "<i8").tobytes(), digest_size=64)
    assert fc.blake2b_frames(fr_null)[0] == h.digest()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**60),  # ts_ns
            st.sampled_from([-1048576, -1000, -1, 0, 1, 2, 3, 4, 5, 6, 7, 13, 14, 1048575]),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.binary(max_size=64),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_property_roundtrip(rows):
    ts = [r[0] for r in rows]
    ev = [r[1] for r in rows]
    v0 = [r[2] for r in rows]
    v1 = [r[3] for r in rows]
    data = [r[4] if (r[1] < 0 or r[1] >= 7) else b"" for r in rows]
    fr = fc.make_frames(ts, ev, v0, v1, data)
    fr2 = roundtrip(fr)
    assert fc.frames_equal(fr, fr2)
    np.testing.assert_array_equal(fc.get_evtnum(fr.prim, fr.ude), fc.get_evtnum(fr2.prim, fr2.ude))
    np.testing.assert_array_equal(fc.tm_ns(fr.prim), fc.tm_ns(fr2.prim))
