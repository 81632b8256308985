"""Frame display: the tfcat render path over wire-encoded frames.

Reproduces Frame.String() (/root/reference/frame.go:490-511) over a binary
frame column, PTI/evtnum-driven for ARBITRARY frames:

    TMFRAME <RFC3339Nano UTC> EVTNUM <Evtnum.String()> [<NumBytes> bytes] (UCOUNT <ulen>)

plus the value suffixes `` V1:<v1>`` / `` V0:<v0>`` / `` V0:<v0> V1:<v1>``
for PTI OneInt64 / OneFloat64 / Two64, and (optionally) the payload render
conventions of DisplayFrame (/root/reference/display.go:35-77): EvJson and
evtnum 2000..9999 append two spaces + payload JSON, EvMsgpack/EvMsgpKafka
append one space + the msgpack payload re-encoded as JSON.

The op decodes real wire bytes (unmarshal) — not typed columns — so the
display is a true round-trip through the codec.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from tmframe_spark.codec.frames import (
    PTI_ONE_FLOAT64,
    PTI_ONE_INT64,
    PTI_TWO64,
    evtnum_name,
    frame_num_bytes,
    get_evtnum,
    get_pti,
    get_ucount,
    tm_ns,
    unmarshal_frames,
)
from tmframe_spark.codec.payloads import render_payload


def go_float_str(v: float) -> str:
    """Go fmt %v of a float64: strconv shortest decimal, 'g'-style exponent
    switch at exp < -4 or exp >= 21 (Python's repr switches at 1e16, so the
    fixed/exponent boundary must be re-derived)."""
    import math

    if v != v:
        return "NaN"
    if v in (float("inf"), float("-inf")):
        return "+Inf" if v > 0 else "-Inf"
    if v == 0.0:
        # Go prints the sign of negative zero; `v < 0` is False for -0.0
        return "-0" if math.copysign(1.0, v) < 0 else "0"
    s = repr(float(v))  # shortest round-trip digits
    mant, _, exp_s = s.partition("e")
    if exp_s:  # python chose scientific
        exp = int(exp_s)
    else:
        # decimal exponent of the leading digit
        a = abs(float(v))
        if a == 0.0:
            return "0"
        import math

        exp = math.floor(math.log10(a))
        # log10 can be off by one at powers of 10 boundaries; trust repr's
        # digits instead for the fixed form below
    digits = mant.replace("-", "").replace(".", "").lstrip("0").rstrip("0") or "0"
    neg = v < 0
    if not exp_s:
        # recompute exponent exactly from the fixed repr
        intpart, _, frac = mant.replace("-", "").partition(".")
        if intpart != "0" and intpart != "":
            exp = len(intpart) - 1
        else:
            lead = len(frac) - len(frac.lstrip("0"))
            exp = -(lead + 1) if frac.strip("0") else 0
    if -4 <= exp < 21:
        # fixed notation
        if exp >= 0:
            ip = digits[: exp + 1].ljust(exp + 1, "0")
            fp = digits[exp + 1 :]
            out = ip + ("." + fp if fp else "")
        else:
            out = "0." + "0" * (-exp - 1) + digits
    else:
        d0, rest = digits[0], digits[1:]
        out = d0 + ("." + rest if rest else "") + f"e{'+' if exp >= 0 else '-'}{abs(exp):02d}"
    return ("-" + out) if neg else out


def _rfc3339nano(ts_ns: np.ndarray) -> list[str]:
    """Go time.RFC3339Nano (UTC): trailing zeros trimmed from the fraction,
    no dot when the fraction is zero, 'Z' zone suffix."""
    sec = ts_ns // 1_000_000_000
    frac = ts_ns % 1_000_000_000
    base = (
        pd.to_datetime(sec, unit="s", utc=True)
        .strftime("%Y-%m-%dT%H:%M:%S")
        .to_numpy(dtype=object)
    )
    out = []
    for b, f in zip(base, frac.tolist()):
        if f:
            out.append(f"{b}.{str(f).zfill(9).rstrip('0')}Z")
        else:
            out.append(b + "Z")
    return out


def render_frame_strings(wire: list[bytes], include_payload: bool = False) -> list[str]:
    """Frame.String() (+ DisplayFrame payload conventions) per wire frame."""
    fr = unmarshal_frames(b"".join(wire))
    pti = get_pti(fr.prim)
    evs = get_evtnum(fr.prim, fr.ude)
    sizes = frame_num_bytes(fr.prim, fr.ude)
    ulen = np.where(pti == 7, get_ucount(fr.ude), 0)
    times = _rfc3339nano(tm_ns(fr.prim))
    out = []
    for i in range(len(fr.prim)):
        ev = int(evs[i])
        s = (
            f"TMFRAME {times[i]} EVTNUM {evtnum_name(ev)} "
            f"[{int(sizes[i])} bytes] (UCOUNT {int(ulen[i])})"
        )
        p = int(pti[i])
        if p == PTI_ONE_INT64:
            s += f" V1:{int(fr.ude[i])}"
        elif p == PTI_ONE_FLOAT64:
            s += f" V0:{go_float_str(float(fr.v0[i]))}"
        elif p == PTI_TWO64:
            s += f" V0:{go_float_str(float(fr.v0[i]))} V1:{int(fr.ude[i])}"
        if include_payload:
            rendered = render_payload(ev, fr.data[i])
            if rendered is not None:
                # display.go: two spaces before JSON payloads, one before
                # msgpack-decoded JSON
                sep = "  " if (ev == 14 or 2000 <= ev <= 9999) else " "
                s += sep + rendered
        out.append(s)
    return out


def display_frames(
    df: DataFrame,
    frame_col: str = "frame",
    out_col: str = "display",
    include_payload: bool = False,
) -> DataFrame:
    """Append a Frame.String() render column decoded from wire bytes."""
    schema = StructType(df.schema.fields + [StructField(out_col, StringType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            out[out_col] = render_frame_strings(
                [bytes(x) for x in pdf[frame_col]], include_payload
            )
            yield out

    return df.mapInPandas(fn, schema)
