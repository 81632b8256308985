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
from pyspark.sql import functions as F
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
        exp = 0  # recomputed exactly from the fixed repr below
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


def indent_json(compact: str, prefix: str = "      ", indent: str = "    ") -> str:
    """Go encoding/json.Indent over a compact JSON string: every element
    starts a new line indented ``prefix + depth*indent``; the first line has
    no prefix; string literals (incl. escapes) pass through untouched.
    Mirrors tfcat -p's prettyPrintJson(display.go:121-133) which indents
    with prefix six spaces and four-space steps."""
    import json as _json

    def _reject(_):
        raise ValueError("non-standard constant")

    # Go's scanner errors (-> Indent returns input verbatim) past nesting
    # depth 10000; enforce the same cap with an iterative scan so behavior
    # does not depend on the Python recursion limit
    d = mx = 0
    instr = skip = False
    for ch in compact:
        if instr:
            if skip:
                skip = False
            elif ch == "\\":
                skip = True
            elif ch == '"':
                instr = False
        elif ch == '"':
            instr = True
        elif ch in "{[":
            d += 1
            mx = max(mx, d)
        elif ch in "}]":
            d -= 1
    if mx > 10000:
        return compact
    try:  # Go's Indent returns the input unchanged on invalid JSON —
        # including NaN/Infinity, which Go's scanner rejects but Python's
        # loads() would accept without parse_constant. RecursionError covers
        # deep-but-legal nesting when the Python limit is lower than Go's.
        _json.loads(compact, parse_constant=_reject)
    except (ValueError, RecursionError):
        return compact
    # Go's Indent preserves TRAILING whitespace of src verbatim (doc:
    # "trailing space characters at the end of src are preserved"); only
    # internal insignificant whitespace is dropped
    stripped = compact.rstrip(" \t\n\r")
    trailing = compact[len(stripped) :]
    compact = stripped
    out: list[str] = []
    depth = 0
    in_str = False
    esc = False
    i, n = 0, len(compact)

    def _next_token(j: int) -> str:
        while j < n and compact[j] in " \t\n\r":
            j += 1
        return compact[j] if j < n else ""

    while i < n:
        c = compact[i]
        if in_str:
            out.append(c)
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            i += 1
            continue
        if c in " \t\n\r":
            # Go's scanner drops insignificant whitespace entirely
            i += 1
            continue
        if c == '"':
            in_str = True
            out.append(c)
        elif c in "{[":
            # empty composite stays on one line, as Go does
            if _next_token(i + 1) in "}]":
                close = "}" if c == "{" else "]"
                out.append(c + close)
                i = compact.index(close, i + 1) + 1
                continue
            depth += 1
            out.append(c + "\n" + prefix + indent * depth)
        elif c in "}]":
            depth -= 1
            out.append("\n" + prefix + indent * depth + c)
        elif c == ",":
            out.append(",\n" + prefix + indent * depth)
        elif c == ":":
            out.append(": ")
        else:
            out.append(c)
        i += 1
    return "".join(out) + trailing


def render_frame_strings_for_r(wire: list[bytes]) -> list[str]:
    """Frame.StringifyForR() (display.go:236-280): R-consumable lines
    '<RFC3339Nano> evtnum <name>' + ' V0 x V1 y' value suffixes, JSON
    payloads after two spaces, msgpack payloads single-quoted after one."""
    from tmframe_spark.codec.payloads import render_json, render_msgpack

    fr = unmarshal_frames(b"".join(wire))
    pti = get_pti(fr.prim)
    evs = get_evtnum(fr.prim, fr.ude)
    times = _rfc3339nano(tm_ns(fr.prim))
    out = []
    for i in range(len(fr.prim)):
        ev = int(evs[i])
        s = f"{times[i]} evtnum {evtnum_name(ev)}"
        p = int(pti[i])
        if p == PTI_ONE_INT64:
            s += f" V1 {int(fr.ude[i])}"
        elif p == PTI_ONE_FLOAT64:
            s += f" V0 {go_float_str(float(fr.v0[i]))}"
        elif p == PTI_TWO64:
            s += f" V0 {go_float_str(float(fr.v0[i]))} V1 {int(fr.ude[i])}"
        if ev == 14 or 2000 <= ev <= 9999:
            s += "  " + render_json(fr.data[i])
        elif ev in (9, 15):
            s += f" '{render_msgpack(fr.data[i])}'"
        out.append(s)
    return out


def render_frame_strings(
    wire: list[bytes], include_payload: bool = False, pretty: bool = False
) -> list[str]:
    """Frame.String() (+ DisplayFrame payload conventions) per wire frame.
    ``pretty`` applies the tfcat -p JSON indentation to rendered payloads."""
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
                if pretty:
                    rendered = indent_json(rendered)
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
    pretty: bool = False,
    style: str = "string",
    index_col: str | None = None,
) -> DataFrame:
    """Append a render column decoded from wire bytes.

    ``style='string'`` = Frame.String()/DisplayFrame (tfcat default;
    ``pretty`` = tfcat -p JSON indenting); ``style='r'`` = StringifyForR
    (tfcat -r, R-consumable lines).

    ``index_col``: when given, each line is prefixed with the tfcat running
    frame index as '%06d ' (DisplayFrame's i >= 0 branch, display.go:36-40;
    tfcat passes the stream position, cmd/tfcat/tfcat.go:114). Compose with
    ops.merge.with_stable_pos to produce the stable global position — the
    prefix itself is a JVM-side format_string, no Python."""
    if style not in ("string", "r"):
        raise ValueError("style must be 'string' or 'r'")
    schema = StructType(df.schema.fields + [StructField(out_col, StringType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            wire = [bytes(x) for x in pdf[frame_col]]
            out[out_col] = (
                render_frame_strings_for_r(wire)
                if style == "r"
                else render_frame_strings(wire, include_payload, pretty)
            )
            yield out

    out = df.mapInPandas(fn, schema)
    if index_col is not None:
        out = out.withColumn(
            out_col,
            F.concat(F.format_string("%06d ", F.col(index_col)), F.col(out_col)),
        )
    return out
