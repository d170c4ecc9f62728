"""Byte-twiddling APRS decoders: base-91 compressed positions (APRS101
§9) and Mic-E (§10). These are the sanctioned pandas-UDF escape hatch —
per-character base-91 arithmetic has no sane SQL-expression form.

Arrow-batched (SCALAR pandas UDF over string series -> struct series),
never row-at-a-time Python. Property tests (tests/test_aprs.py)
roundtrip them against the encoders in tests/fixtures/gen_aprs.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_COMPRESSED_SCHEMA = (
    "struct<latitude double, longitude double, symbol_table string, symbol string,"
    " course_deg double, speed_kmh double, altitude_m double>"
)


def _b91(chars: str) -> int:
    v = 0
    for c in chars:
        v = v * 91 + (ord(c) - 33)
    return v


def _decode_compressed_one(body: str):
    """`/YYYYXXXX$csT` — sym table, 4-char b91 lat, 4-char b91 lon,
    symbol, cs pair, compression type (APRS101 §9).

    The cs pair is POLYMORPHIC on the type byte T: when the GPS-fix
    bits (T-33) & 0x18 == 0x10 the pair is altitude
    (1.002^((c-33)*91 + (s-33)) feet); otherwise c in '!'..'z' encodes
    course/speed ('{' is radio range — not represented here; ' ' means
    no data)."""
    none = (None, None, None, None, None, None, None)
    if body is None or len(body) < 10:
        return none
    table, yyyy, xxxx, sym = body[0], body[1:5], body[5:9], body[9]
    if table not in "/\\0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ":
        return none
    if any(not (33 <= ord(c) <= 123) for c in yyyy + xxxx):
        return none
    lat = 90.0 - _b91(yyyy) / 380926.0
    lon = -180.0 + _b91(xxxx) / 190463.0
    course = speed = altitude_m = None
    if len(body) >= 12:
        c, s = body[10], body[11]
        ctype = ord(body[12]) - 33 if len(body) >= 13 else 0
        if c == " ":
            pass  # explicit "no cs data"
        elif ctype & 0x18 == 0x10 and "!" <= c <= "{" and "!" <= s <= "{":
            alt_ft = 1.002 ** ((ord(c) - 33) * 91 + (ord(s) - 33))
            altitude_m = alt_ft * 0.3048
        elif "!" <= c <= "z":
            cv = ord(c) - 33
            if 0 <= cv <= 89:
                course = float(cv * 4)
                speed = (1.08 ** (ord(s) - 33) - 1.0) * 1.852  # knots->km/h
    return lat, lon, table, sym, course, speed, altitude_m


_MICE_LAT_DIGIT = {}
for ch in "0123456789":
    _MICE_LAT_DIGIT[ch] = (ch, 0, "S", 0)  # digit, msg bit, lat dir S, lon offset 0
for i, ch in enumerate("ABCDEFGHIJ"):
    _MICE_LAT_DIGIT[ch] = (str(i), 1, "S", 0)
for i, ch in enumerate("PQRSTUVWXY"):
    _MICE_LAT_DIGIT[ch] = (str(i), 1, "N", 100)
_MICE_LAT_DIGIT["K"] = (" ", 1, "S", 0)
_MICE_LAT_DIGIT["L"] = (" ", 0, "S", 0)
_MICE_LAT_DIGIT["Z"] = (" ", 1, "N", 100)


def _decode_mice_one(dst: str, info: str):
    """Mic-E: latitude/message in the DST callsign, longitude/speed/course
    in the first info bytes (APRS101 §10)."""
    none = (None, None, None, None, None, None, None)
    if not dst or not info or len(dst) < 6 or len(info) < 9 or info[0] not in "`'":
        return none
    try:
        digits = []
        ns = "N"
        lon_off = 0
        we = "E"
        for i, ch in enumerate(dst[:6]):
            if ch not in _MICE_LAT_DIGIT:
                return none
            d, _msg, nsd, off = _MICE_LAT_DIGIT[ch]
            digits.append(d)
            if i == 3:
                ns = nsd if nsd else "S"
            if i == 4:
                lon_off = off
            if i == 5:
                we = "W" if off == 100 else "E"
        latstr = "".join(digits).replace(" ", "0")
        lat = int(latstr[:2]) + float(latstr[2:4] + "." + latstr[4:6]) / 60.0
        if ns == "S":
            lat = -lat
        d28 = ord(info[1]) - 28
        m28 = ord(info[2]) - 28
        h28 = ord(info[3]) - 28
        lon_deg = d28 + lon_off
        if 180 <= lon_deg <= 189:
            lon_deg -= 80
        elif 190 <= lon_deg <= 199:
            lon_deg -= 190
        lon_min = m28 - 60 if m28 >= 60 else m28
        lon = lon_deg + (lon_min + h28 / 100.0) / 60.0
        if we == "W":
            lon = -lon
        sp28 = (ord(info[4]) - 28) * 10
        dc28 = ord(info[5]) - 28
        speed_knots = sp28 + dc28 // 10
        if speed_knots >= 800:
            speed_knots -= 800
        course = (dc28 % 10) * 100 + (ord(info[6]) - 28)
        if course >= 400:
            course -= 400
        return (
            lat,
            lon,
            info[8] if len(info) > 8 else None,
            info[7],
            float(course),
            speed_knots * 1.852,
            _mice_status_altitude(info[9:]),
        )
    except (ValueError, IndexError):
        return none


def _mice_status_altitude(status: str):
    """Altitude from the Mic-E status text (APRS101 §10): the FIRST item,
    encoded as 3 base-91 chars + '}', value = base91 - 10000 metres.
    Kenwood radios prefix one device-id byte ('>' TH-D7, ']' TM-D700),
    so the '}' may sit at offset 3 or 4."""
    for start in (0, 1):
        if len(status) >= start + 4 and status[start + 3] == "}":
            if start == 1 and status[0] not in ">]`'":
                continue
            c0, c1, c2 = (ord(c) - 33 for c in status[start : start + 3])
            if all(0 <= c < 91 for c in (c0, c1, c2)):
                return float((c0 * 91 + c1) * 91 + c2 - 10000)
    return None


_COLS = [
    "latitude",
    "longitude",
    "symbol_table",
    "symbol",
    "course_deg",
    "speed_kmh",
    "altitude_m",
]


def _decode_compressed_batch(body: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_decode_compressed_one(b) for b in body], columns=_COLS)


def _decode_mice_batch(dst: pd.Series, info: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_decode_mice_one(d, i) for d, i in zip(dst, info)], columns=_COLS)


def decode_compressed(body: Column) -> Column:
    """Arrow pandas-UDF wrapper, built at call time (decorating at import
    needs an active SparkSession in Spark 4)."""
    return pandas_udf(_decode_compressed_batch, _COMPRESSED_SCHEMA)(body)


def decode_mice(dst: Column, info: Column) -> Column:
    return pandas_udf(_decode_mice_batch, _COMPRESSED_SCHEMA)(dst, info)


def enrich_positions(packets, info_col: Column) -> "pyspark.sql.DataFrame":  # noqa: F821
    """Fill lat/lon for compressed + Mic-E frames via the UDF decoders;
    uncompressed frames keep their expression-decoded values."""
    from pyspark.sql import functions as F

    comp_body = F.when(
        F.col("fmt") == "compressed",
        F.when(F.col("dti").isin("!", "="), F.substring(info_col, 2, 1000)).otherwise(
            F.substring(info_col, 9, 1000)
        ),
    )
    mice = F.when(F.col("fmt") == "mic-e", decode_mice(F.col("dst"), info_col))
    comp = F.when(F.col("fmt") == "compressed", decode_compressed(comp_body))
    dec = F.coalesce(mice, comp)
    # ONE projection instead of a 7x withColumn chain: each withColumn
    # rebuilds the full projection through py4j (~0.5 s of driver time
    # per enrich on the r16 host); the single select keeps column order
    # and the per-field expressions identical.
    enriched = {
        field: F.coalesce(F.col(field), dec.getField(field)).alias(field)
        for field in _COLS
    }
    return packets.select(
        *[enriched.get(c, F.col(c)) for c in packets.columns]
    )
