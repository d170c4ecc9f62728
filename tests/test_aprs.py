"""APRS parser/decoder tests: encode∘decode roundtrips (property-based
via hypothesis where the domain allows) and malformed-input hardening
(SURVEY.md §5.4)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).parent))

from fixtures.gen_aprs import enc_compressed, enc_uncompressed  # noqa: E402

from aprsdb_spark.aprs.decoders import (  # noqa: E402
    _decode_compressed_one,
    _decode_mice_one,
)


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-89.99, max_value=89.99),
    lon=st.floats(min_value=-179.99, max_value=179.99),
)
def test_compressed_roundtrip(lat, lon):
    """base-91 compressed: encode -> decode recovers within quantization
    (1/380926 deg lat ≈ 0.3 m)."""
    body = enc_compressed(lat, lon)
    dlat, dlon, table, sym, _, _, _ = _decode_compressed_one(body)
    assert dlat is not None
    assert math.isclose(dlat, lat, abs_tol=1e-4)
    assert math.isclose(dlon, lon, abs_tol=1e-4)
    assert table == "/"


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-89.9, max_value=89.9),
    lon=st.floats(min_value=-179.9, max_value=179.9),
)
def test_uncompressed_format_parses(lat, lon):
    """ddmm.mm encoding is well-formed: lat/lon fields re-extract with
    the parser's regex and arithmetic (python mirror, no session)."""
    import re

    s = enc_uncompressed(lat, lon)
    m = re.match(r"^(\d{2})(\d{2}\.\d{2})([NS])(.)(\d{3})(\d{2}\.\d{2})([EW])(.)", s)
    assert m, s
    got_lat = (int(m.group(1)) + float(m.group(2)) / 60.0) * (-1 if m.group(3) == "S" else 1)
    got_lon = (int(m.group(5)) + float(m.group(6)) / 60.0) * (-1 if m.group(7) == "W" else 1)
    # ddmm.mm quantizes to 0.01 arcmin ≈ 1.7e-4 deg
    assert math.isclose(got_lat, lat, abs_tol=5e-4)
    assert math.isclose(got_lon, lon, abs_tol=5e-4)


def test_compressed_altitude_type_byte():
    """APRS101 §9: when the type byte's GPS-fix bits are 0b10 the cs
    pair is altitude = 1.002^cs feet, NOT course/speed."""
    import math as m

    # cs for ~10000 ft: cs_val = round(log(10000)/log(1.002)) = 4610
    cs_val = round(m.log(10000) / m.log(1.002))
    c, s = chr(33 + cs_val // 91), chr(33 + cs_val % 91)
    t_alt = chr(33 + 0x10)  # GPS-fix bits = 0b10 -> altitude
    base = enc_compressed(37.5, -122.3)[:10]  # table+lat+lon+symbol
    lat, lon, _, _, course, speed, alt_m = _decode_compressed_one(base + c + s + t_alt)
    assert course is None and speed is None
    assert alt_m is not None and m.isclose(alt_m, 10000 * 0.3048, rel_tol=2e-3)

    # same cs with a non-altitude type byte decodes as course/speed
    t_cs = chr(33 + 0x00)
    _, _, _, _, course2, speed2, alt2 = _decode_compressed_one(base + c + s + t_cs)
    assert alt2 is None
    assert course2 is not None and speed2 is not None

    # ' ' always means "no cs data", even with the altitude type byte
    out = _decode_compressed_one(base + " s" + t_alt)
    assert out[4] is None and out[5] is None and out[6] is None
    for bad in [None, "", "x", "/ab", "/∞∞∞∞∞∞∞∞>", "Q!!!!!!!!>"]:
        out = _decode_compressed_one(bad)
        assert out[0] is None or isinstance(out[0], float)


def test_mice_malformed_returns_none():
    assert _decode_mice_one(None, None)[0] is None
    assert _decode_mice_one("ABC", "`x")[0] is None
    assert _decode_mice_one("??????", "`abcdefgh")[0] is None


@settings(max_examples=150, deadline=None)
@given(
    lat=st.floats(min_value=-89.9, max_value=89.9),
    lon=st.floats(min_value=-179.9, max_value=179.9),
    speed=st.integers(min_value=0, max_value=300),
    course=st.integers(min_value=0, max_value=359),
)
def test_mice_roundtrip(lat, lon, speed, course):
    """Mic-E encode (gen_aprs, from APRS101 §10) ∘ decode recovers
    position to ddmm.hh quantization, speed exactly, course exactly."""
    from fixtures.gen_aprs import enc_mice

    dst, info = enc_mice(lat, lon, speed_knots=speed, course=course)
    dlat, dlon, _t, _s, dcourse, dspeed, _alt = _decode_mice_one(dst, info)
    assert dlat is not None, (dst, info)
    assert math.isclose(dlat, lat, abs_tol=2e-4)
    assert math.isclose(dlon, lon, abs_tol=2e-4)
    assert math.isclose(dspeed, speed * 1.852, abs_tol=1e-6)
    assert math.isclose(dcourse, float(course), abs_tol=1e-6)


@settings(max_examples=100, deadline=None)
@given(alt=st.integers(min_value=-10000, max_value=99999 - 10000))
def test_mice_status_altitude_roundtrip(alt):
    """APRS101 §10: altitude rides the status text as 3 base-91 chars +
    '}', value - 10000 m; must decode at offset 0 and after a Kenwood
    device-id byte."""
    from fixtures.gen_aprs import enc_mice

    dst, info = enc_mice(37.1, -121.6, altitude_m=alt)
    *_, dalt = _decode_mice_one(dst, info)
    assert dalt == float(alt), (info, dalt)
    # Kenwood TH-D7 prefixes '>' before the altitude block
    body, status = info[:9], info[9:]
    *_, dalt2 = _decode_mice_one(dst, body + ">" + status)
    assert dalt2 == float(alt)


def test_mice_without_altitude_stays_none():
    from fixtures.gen_aprs import enc_mice

    dst, info = enc_mice(37.1, -121.6)
    *_, dalt = _decode_mice_one(dst, info)
    assert dalt is None
    # a status text that merely contains '}' later must not decode
    *_, dalt3 = _decode_mice_one(dst, info + "hello}world")
    assert dalt3 is None


def test_parser_never_throws_on_fixture(spark):
    """malformed.txt: every line yields a row; bad ones carry parse_error."""
    from aprsdb_spark.aprs.parse import parse_packets

    raw = spark.read.text(str(Path(__file__).parent / "fixtures/aprs/malformed.txt"))
    from pyspark.sql import functions as F

    lines = raw.select(
        F.try_element_at(F.split("value", "\t", 2), F.lit(2)).alias("raw")
    )
    rows = parse_packets(lines).collect()
    assert len(rows) == 7
    errs = [r for r in rows if r.parse_error is not None]
    ok = [r for r in rows if r.parse_error is None]
    assert len(errs) >= 3  # headerless garbage, no-colon, empty-info...
    assert any(r.src == "OKSTATUS" and r.fmt == "status" for r in ok)


@settings(max_examples=200, deadline=None)
@given(
    src=st.from_regex(r"[A-Z][A-Z0-9]{2,5}(\-[0-9]{1,2})?", fullmatch=True),
    dst=st.from_regex(r"[A-Z][A-Z0-9]{3,6}", fullmatch=True),
    digis=st.lists(
        st.sampled_from(["WIDE1-1", "WIDE2-2", "RELAY", "WIDE2-2*", "TCPIP*"]),
        max_size=3,
    ),
    q=st.sampled_from(["qAC", "qAR", "qAO", "qAS"]),
    gate=st.from_regex(r"[A-Z][A-Z0-9]{2,7}", fullmatch=True),
    info=st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=60,
    ),
)
def test_tnc2_grammar_roundtrip(src, dst, digis, q, gate, info):
    """format∘parse identity on the TNC2 header grammar (python mirror of
    the engine regex — SURVEY.md §5.4)."""
    import re

    from aprsdb_spark.aprs.parse import _HEADER_RE

    path = ",".join(digis + [q, gate])
    raw = f"{src}>{dst},{path}:{info}"
    m = re.match(_HEADER_RE, raw)
    assert m, raw
    assert m.group(1) == src
    assert m.group(2) == dst
    parts = m.group(3).split(",")[1:]
    assert parts == digis + [q, gate]
    assert m.group(4) == info


def test_committed_fixtures_match_generator():
    """The streaming goldens and the batch oracles' fixture-VALUES
    relations both read the COMMITTED tests/fixtures/aprs/*.txt files —
    so the one way they can drift is the committed bytes falling out of
    sync with gen_aprs.py (a generator edit without regeneration, or a
    hand-edited .txt). Regenerate every fixture in-memory and diff
    byte-for-byte against what is on disk (ADVICE/verdict r6 #6: one
    source generates both consumers)."""
    from fixtures.gen_aprs import ALL, HERE

    for name, gen in ALL.items():
        expected = "".join(f"{ms}\t{ln}\n" for ms, ln in gen())
        committed = (HERE / name).read_text()
        assert committed == expected, (
            f"{name} differs from gen_aprs.py output — regenerate via "
            f"`python tests/fixtures/gen_aprs.py` (or revert the "
            f"generator change)"
        )
