"""APRS packet parsing, expression-first.

Everything regular (TNC2 header, uncompressed positions, weather,
telemetry, messages, status) is pure `pyspark.sql.functions` — stays in
whole-stage codegen, scales linearly, no Python in the hot path. Only
the two byte-twiddling formats (base-91 compressed positions, Mic-E)
drop to an Arrow-batched pandas UDF (decoders.py).

Grammar sources (public): APRS Protocol Reference v1.0.1 (TAPR 2000) —
TNC2 framing §4, DTIs §5 p.17, positions §6/§9, weather §12, telemetry
§13, messages §14; APRS-IS q-constructs (aprs-is.net). The parser never
throws: malformed frames land with parse_error set (audit path), like
any collector's bad-packet table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# TNC2: SRC>DST,PATH1,PATH2*,qAR,GATE:info     (header chars before ':')
_HEADER_RE = r"^([A-Za-z0-9\-]{1,9})>([A-Za-z0-9\-]{1,9})((?:,[^,:]+)*):(.+)$"

# Uncompressed position body: 4903.50N/07201.75W-  (sym table between
# lat/lon, symbol after lon). APRS101 §6.
_POS_RE = r"(\d{2})(\d{2}\.\d{2})([NS])(.)(\d{3})(\d{2}\.\d{2})([EW])(.)"
# anchored variant with the remainder captured (group 9) — Spark has no
# replace-first, so 'everything after the position block' is a capture
_POS_ANCHORED_RE = "^" + _POS_RE + "(.*)$"


def _null_d() -> Column:
    return F.lit(None).cast("double")


def parse_tnc2(raw: Column) -> Column:
    """raw line -> struct(src, dst, path array, q_construct, gate, dti,
    info). Pure regexp/split/filter — no UDF (SURVEY.md h_str_parse_tnc2)."""
    src = F.regexp_extract(raw, _HEADER_RE, 1)
    dst = F.regexp_extract(raw, _HEADER_RE, 2)
    path_str = F.regexp_extract(raw, _HEADER_RE, 3)
    info = F.regexp_extract(raw, _HEADER_RE, 4)
    path = F.when(
        path_str == "", F.array().cast("array<string>")
    ).otherwise(F.slice(F.split(path_str, ","), 2, 1000))
    q = F.try_element_at(F.filter(path, lambda x: x.rlike("^qA")), F.lit(1))
    # the igate call follows the q-construct in the path
    qpos = F.array_position(path, q)
    gate = F.when(qpos > 0, F.try_element_at(path, (qpos + 1).cast("int")))
    dti = F.substring(info, 1, 1)
    return F.struct(
        src.alias("src"),
        dst.alias("dst"),
        path.alias("path"),
        q.alias("q_construct"),
        gate.alias("gate"),
        F.when(info != "", dti).alias("dti"),
        info.alias("info"),
    )


def _pos_fields(body: Column) -> dict[str, Column]:
    """Decode an uncompressed position body (already stripped of DTI and
    optional timestamp): ddmm.mmN<sym_table>dddmm.mmE<symbol>comment."""
    m = lambda g: F.regexp_extract(body, _POS_ANCHORED_RE, g)  # noqa: E731
    matched = m(3) != ""
    lat = (m(1).try_cast("double") + m(2).try_cast("double") / 60.0) * F.when(
        m(3) == "S", -1.0
    ).otherwise(1.0)
    lon = (m(5).try_cast("double") + m(6).try_cast("double") / 60.0) * F.when(
        m(7) == "W", -1.0
    ).otherwise(1.0)
    # trailing data: course/speed "ccc/sss", altitude "/A=nnnnnn" (§6)
    after = m(9)
    cse = F.regexp_extract(after, r"^(\d{3})/(\d{3})", 1)
    spd = F.regexp_extract(after, r"^(\d{3})/(\d{3})", 2)
    alt_ft = F.regexp_extract(body, r"/A=(\d{6})", 1)
    return {
        "latitude": F.when(matched, lat),
        "longitude": F.when(matched, lon),
        "symbol_table": F.when(matched, m(4)),
        "symbol": F.when(matched, m(8)),
        "course_deg": F.when(cse != "", cse.try_cast("double")),
        "speed_kmh": F.when(spd != "", spd.try_cast("double") * 1.852),  # knots->km/h
        "altitude_m": F.when(alt_ft != "", alt_ft.try_cast("double") * 0.3048),
        "comment": F.when(matched, F.regexp_replace(after, r"^(\d{3})/(\d{3})", "")),
        "matched": matched,
    }


def _wx_struct(info: Column) -> Column:
    """Positionless weather `_` (§12): letter-prefixed fixed-width fields
    c220s004g005t077r000p000P000h50b09900."""
    g = lambda pat: F.regexp_extract(info, pat, 1)  # noqa: E731
    num = lambda pat, scale=1.0: F.when(  # noqa: E731
        g(pat) != "", g(pat).try_cast("double") * scale
    )
    return F.struct(
        F.when(g(r"c(\d{3})") != "", g(r"c(\d{3})").try_cast("int")).alias("wind_dir"),
        num(r"s(\d{3})", 1.609344).alias("wind_speed"),  # mph->km/h
        num(r"g(\d{3})", 1.609344).alias("gust"),
        num(r"t(-?\d{2,3})").alias("temp_f"),
        num(r"r(\d{3})", 0.01).alias("rain_1h"),  # hundredths inch
        num(r"p(\d{3})", 0.01).alias("rain_24h"),
        num(r"P(\d{3})", 0.01).alias("rain_since_midnight"),
        F.when(g(r"h(\d{2})") != "", g(r"h(\d{2})").try_cast("int")).alias("humidity"),
        num(r"b(\d{5})", 0.1).alias("pressure_mb"),  # tenths of mb
    )


def _telemetry_struct(info: Column) -> Column:
    """T#sss,v1,v2,v3,v4,v5,bbbbbbbb (§13)."""
    seq = F.regexp_extract(info, r"^T#(\d{1,3})", 1)
    rest = F.regexp_extract(info, r"^T#\d{1,3},(.*)$", 1)
    parts = F.split(rest, ",")
    vals = F.transform(F.slice(parts, 1, 5), lambda x: x.try_cast("double"))
    bits = F.try_element_at(parts, F.lit(6))
    return F.when(
        seq != "",
        F.struct(seq.try_cast("int").alias("seq"), vals.alias("vals"), bits.alias("bits")),
    )


def _msg_struct(info: Column) -> Column:
    """:ADDRESSEE:text{msgNo — addressee is 9 chars space-padded (§14);
    ack/rej replies carry ackNN / rejNN as the text."""
    addressee = F.trim(F.substring(info, 2, 9))
    body = F.when(F.substring(info, 11, 1) == ":", F.substring(info, 12, 67))
    msg_no = F.regexp_extract(body, r"\{([A-Za-z0-9]{1,5})$", 1)
    text = F.regexp_replace(body, r"\{[A-Za-z0-9]{1,5}$", "")
    is_ack = body.rlike("^ack[A-Za-z0-9]{1,5}$")
    is_rej = body.rlike("^rej[A-Za-z0-9]{1,5}$")
    return F.when(
        body.isNotNull(),
        F.struct(
            addressee.alias("addressee"),
            text.alias("text"),
            F.when(msg_no != "", msg_no).alias("msg_no"),
            is_ack.alias("is_ack"),
            is_rej.alias("is_rej"),
        ),
    )


def parse_packets(df: DataFrame, raw_col: str = "raw", recv_ts_col: str | None = None) -> DataFrame:
    """Text lines -> the canonical wide packet frame (schema.PACKET_SCHEMA
    shape). Dispatches on the Data Type Identifier (first info byte,
    APRS101 §5 p.17): ! = / @ positions, _ weather, T telemetry,
    : messages, > status. Compressed/Mic-E enrichment is a separate
    opt-in stage (decoders.decode_compressed) because it leaves codegen.
    """
    raw = F.col(raw_col)
    hdr = parse_tnc2(raw)
    df = df.withColumn("_h", hdr)
    h = F.col("_h")
    info = h.getField("info")
    dti = h.getField("dti")

    # strip DTI (+ 7-char timestamp for / and @ forms) for position decode;
    # objects (§11): ;NAME(9)*|_ ts(7) pos...; items: )NAME[3-9]!|_ pos...
    pos_body = (
        F.when(dti.isin("!", "="), F.substring(info, 2, 1000))
        .when(dti.isin("/", "@"), F.substring(info, 9, 1000))
        .when(dti == ";", F.substring(info, 19, 1000))
        .when(dti == ")", F.regexp_extract(info, r"^\)([^!_]{3,9})[!_](.*)$", 2))
    )
    obj_name = F.when(dti == ";", F.trim(F.substring(info, 2, 9))).when(
        dti == ")", F.regexp_extract(info, r"^\)([^!_]{3,9})[!_]", 1)
    )
    obj_alive = F.when(dti == ";", F.substring(info, 11, 1) == "*").when(
        dti == ")", ~info.rlike(r"^\)[^!_]{3,9}_")
    )
    p = _pos_fields(F.coalesce(pos_body, F.lit("")))

    is_pos = dti.isin("!", "=", "/", "@", ";", ")") & p["matched"]
    is_wx = dti == "_"
    is_tel = dti == "T"
    is_msg = dti == ":"
    is_status = dti == ">"
    fmt = (
        F.when(is_pos & dti.isin(";"), "object")
        .when(is_pos & dti.isin(")"), "item")
        .when(is_pos, "uncompressed")
        .when(dti.isin("!", "=", "/", "@"), "compressed")  # pos DTI, digit-less body
        .when(is_wx, "wx")
        .when(is_tel, "telemetry")
        .when(is_msg, "message")
        .when(is_status, "status")
        .when(dti == ";", "object")
        .when(dti == ")", "item")
        .when(dti.isin("`", "'"), "mic-e")
        .otherwise("other")
    )
    parse_error = F.when(
        h.getField("src") == "", F.lit("bad-header")
    ).when(info.isNull() | (info == ""), F.lit("empty-info"))

    out = df.select(
        raw.alias("raw"),
        (
            F.col(recv_ts_col)
            if recv_ts_col
            else F.lit(None).cast("timestamp")
        ).alias("recv_ts"),
        F.when(h.getField("src") != "", h.getField("src")).alias("src"),
        F.when(h.getField("dst") != "", h.getField("dst")).alias("dst"),
        h.getField("path").alias("path"),
        h.getField("q_construct").alias("q_construct"),
        h.getField("gate").alias("gate"),
        dti.alias("dti"),
        F.when(parse_error.isNull(), fmt).alias("fmt"),
        F.when(is_pos, p["latitude"]).alias("latitude"),
        F.when(is_pos, p["longitude"]).alias("longitude"),
        F.when(is_pos, p["symbol_table"]).alias("symbol_table"),
        F.when(is_pos, p["symbol"]).alias("symbol"),
        F.when(is_pos, p["altitude_m"]).alias("altitude_m"),
        F.when(is_pos, p["course_deg"]).alias("course_deg"),
        F.when(is_pos, p["speed_kmh"]).alias("speed_kmh"),
        F.when(is_pos, p["comment"]).when(is_status, F.substring(info, 2, 1000)).alias("comment"),
        F.when(is_wx, _wx_struct(info)).alias("wx"),
        F.when(is_tel, _telemetry_struct(info)).alias("telemetry"),
        F.when(is_msg, _msg_struct(info)).alias("msg"),
        obj_name.alias("obj_name"),
        obj_alive.alias("obj_alive"),
        parse_error.alias("parse_error"),
    )
    return out


def station_view(packets: DataFrame) -> DataFrame:
    """The collector's classic 'stations' dimension: last-heard + counts
    per src — an aggregate view of the wide frame, not a second parse."""
    return packets.where(F.col("src").isNotNull()).groupBy("src").agg(
        F.max("recv_ts").alias("last_heard"),
        F.count("*").alias("n_packets"),
        F.max_by(F.col("latitude"), F.col("recv_ts")).alias("last_lat"),
        F.max_by(F.col("longitude"), F.col("recv_ts")).alias("last_lon"),
        F.max_by(F.col("symbol"), F.col("recv_ts")).alias("symbol"),
    )
