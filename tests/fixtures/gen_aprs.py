"""Deterministic APRS packet-stream fixture generator (FIXTURES.md §B).

Seed=42. Each line is `epoch_ms<TAB>tnc2_line` — APRS-IS raw lines carry
no timestamp; the collector stamps arrival, so the replay files carry
the stamp out-of-band. Run `python tests/fixtures/gen_aprs.py` to
(re)write the .txt files next to this script; they are committed.

Also exports encode helpers used by property tests to roundtrip the
engine's decoders (encode here, decode in aprsdb_spark.aprs).
"""

from __future__ import annotations

import random
from pathlib import Path

HERE = Path(__file__).parent / "aprs"
BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z


def enc_uncompressed(lat: float, lon: float, sym_table: str = "/", sym: str = "-") -> str:
    ns = "N" if lat >= 0 else "S"
    ew = "E" if lon >= 0 else "W"
    alat, alon = abs(lat), abs(lon)
    latd, lond = int(alat), int(alon)
    latm, lonm = (alat - latd) * 60, (alon - lond) * 60
    return f"{latd:02d}{latm:05.2f}{ns}{sym_table}{lond:03d}{lonm:05.2f}{ew}{sym}"


def enc_compressed(lat: float, lon: float, sym_table: str = "/", sym: str = ">") -> str:
    def b91(v: int, n: int = 4) -> str:
        out = []
        for _ in range(n):
            out.append(chr(33 + v % 91))
            v //= 91
        return "".join(reversed(out))

    y = round(380926 * (90 - lat))
    x = round(190463 * (180 + lon))
    return f"{sym_table}{b91(y)}{b91(x)}{sym} sT"


def line(src: str, dst: str, path: str, info: str) -> str:
    return f"{src}>{dst},{path}:{info}"


def write(name: str, rows: list[tuple[int, str]]) -> Path:
    HERE.mkdir(parents=True, exist_ok=True)
    p = HERE / name
    p.write_text("".join(f"{ms}\t{ln}\n" for ms, ln in rows))
    return p


def gen_pos_uncompressed() -> list[tuple[int, str]]:
    rng = random.Random(42)
    rows = []
    for i in range(200):
        st = i % 20
        lat = 47.0 + st * 0.1 + rng.uniform(-0.05, 0.05)
        lon = -122.0 - st * 0.1 + rng.uniform(-0.05, 0.05)
        info = "!" + enc_uncompressed(lat, lon) + f"cmt{i}"
        rows.append(
            (BASE_MS + i * 36_000, line(f"N{st}CALL-{st % 10}", "APRS", "WIDE1-1,qAR,IGATE1", info))
        )
    return rows


def gen_dupes_30s() -> list[tuple[int, str]]:
    """Igate duplicates: same (src, info) within 30 s but differing paths
    must be dropped; repeats beyond 30 s are new packets (APRS-IS rule)."""
    rows = []
    t = BASE_MS
    for i in range(10):
        info = "!" + enc_uncompressed(48.0 + i * 0.01, -121.0) + f"beacon{i}"
        src = f"DUP{i}CALL"
        rows.append((t, line(src, "APRS", "WIDE1-1,qAR,GATE-A", info)))
        rows.append((t + 5_000, line(src, "APRS", "WIDE2-2,qAO,GATE-B", info)))  # dup
        rows.append((t + 29_000, line(src, "APRS", "qAR,GATE-C", info)))  # dup
        rows.append((t + 45_000, line(src, "APRS", "qAR,GATE-A", info)))  # NEW (>30s)
        rows.append((t + 50_000, line(src, "APRS", "qAR,GATE-B", info)))  # dup of the new
        t += 120_000
    return rows


def gen_wx_telemetry() -> list[tuple[int, str]]:
    rows = []
    t = BASE_MS
    for i in range(20):
        wx = f"_07250357c{i * 10 % 360:03d}s{i:03d}g{i + 5:03d}t{60 + i:03d}r000p010P020h{40 + i % 50:02d}b{9900 + i:05d}"
        rows.append((t, line(f"WX{i}", "APRS", "qAR,WXGATE", wx)))
        tel = f"T#{i:03d},{120 + i},{200 - i},{i}.5,0,{i * 2},10110000"
        rows.append((t + 1_000, line(f"TLM{i}", "APRS", "qAR,TGATE", tel)))
        t += 60_000
    # telemetry definition messages (PARM/UNIT/EQNS/BITS arrive as messages)
    for kind, body in [
        ("PARM", "Battery,Temp,Pressure,A4,A5"),
        ("UNIT", "Volts,DegF,mb,x,y"),
        ("EQNS", "0,0.1,0,0,1,0,0,1,0,0,1,0,0,1,0"),
        ("BITS", "10110000,Test station"),
    ]:
        rows.append((t, line("TLM0", "APRS", "qAR,TGATE", f":TLM0     :{kind}.{body}")))
        t += 1_000
    return rows


def gen_msgs_acks() -> list[tuple[int, str]]:
    rows = []
    t = BASE_MS
    for i in range(15):
        a, b = f"ALICE-{i % 5}", f"BOB-{i % 3}"
        rows.append((t, line(a, "APRS", "qAC,MSGGATE", f":{b:<9}:hello {i}{{{i:02d}")))
        if i % 3 != 0:  # two thirds get acks
            rows.append((t + 3_000, line(b, "APRS", "qAC,MSGGATE", f":{a:<9}:ack{i:02d}")))
        t += 30_000
    return rows


def gen_late_data() -> list[tuple[int, str]]:
    rows = []
    for i in range(100):
        info = "!" + enc_uncompressed(45.0, -120.0 + i * 0.001) + f"p{i}"
        ms = BASE_MS + i * 60_000
        if i % 10 == 9:  # every 10th arrives 20 minutes late (event time old)
            ms -= 20 * 60_000
        rows.append((ms, line(f"LATE{i % 7}", "APRS", "qAR,LGATE", info)))
    return rows


def gen_malformed() -> list[tuple[int, str]]:
    rows = [
        (BASE_MS, "garbage with no header"),
        (BASE_MS + 1, "NOCOLON>APRS,WIDE1-1"),
        (BASE_MS + 2, "X>Y:"),
        (BASE_MS + 3, line("BADPOS", "APRS", "qAR,G", "!9999.99X/89999.99Q-")),
        (BASE_MS + 4, line("OKSTATUS", "APRS", "qAR,G", ">status text ok")),
        (BASE_MS + 5, ">:,,,"),
        (BASE_MS + 6, line("TRUNC", "APRS", "qAR,G", "!4903.50")),
    ]
    return rows


def gen_mice_compressed() -> list[tuple[int, str]]:
    rows = []
    for i in range(10):
        body = "=" + enc_compressed(40.0 + i * 0.5, -105.0 - i * 0.5)
        rows.append((BASE_MS + i * 10_000, line(f"CMP{i}", "APRS", "qAR,CGATE", body)))
    # Mic-E: position+speed+course ride in dst + info bytes
    for i in range(10):
        dst, info = enc_mice(37.0 + i * 0.3, -121.5 - i * 0.3,
                             speed_knots=5 * i, course=36 * i)
        rows.append((BASE_MS + 200_000 + i * 10_000, line(f"MIC{i}", dst, "qAR,MGATE", info)))
    return rows


ALL = {
    "pos_uncompressed.txt": gen_pos_uncompressed,
    "dupes_30s.txt": gen_dupes_30s,
    "wx_telemetry.txt": gen_wx_telemetry,
    "msgs_acks.txt": gen_msgs_acks,
    "late_data.txt": gen_late_data,
    "malformed.txt": gen_malformed,
    "mice_compressed.txt": gen_mice_compressed,
}


def main() -> None:
    for name, fn in ALL.items():
        p = write(name, fn())
        print(p, sum(1 for _ in p.open()))


def enc_mice(lat: float, lon: float, speed_knots: int = 0, course: int = 0,
             sym_table: str = "/", sym: str = ">",
             altitude_m: int | None = None) -> tuple[str, str]:
    """Mic-E encoder per APRS101 §10 (inverse of the engine's decoder):
    lat digits + N/S + lon-offset + E/W ride in the DST callsign; lon
    degrees/minutes/hundredths + speed/course in info bytes. Returns
    (dst, info)."""
    ns = "N" if lat >= 0 else "S"
    we = "W" if lon < 0 else "E"
    # integer hundredths-of-minutes (deg * 6000) — float rounding of the
    # hh field alone can carry into the minutes (hh=100 bug)
    lat_h = round(abs(lat) * 6000)
    lon_h = round(abs(lon) * 6000)
    latd, lat_rem = divmod(lat_h, 6000)
    digits = f"{latd:02d}{lat_rem // 100:02d}{lat_rem % 100:02d}"
    lond, lon_rem = divmod(lon_h, 6000)
    lon_off = 100 if (lond >= 100 or lond <= 9) else 0
    # dst bytes: 1-3 plain digits (msg bits 0); 4: N->P-Y, S->digit;
    # 5: offset 100 -> P-Y, else digit; 6: W->P-Y, else digit
    up = lambda d: "PQRSTUVWXY"[int(d)]  # noqa: E731
    b4 = up(digits[3]) if ns == "N" else digits[3]
    b5 = up(digits[4]) if lon_off == 100 else digits[4]
    b6 = up(digits[5]) if we == "W" else digits[5]
    dst = digits[0:3] + b4 + b5 + b6
    # info: lon d+28; the decoder adds the offset THEN folds the
    # 180-189/190-199 bands, so encode the pre-offset value accordingly
    d = lond
    if lon_off == 100:
        if 100 <= d <= 109:
            dd = d - 20  # +100 -> 180..189 -> fold -80 -> 100..109
        elif 0 <= d <= 9:
            dd = d + 90  # +100 -> 190..199 -> fold -190 -> 0..9
        else:
            dd = d - 100  # 110..179 plain
    else:
        dd = d
    m = lon_rem // 100
    h = lon_rem % 100
    m_enc = m + 60 if m <= 9 else m  # spec: minutes 0-9 encoded +60
    sp = speed_knots
    dc = (sp % 10) * 10 + course // 100
    se = course % 100
    info = (
        "`"
        + chr(dd + 28)
        + chr(m_enc + 28)
        + chr(h + 28)
        + chr(sp // 10 + 28 + 80)  # SP+28 with +800 fold marker below
        + chr(dc + 28)
        + chr(se + 28)
        + sym
        + sym_table
    )
    if altitude_m is not None:
        # status-text altitude: 3 base-91 chars + '}', value = alt + 10000
        v = altitude_m + 10000
        info += chr(v // 8281 + 33) + chr(v // 91 % 91 + 33) + chr(v % 91 + 33) + "}"
    return dst, info


if __name__ == "__main__":
    main()
