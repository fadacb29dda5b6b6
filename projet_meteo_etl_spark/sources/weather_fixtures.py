"""Deterministic synthetic weather fixtures (FIXTURES.md F1/F2).

The reference's real input files are not in its repo (its .gitignore
excludes them), so we synthesize equivalents exercising every quirk its
readers handle: decimal commas, unit suffixes, the junk units row at
file position 2, stray header whitespace, empty/unparsable cells,
duplicate timestamps, non-list JSON stations, records missing pluie_1h,
falsy values.  Layout: 2 stations × 7 days of ';'-separated latin-1
CSVs + one nested JSON dump — same shape as the reference manifest
(/root/reference/etl_meteo.py:16-34).
"""

from __future__ import annotations

import json
import os
import random

DATES = [f"2024-10-{d:02d}" for d in range(1, 8)]
CSV_STATIONS = {"1001": "la_madeleine", "1002": "ichtegem"}
JSON_STATIONS = ["07015", "07037"]

#: per-file golden row math (see generate_weather_fixtures docstring)
ROWS_PER_CSV_DAY = 24  # hourly + 1 dup + 1 bad-time (dropped) handled below


def _csv_rows(
    rng: random.Random, date: str
) -> tuple[list[str], list[dict]]:
    """24 hourly rows + 1 duplicate + 1 unparsable-time row (dropped by
    the null-timestamp filter, P11).

    Also returns the EXPECTED post-pipeline record per kept row,
    computed in pure Python from the same drawn values — the
    independent ground truth :func:`generate_weather_fixtures` stages
    as ``expected_unified.parquet``.  The arithmetic mirrors the
    cleaning contracts exactly (parse the *formatted* string, then
    ``(v−32)·5/9`` etc. in IEEE doubles, same operation order as the
    Column expressions), so the ETL's output must match bit-for-bit.
    """
    import datetime

    rows = []
    expected = []
    for h in range(24):
        ampm = "AM" if h < 12 else "PM"
        h12 = h % 12 or 12
        t = f"{h12}:00 {ampm}"
        # draw → format → (for expected) re-parse the formatted string:
        # the pipeline only ever sees the rounded text
        temp_s = f"{rng.uniform(40, 70):.1f}"
        hum_v = rng.randint(40, 100)
        press_s = f"{rng.uniform(29.5, 30.3):.2f}"
        speed_s = f"{rng.uniform(0, 20):.1f}"
        rain_s = f"{rng.uniform(0, 0.3):.2f}"
        temp = temp_s.replace(".", ",") + " °F"
        hum = f"{hum_v} %"
        press = press_s.replace(".", ",") + " in"
        speed = speed_s.replace(".", ",") + " mph"
        rain = rain_s.replace(".", ",") + " in"
        # sprinkle dirt: empty cell / unparsable token (→ null via P1)
        if h == 3:
            hum = ""
        if h == 5:
            press = "n/a"
        rows.append(f"{t};{temp};{hum};{press};{speed};{rain}")
        y, m, d = (int(x) for x in date.split("-"))
        expected.append(
            {
                "date_heure_utc": datetime.datetime(y, m, d, h, 0, 0),
                "temperature_c": (float(temp_s) - 32.0) * 5.0 / 9.0,
                "humidite_pct": None if h == 3 else float(hum_v),
                "pression_hpa": None if h == 5 else float(press_s) * 33.8638,
                "vent_vitesse_ms": float(speed_s) * 0.44704,
                "pluie_accum_mm": float(rain_s) * 25.4,
            }
        )
    # duplicate timestamp (exercises A5/Q5)
    rows.append(rows[12])
    expected.append(dict(expected[12]))
    # row with a non-time Time → dropped by assemble_timestamp + P11
    rows.append("--:--;55,0 °F;50 %;29,92 in;5,0 mph;0,0 in")
    return rows, expected


def generate_weather_fixtures(out_dir: str, seed: int = 42) -> dict:
    """Write fixtures; return manifest + golden counts.

    Golden math: each CSV day yields 26 raw data rows of which 1 has an
    unparsable time → 25 kept; the junk units row is dropped by content
    filter.  14 files × 25 = 350 CSV records.  JSON: 2 stations × 7 days
    × 24 h = 336 records, all with valid dh_utc, plus one non-list
    station and one non-dict record (both skipped) → 336 kept.
    Total golden count = 686.
    """
    import datetime

    rng = random.Random(seed)
    manifests: dict[str, dict[str, str]] = {}
    expected_rows: list[dict] = []
    for station_id, slug in CSV_STATIONS.items():
        manifest = {}
        for date in DATES:
            path = os.path.join(out_dir, f"wu_{slug}_{date}.csv")
            rows, exp = _csv_rows(rng, date)
            for r in exp:
                r["id_station"] = station_id
                r["source_donnees"] = "Weather Underground"
            expected_rows.extend(exp)
            lines = [
                "Time ;Temperature; Humidity ;Pressure;Speed;Precip. Accum.",
                rows[0],
                "°F;%;in;mph;in;junk",  # the units row pandas skiprows=[2] drops
                *rows[1:],
            ]
            # tmp + os.replace: a concurrent reader can never observe a
            # torn/partial CSV, matching the parquet publish below
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w", encoding="latin-1") as f:
                f.write("\n".join(lines) + "\n")
            os.replace(tmp, path)
            manifest[date] = path
        manifests[station_id] = manifest

    hourly: dict[str, object] = {}
    for sid in JSON_STATIONS:
        recs = []
        for date in DATES:
            for h in range(24):
                temp_s = f"{rng.uniform(8, 20):.1f}"
                hum_s = str(rng.randint(40, 100))
                press_s = f"{rng.uniform(995, 1025):.1f}"
                vent_s = f"{rng.uniform(0, 40):.1f}"
                rec = {
                    "dh_utc": f"{date} {h:02d}:00:00",
                    "temperature": temp_s,
                    "humidite": hum_s,
                    "pression": press_s,
                    "vent_moyen": vent_s,
                    "id_station": sid,
                }
                if h % 3 == 0:
                    rain_s = f"{rng.uniform(0, 2):.1f}"
                    rec["pluie_1h"] = rain_s
                else:
                    rain_s = f"{rng.uniform(0, 5):.1f}"
                    rec["pluie_3h"] = rain_s
                if h == 7:
                    rec["temperature"] = ""  # falsy → null (P10)
                if h == 9:
                    rec["vent_moyen"] = ""  # falsy → 0.0 default (P6)
                recs.append(rec)
                y, m, d = (int(x) for x in date.split("-"))
                expected_rows.append(
                    {
                        "date_heure_utc": datetime.datetime(y, m, d, h, 0, 0),
                        # pipeline uses the SANE P10 variant: ""→null,
                        # real zeros kept
                        "temperature_c": None if h == 7 else float(temp_s),
                        "humidite_pct": float(hum_s),
                        "pression_hpa": float(press_s),
                        # P6: missing/empty wind defaults to 0.0, then ÷3.6
                        "vent_vitesse_ms": (0.0 if h == 9 else float(vent_s))
                        / 3.6,
                        # P9 sane variant: plain coalesce(p1, p3, 0)
                        "pluie_accum_mm": float(rain_s),
                        "id_station": sid,
                        "source_donnees": "Infoclimat",
                    }
                )
        hourly[sid] = recs
    hourly["badstation"] = "not-a-list"  # skipped with warning (S4)
    hourly[JSON_STATIONS[0]].append("not-a-dict")  # skipped silently (S4)

    json_path = os.path.join(out_dir, "infoclimat.json")
    tmp = f"{json_path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"hourly": hourly, "metadata": {"v": 1}}, f)
    os.replace(tmp, json_path)

    expected_path = os.path.join(out_dir, "expected_unified.parquet")
    _write_expected_parquet(expected_rows, expected_path)

    return {
        "csv_manifests": manifests,
        "json_path": json_path,
        "expected_path": expected_path,
        "golden_csv": 14 * 25,
        "golden_json": 2 * 7 * 24,
        "golden_total": 14 * 25 + 2 * 7 * 24,
    }


def fixture_manifest(out_dir: str) -> dict:
    """The return value of :func:`generate_weather_fixtures` WITHOUT
    writing anything — every path is deterministic, so callers that
    know the fixtures already exist (marker file) can skip the
    regeneration entirely.  This matters because the registry imports
    trigger fixture staging: two concurrent processes (bench --isolate
    next to pytest, per the BASELINE requalification protocol) must not
    race on rewriting the same /tmp files an oracle may be reading."""
    manifests = {
        station_id: {
            date: os.path.join(out_dir, f"wu_{slug}_{date}.csv")
            for date in DATES
        }
        for station_id, slug in CSV_STATIONS.items()
    }
    return {
        "csv_manifests": manifests,
        "json_path": os.path.join(out_dir, "infoclimat.json"),
        "expected_path": os.path.join(out_dir, "expected_unified.parquet"),
        "golden_csv": 14 * 25,
        "golden_json": 2 * 7 * 24,
        "golden_total": 14 * 25 + 2 * 7 * 24,
    }


def _write_expected_parquet(rows: list[dict], path: str) -> None:
    """Stage the pure-Python ground truth as parquet — the artifact the
    DuckDB oracle hashes the Spark pipeline's output against.  This is
    an INDEPENDENT expectation (derived from the generator's in-memory
    values before they were serialized into quirky latin-1 CSV / nested
    JSON), not a re-read of the engine's own result: a bug anywhere in
    read → clean → convert → union shows up as a hash mismatch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = (
        "date_heure_utc",
        "temperature_c",
        "humidite_pct",
        "pression_hpa",
        "vent_vitesse_ms",
        "id_station",
        "source_donnees",
        "pluie_accum_mm",
    )
    arrays = {
        "date_heure_utc": pa.array(
            [r["date_heure_utc"] for r in rows], pa.timestamp("us")
        ),
        "id_station": pa.array([r["id_station"] for r in rows], pa.string()),
        "source_donnees": pa.array(
            [r["source_donnees"] for r in rows], pa.string()
        ),
    }
    for c in (
        "temperature_c",
        "humidite_pct",
        "pression_hpa",
        "vent_vitesse_ms",
        "pluie_accum_mm",
    ):
        arrays[c] = pa.array([r[c] for r in rows], pa.float64())
    # atomic publish: a concurrent oracle must never read a
    # half-written parquet
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.table({c: arrays[c] for c in cols}), tmp)
    os.replace(tmp, path)
