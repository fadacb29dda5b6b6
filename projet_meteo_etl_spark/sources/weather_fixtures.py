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


def _csv_rows(rng: random.Random, date: str) -> list[str]:
    """24 hourly rows + 1 duplicate + 1 unparsable-time row (dropped by
    the null-timestamp filter, P11)."""
    rows = []
    for h in range(24):
        ampm = "AM" if h < 12 else "PM"
        h12 = h % 12 or 12
        t = f"{h12}:00 {ampm}"
        temp = f"{rng.uniform(40, 70):.1f}".replace(".", ",") + " °F"
        hum = f"{rng.randint(40, 100)} %"
        press = f"{rng.uniform(29.5, 30.3):.2f}".replace(".", ",") + " in"
        speed = f"{rng.uniform(0, 20):.1f}".replace(".", ",") + " mph"
        rain = f"{rng.uniform(0, 0.3):.2f}".replace(".", ",") + " in"
        # sprinkle dirt: empty cell / unparsable token (→ null via P1)
        if h == 3:
            hum = ""
        if h == 5:
            press = "n/a"
        rows.append(f"{t};{temp};{hum};{press};{speed};{rain}")
    # duplicate timestamp (exercises A5/Q5)
    rows.append(rows[12])
    # row with a non-time Time → dropped by assemble_timestamp + P11
    rows.append("--:--;55,0 °F;50 %;29,92 in;5,0 mph;0,0 in")
    return rows


def generate_weather_fixtures(out_dir: str, seed: int = 42) -> dict:
    """Write fixtures; return manifest + golden counts.

    Golden math: each CSV day yields 26 raw data rows of which 1 has an
    unparsable time → 25 kept; the junk units row is dropped by content
    filter.  14 files × 25 = 350 CSV records.  JSON: 2 stations × 7 days
    × 24 h = 336 records, all with valid dh_utc, plus one non-list
    station and one non-dict record (both skipped) → 336 kept.
    Total golden count = 686.
    """
    rng = random.Random(seed)
    manifests: dict[str, dict[str, str]] = {}
    for station_id, slug in CSV_STATIONS.items():
        manifest = {}
        for date in DATES:
            path = os.path.join(out_dir, f"wu_{slug}_{date}.csv")
            rows = _csv_rows(rng, date)
            lines = [
                "Time ;Temperature; Humidity ;Pressure;Speed;Precip. Accum.",
                rows[0],
                "°F;%;in;mph;in;junk",  # the units row pandas skiprows=[2] drops
                *rows[1:],
            ]
            with open(path, "w", encoding="latin-1") as f:
                f.write("\n".join(lines) + "\n")
            manifest[date] = path
        manifests[station_id] = manifest

    hourly: dict[str, object] = {}
    for sid in JSON_STATIONS:
        recs = []
        for date in DATES:
            for h in range(24):
                rec = {
                    "dh_utc": f"{date} {h:02d}:00:00",
                    "temperature": f"{rng.uniform(8, 20):.1f}",
                    "humidite": str(rng.randint(40, 100)),
                    "pression": f"{rng.uniform(995, 1025):.1f}",
                    "vent_moyen": f"{rng.uniform(0, 40):.1f}",
                    "id_station": sid,
                }
                if h % 3 == 0:
                    rec["pluie_1h"] = f"{rng.uniform(0, 2):.1f}"
                else:
                    rec["pluie_3h"] = f"{rng.uniform(0, 5):.1f}"
                if h == 7:
                    rec["temperature"] = ""  # falsy → null (P10)
                if h == 9:
                    rec["vent_moyen"] = ""  # falsy → 0.0 default (P6)
                recs.append(rec)
        hourly[sid] = recs
    hourly["badstation"] = "not-a-list"  # skipped with warning (S4)
    hourly[JSON_STATIONS[0]].append("not-a-dict")  # skipped silently (S4)

    json_path = os.path.join(out_dir, "infoclimat.json")
    with open(json_path, "w", encoding="utf-8") as f:
        json.dump({"hourly": hourly, "metadata": {"v": 1}}, f)

    return {
        "csv_manifests": manifests,
        "json_path": json_path,
        "golden_csv": 14 * 25,
        "golden_json": 2 * 7 * 24,
        "golden_total": 14 * 25 + 2 * 7 * 24,
    }
