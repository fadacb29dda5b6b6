"""Cleaning / unit-conversion expression library (SURVEY.md §2.2, P1-P13).

Every transform the reference applies per-cell with Python lambdas
(``/root/reference/etl_meteo.py:41-67,79-108``) is re-expressed here as a
pure Spark ``Column`` expression: JVM-side, null-propagating, inside
WholeStageCodegen — zero Python in the hot path, which is the difference
between ~1 MB/s/core (row-at-a-time ``Series.apply``) and full scan
throughput at 100 TB.

Quirk policy (documented per-function): where the reference's Python has
falsy-value surprises (``0`` triggering fallbacks or becoming null), we
provide BOTH a faithful variant and a sane default, and the pipeline
picks the sane one; divergences are flagged in docstrings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# P1 — string-to-float normalizer
# ---------------------------------------------------------------------------

#: unit suffixes the reference strips (etl_meteo.py:44); kept as a regex
#: alternation applied after the decimal-comma swap.  Note the reference
#: strips the *substring* "in" anywhere — we preserve that exact behavior
#: because station CSV numerics never contain letters except in units.
_UNIT_NOISE = r"(°F|mph|w/m²|%|in|\s)"


def clean_numeric(col: Column) -> Column:
    """P1: normalize a noisy numeric string to DOUBLE.

    Reference semantics (``etl_meteo.py:41-46``): NaN→null, ``','``→``'.'``
    (French decimal comma), strip spaces and unit suffixes
    (``°F mph in w/m² %``), ``float()`` cast with unparsable→null.

    ``try_cast`` returns null on unparsable input in EVERY session mode
    (plain ``cast`` raises under ANSI, Spark 4's default), exactly
    matching the reference's ``except ValueError: None``.
    """
    cleaned = F.regexp_replace(
        F.regexp_replace(col.cast("string"), ",", "."), _UNIT_NOISE, ""
    )
    return cleaned.try_cast("double")


# ---------------------------------------------------------------------------
# P2-P6 — unit conversions (all null-propagating arithmetic)
# ---------------------------------------------------------------------------

def fahrenheit_to_celsius(col: Column) -> Column:
    """P2 (etl_meteo.py:53): (°F − 32) × 5/9."""
    return (col - F.lit(32.0)) * F.lit(5.0) / F.lit(9.0)


def inhg_to_hpa(col: Column) -> Column:
    """P3 (etl_meteo.py:55): inHg × 33.8638."""
    return col * F.lit(33.8638)


def mph_to_ms(col: Column) -> Column:
    """P4 (etl_meteo.py:56): mph × 0.44704."""
    return col * F.lit(0.44704)


def inches_to_mm(col: Column) -> Column:
    """P5 (etl_meteo.py:57): in × 25.4."""
    return col * F.lit(25.4)


def kmh_to_ms(col: Column, default: float | None = 0.0) -> Column:
    """P6 (etl_meteo.py:92): km/h ÷ 3.6; missing input defaults to
    ``default`` (the reference defaults missing/falsy wind to 0.0 —
    asymmetric with the CSV path, which leaves nulls as nulls)."""
    base = col.cast("double")
    if default is not None:
        base = F.coalesce(base, F.lit(float(default)))
    return base / F.lit(3.6)


# ---------------------------------------------------------------------------
# P7 — timestamp assembly
# ---------------------------------------------------------------------------

def assemble_timestamp(date_col: Column, time_col: Column) -> Column:
    """P7 (etl_meteo.py:59): ``"{date} {time}"`` → TimestampType.

    The reference keeps this as a *string* and only parses transiently;
    we type it properly (SURVEY §1.2 decision) — `to_timestamp` with a
    12-hour format for Weather-Underground-style "12:00 AM" times, else
    fall back to 24-hour "HH:mm[:ss]".
    """
    joined = F.when(
        time_col.isNotNull(), F.concat_ws(" ", date_col.cast("string"), time_col)
    )
    return F.coalesce(
        F.to_timestamp(joined, "yyyy-MM-dd h:mm a"),
        F.to_timestamp(joined, "yyyy-MM-dd H:mm"),
        F.to_timestamp(joined, "yyyy-MM-dd H:mm:ss"),
    )


# ---------------------------------------------------------------------------
# P9 — rain coalesce-with-fallback
# ---------------------------------------------------------------------------

def rain_accum(pluie_1h: Column, pluie_3h: Column, *, faithful: bool = False) -> Column:
    """P9 (etl_meteo.py:93): rain = pluie_1h else pluie_3h else 0.

    ``faithful=True`` replicates the Python ``or``-chain quirk where a
    *real measured 0.0* in ``pluie_1h`` falls through to ``pluie_3h``
    (``record.get('pluie_1h', ...) or 0``).  Default is the sane
    null-only fallback (plain coalesce) — divergence documented per
    SURVEY §7 "quirk fidelity" policy.
    """
    p1 = pluie_1h.cast("double")
    p3 = pluie_3h.cast("double")
    if faithful:
        return F.coalesce(F.nullif(p1, F.lit(0.0)), F.nullif(p3, F.lit(0.0)), F.lit(0.0))
    return F.coalesce(p1, p3, F.lit(0.0))


# ---------------------------------------------------------------------------
# P10 — falsy-to-null casts
# ---------------------------------------------------------------------------

def falsy_to_null_double(col: Column, *, faithful: bool = False) -> Column:
    """P10 (etl_meteo.py:98-100): ``float(x) if x else None``.

    ``faithful=True`` maps 0 and empty-string to null (the reference
    quirk that drops a real 0 °C reading); default is a plain double
    cast (empty string → null via cast, 0 stays 0).
    """
    d = col.cast("double")
    if faithful:
        return F.when((d == 0.0) | (col.cast("string") == ""), F.lit(None)).otherwise(d)
    return d


# ---------------------------------------------------------------------------
# Composite CSV-path transforms (P2..P6 applied after P1)
# ---------------------------------------------------------------------------

def wu_temperature_c(raw: Column) -> Column:
    """Weather Underground Temperature column → °C (P1 + P2)."""
    return fahrenheit_to_celsius(clean_numeric(raw))


def wu_pressure_hpa(raw: Column) -> Column:
    """Pressure (inHg string) → hPa (P1 + P3)."""
    return inhg_to_hpa(clean_numeric(raw))


def wu_wind_ms(raw: Column) -> Column:
    """Speed (mph string) → m/s (P1 + P4)."""
    return mph_to_ms(clean_numeric(raw))


def wu_rain_mm(raw: Column) -> Column:
    """Precip. Accum. (inches string) → mm (P1 + P5)."""
    return inches_to_mm(clean_numeric(raw))
