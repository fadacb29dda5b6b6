"""Z-order layout + zone-map pruning invariants (plans/layout.py)."""

from __future__ import annotations

from projet_meteo_etl_spark.plans.layout import (
    ZBINS,
    ZBITS,
    zone_pruning_estimate,
    zorder_layout_audit,
)

SF = "/root/testdata/sf0.01"


def test_zorder_bins_cover_small_rectangles(spark):
    """Z-bins must bound small rectangles: every bin's bounding-box
    area stays far below an equal-row single-column slab (which spans
    the full 2^ZBITS of the other dimension)."""
    rows = zorder_layout_audit(spark, SF).collect()
    assert 1 <= len(rows) <= ZBINS
    grid = 1 << ZBITS
    slab_ppm = (grid // ZBINS) * grid * 1_000_000 // (grid * grid)
    for r in rows:
        assert 0 <= r["min_xb"] <= r["max_xb"] < grid
        assert 0 <= r["min_yb"] <= r["max_yb"] < grid
        assert r["n_rows"] > 0
    mean_area = sum(r["area_ppm"] for r in rows) / len(rows)
    # Z-order bins average well under the sort-layout slab area
    assert mean_area < slab_ppm


def test_zone_pruning_zorder_beats_sort(spark):
    """For the fixed 2-D rectangle predicate, the Z-order layout must
    scan no more zones (and no more rows) than the partkey sort."""
    rows = {r["layout"]: r for r in zone_pruning_estimate(spark, SF).collect()}
    zo, so = rows["zorder"], rows["sort_partkey"]
    assert zo["n_zones"] == so["n_zones"] == ZBINS
    assert zo["zones_scanned"] + zo["zones_skipped"] == ZBINS
    assert zo["zones_scanned"] <= so["zones_scanned"]
    assert zo["rows_scanned"] <= so["rows_scanned"]
    assert zo["zones_scanned"] >= 1  # the predicate matches something
