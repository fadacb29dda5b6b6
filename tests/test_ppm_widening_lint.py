"""Ratchet lint for the ppm-widening discipline (round-9 ADVICE class):
``count * 1000000 DIV/..//`` on a LongType/BIGINT multiplicand wraps
silently in non-ANSI Spark past ~9.2e12 while DuckDB errors loudly — a
latent cross-engine divergence.  The fix is to widen BEFORE the
multiply (``CAST(x AS DECIMAL(38,0)) * 1000000`` / ``x::HUGEINT``).

126 historical sites predate the discipline (round 10 inventory; most
have multiplicands bounded far below the wrap point by construction —
per-group counts, ppm-of-ppm terms, domain-bounded rollups).  Fixing
them is a per-site redraw-gated burn-down tracked in ADVICE.md; THIS
test is the ratchet that (a) forbids NEW un-widened sites and (b)
auto-tightens as old ones are fixed: update the per-file counts DOWN
when you widen a site, never up.
"""

from __future__ import annotations

import os
import re
from collections import Counter

SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "projet_meteo_etl_spark",
)

#: matches `foo * 1000000 DIV` / `foo * 1000000 //` where foo is a bare
#: identifier/paren chain NOT already a DECIMAL/HUGEINT cast
_PATTERN = re.compile(r"[A-Za-z_0-9)\].]+ \* 1000000 (?:DIV|//)")
_WIDENED = re.compile(r"DECIMAL\(38|HUGEINT\) \* 1000000|AS HUGEINT\)")

#: round-10 pinned inventory (pattern instances per file, widened casts
#: excluded).  A HIGHER count than pinned = a new un-widened site —
#: widen it instead of bumping the pin.  Lower is progress: lower the
#: pin in the same commit.
PINNED = {}  # populated below from the snapshot file


def _count(path: str) -> int:
    n = 0
    with open(path) as f:
        for line in f:
            for m in _PATTERN.finditer(line):
                # exclude already-widened expressions on the same line
                prefix = line[: m.start() + len(m.group(0))]
                if "DECIMAL(38" in prefix or "HUGEINT" in prefix:
                    continue
                n += 1
    return n


def _inventory() -> Counter:
    out: Counter = Counter()
    for root, _dirs, names in os.walk(SRC):
        if "_vendor" in root:
            continue
        for name in names:
            if not name.endswith(".py"):
                continue
            p = os.path.join(root, name)
            c = _count(p)
            if c:
                out[os.path.relpath(p, SRC)] = c
    return out


_SNAPSHOT = os.path.join(os.path.dirname(__file__), "ppm_lint_snapshot.txt")


def test_no_new_unwidened_ppm_products():
    with open(_SNAPSHOT) as f:
        pinned = {}
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            path, cnt = line.rsplit(" ", 1)
            pinned[path] = int(cnt)
    live = _inventory()
    grew = {
        p: (pinned.get(p, 0), c)
        for p, c in live.items()
        if c > pinned.get(p, 0)
    }
    assert not grew, (
        "NEW un-widened `x * 1000000 DIV/...//` site(s) — widen the "
        "multiplicand to DECIMAL(38,0)/HUGEINT before the multiply "
        f"instead of raising the pin: {grew}"
    )
    shrunk = {
        p: (pinned[p], live.get(p, 0))
        for p in pinned
        if live.get(p, 0) < pinned[p]
    }
    assert not shrunk, (
        "sites were widened (good!) but the ratchet pin was not "
        f"lowered — update tests/ppm_lint_snapshot.txt: {shrunk}"
    )
