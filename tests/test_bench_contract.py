"""Driver-contract guard for bench.py's stdout artifact.

Round-8 fix for a two-round telemetry outage: BENCH_r06/r07 recorded
``parsed: null`` because the single JSON line outgrew the driver's
~2000-char stdout tail window (the r6/r7 protocol blocks — per-order
mins, heavy_ab, load, concurrent_burst — pushed it past 4 KB). The
full blob now goes to ``bench_full.json``; stdout's final line is a
compact summary. These tests pin that contract WITHOUT running the
(minutes-long) bench itself: they rebuild the compact dict exactly as
``bench.main`` serializes it and bound its size with worst-case-width
numbers.
"""

from __future__ import annotations

import json

import bench

# The driver stores the last ~2000 chars of stdout. Keep real margin:
# the line before the JSON (the bench_full.json pointer) also lands in
# the tail, and future HEADLINE additions cost ~45 chars each.
TAIL_WINDOW = 2000
BUDGET = 1600


def _compact_line(per_query: dict[str, float]) -> str:
    # mirror of bench.main's final print — field-for-field
    compact = {
        "metric": "headline_queries_total_mean_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": per_query,
        "total_min": 99999.999,
        "burst_speedup": 99.99,
        "burst_equal": False,
        "load1_start": 99.99,
        "sf": "/root/testdata/sf0.1",
        "reps": 3,
        "full": "bench_full.json",
    }
    return json.dumps(compact, separators=(",", ":"))


def test_compact_line_fits_tail_window():
    # worst-case widths: every per-query mean at 5 digits + 3 decimals
    line = _compact_line({k: 99999.999 for k in bench.HEADLINE})
    assert len(line) <= BUDGET, (
        f"compact bench line is {len(line)} chars — over the {BUDGET} "
        f"budget (driver tail window {TAIL_WINDOW}); trim fields or "
        "move more detail into bench_full.json"
    )


def test_compact_line_is_parseable_and_has_driver_fields():
    line = _compact_line({k: 1.0 for k in bench.HEADLINE})
    parsed = json.loads(line)
    # the driver contract: ONE JSON line with metric/value/unit/queries/sf
    for field in ("metric", "value", "unit", "queries", "sf"):
        assert field in parsed
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_headline_growth_headroom():
    # ten more headline queries at worst-case name width must still fit
    padded = {k: 99999.999 for k in bench.HEADLINE}
    for i in range(10):
        padded[f"future_round_added_query_number_{i:02d}"] = 99999.999
    assert len(_compact_line(padded)) <= TAIL_WINDOW
