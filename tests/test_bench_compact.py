"""The printed bench line must fit the driver's ~2 KB stdout-tail window
(the round-2 artifact was unparseable because the full line overflowed)."""

from __future__ import annotations

import json

import bench


def _fake_suite(n_queries: int) -> dict:
    return {
        "metric": "suite_seconds",
        "value": 123.456,
        "unit": "sec",
        "queries": {
            f"some_rather_long_query_name_number_{i:03d}": round(0.1 + i * 0.037, 3)
            for i in range(n_queries)
        },
        "sf": 0.1,
        "extraction_docs": 20000,
        "extraction_docs_per_sec": 23456.7,
        "cpus": 32,
    }


def test_compact_fits_limit_at_any_registry_size():
    for n in (5, 50, 96, 200, 500):
        out = bench._compact(_fake_suite(n))
        line = json.dumps(out)
        assert len(line) <= 1700, (n, len(line))
        # headline metrics always survive compaction
        assert out["metric"] == "suite_seconds"
        assert out["extraction_docs_per_sec"] == 23456.7


def test_compact_keeps_slowest_queries():
    out = bench._compact(_fake_suite(96))
    kept = set(out["queries"])
    full = _fake_suite(96)["queries"]
    slowest = sorted(full, key=full.get, reverse=True)[: len(kept)]
    assert kept == set(slowest)
    assert out["queries_elided"] == 96 - len(kept)


def test_compact_noop_when_small():
    small = _fake_suite(5)
    assert bench._compact(small) == small


def test_compact_drops_per_round_detail():
    big = _fake_suite(96)
    big["rounds"] = [dict(big["queries"]), dict(big["queries"])]
    out = bench._compact(big)
    assert "rounds" not in out
    assert len(json.dumps(out)) <= 1700
