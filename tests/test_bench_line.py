"""bench.py's printed summary line must stay parseable from the
driver's ~2 KB stdout tail (r10 verdict #1: the 29th headline key
pushed the two per-query maps past the window — BENCH_r10.json
recorded ``parsed: null`` and the round's official number only
survived in git). ``compact_stdout_line`` now hard-caps the line and
degrades stepwise; these tests pin the cap, the degradation order,
and that the HEADLINE set as currently registered fits."""

from __future__ import annotations

import json

import bench


def _out(n_keys: int, scaled: bool = True) -> dict:
    qs = {f"some_headline_query_name_{i:03d}": 1.234 for i in range(n_keys)}
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": 33.13,
        "unit": "sec",
        "sf": 0.1,
        "queries": dict(qs),
        "calibration": 0.77,
    }
    if scaled:
        out["scaled_total"] = 48.61
        out["scale_k"] = 10
        out["scaled_calibration"] = 0.68
        out["scaled_queries"] = dict(qs)
    return out


def test_line_under_cap_and_parseable_at_current_headline_count():
    # the REAL headline names, not synthetic ones: this is the exact
    # line the driver will tail this round. At 29 keys the two full
    # maps measure ~2 KB — past the tail — so the contract is: line
    # fits, sf0.1 map complete, scaled column present through totals
    # (its per-key detail lives in the committed BENCH.json).
    names = bench.HEADLINE + bench.HEADLINE_ISOLATED
    out = _out(0)
    out["queries"] = {k: 1.234 for k in names}
    out["scaled_queries"] = {k: 12.345 for k in names}
    s = bench.compact_stdout_line(out)
    assert len(s) <= bench.STDOUT_LINE_LIMIT
    d = json.loads(s)
    # driver contract fields
    assert d["metric"] and d["unit"] == "sec" and d["sf"] == 0.1
    assert set(d["queries"]) == set(names)
    assert d["scaled_total"] == 48.61 and d["s_calib"] == 0.68


def test_line_drops_scaled_map_first_when_over():
    # 40 synthetic keys (~27 bytes each name) overflow two maps but
    # not one: the scaled map goes first, the sf0.1 map survives
    s = bench.compact_stdout_line(_out(40))
    assert len(s) <= bench.STDOUT_LINE_LIMIT
    d = json.loads(s)
    assert "queries" in d and "scaled_queries" not in d
    # the scaled column stays comparable through its totals
    assert d["scaled_total"] == 48.61 and d["s_calib"] == 0.68


def test_line_drops_both_maps_at_extreme_count():
    s = bench.compact_stdout_line(_out(200))
    assert len(s) <= bench.STDOUT_LINE_LIMIT
    d = json.loads(s)
    assert "queries" not in d and "scaled_queries" not in d
    assert d["value"] == 33.13 and d["full"] == "BENCH.json"


def test_line_cap_is_a_hard_assert_not_a_silent_overflow():
    import pytest

    with pytest.raises(AssertionError):
        bench.compact_stdout_line(_out(5), limit=40)


def test_not_in_total_keys_never_printed():
    out = _out(3)
    out["queries"]["dedup_incremental_bucketed_probe"] = 0.5
    out["scaled_queries"]["dedup_incremental_bucketed_probe"] = 0.9
    d = json.loads(bench.compact_stdout_line(out))
    assert "dedup_incremental_bucketed_probe" not in d["queries"]
    assert "dedup_incremental_bucketed_probe" not in d["scaled_queries"]


def test_isolated_keys_partition_headline():
    # the isolated set must not duplicate a HEADLINE entry (it would
    # double-time and double-count the key) and must stay non-empty
    # while stream_transform_with_state is a headline number
    assert set(bench.HEADLINE).isdisjoint(bench.HEADLINE_ISOLATED)
    assert "stream_transform_with_state" in bench.HEADLINE_ISOLATED
