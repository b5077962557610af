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


# --- round 12: per-key fault isolation (VERDICT r11 #1) ---------------------
#
# The driver's r11 bench died on the LAST key after both columns were
# fully measured and rc=1 threw everything away. The contract now: a
# raising spec records errors[name], every other key's number survives,
# and the printed line still parses and names the failed key.


class _Spec:
    def __init__(self, fn):
        self.build = fn


def test_run_set_isolates_a_raising_spec(spark):
    calls = []

    def good(s, d):
        calls.append(d)
        return s.range(3)

    def bad(s, d):
        raise RuntimeError("Python worker failed to connect back.")

    registry = {"good_a": _Spec(good), "boom": _Spec(bad), "good_b": _Spec(good)}

    def consume(df):
        df.collect()

    t, m, e, load, probes, cpu = bench.run_set(
        spark, registry, "/unused", 2, ["good_a", "boom", "good_b"],
        consume, with_probe=False,
    )
    assert set(t) == {"good_a", "good_b"} and set(m) == set(t)
    assert list(e) == ["boom"]
    # round 14: the loadavg stamp covers EVERY attempted key (a burst
    # can BE the error); no cpus → no mid-set probes
    assert set(load) == {"good_a", "boom", "good_b"}
    assert probes == {}
    assert e["boom"].startswith("RuntimeError: Python worker failed")
    # and the line built from a partial artifact still prints + parses
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": sum(t.values()),
        "unit": "sec",
        "sf": 0.1,
        "queries": t,
        "calibration": 0.8,
        "errors": e,
    }
    d = json.loads(bench.compact_stdout_line(out))
    assert d["errs"] == ["boom"]
    assert set(d["queries"]) == {"good_a", "good_b"}


def test_run_set_missing_probe_module_is_isolated(spark, monkeypatch):
    # even the trailing NOT_IN_TOTAL probe section may not kill the set
    import datafusion_functions_variant_spark.queries.ingestion as ing

    def raising_build(s, d):
        raise RuntimeError("index build exploded")

    monkeypatch.setattr(ing, "bucketed_index_build", raising_build)
    t, m, e, _load, _probes, _cpu = bench.run_set(
        spark, {}, "/unused", 1, [], lambda df: df.collect(), with_probe=True
    )
    assert "dedup_incremental_bucketed_probe" in e and not t


def test_line_tolerates_missing_calibration():
    # a crash before the calibration probe must not break the finally-print
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": 0.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {},
        "errors": {"__calibration__": "RuntimeError: boom"},
    }
    d = json.loads(bench.compact_stdout_line(out))
    assert "calib" not in d and d["errs"] == ["__calibration__"]


def test_errs_survive_every_degradation_step():
    out = _out(200)  # forces the drop-both-maps form
    out["errors"] = {"stream_transform_with_state": "x"}
    d = json.loads(bench.compact_stdout_line(out))
    assert "queries" not in d
    assert d["errs"] == ["stream_transform_with_state"]


def test_run_isolated_keys_retries_in_fresh_session():
    # first attempt throws (the r11 'connect back' shape), the retry in
    # a fresh session succeeds: the number is recorded plus a retried
    # note, a double failure records the error, nothing raises. Pure
    # stubs — run_isolated_keys stops sessions, so the real shared
    # spark fixture must never enter the holder.
    attempts = []

    def flaky(s, d):
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("Python worker failed to connect back.")
        return "df"

    def always_bad(s, d):
        raise RuntimeError("StreamingQueryException: boom")

    registry = {"flaky_key": _Spec(flaky), "dead_key": _Spec(always_bad)}

    stops = []

    class _FakeSpark:
        def stop(self):
            stops.append(1)

    sess = [_FakeSpark()]
    made = []

    def new_session():
        made.append(1)
        return _FakeSpark()

    retried = {}
    t, m, e, load, cpu = bench.run_isolated_keys(
        sess, registry, ["flaky_key", "dead_key"], "/unused", 2,
        lambda df: None, new_session, retried,
    )
    # flaky_key: measured on retry, noted; dead_key: double failure recorded
    assert "flaky_key" in t and "flaky_key" in retried
    assert retried["flaky_key"].startswith("RuntimeError: Python worker")
    assert "dead_key" in e and "retry:" in e["dead_key"]
    # both failures stopped-and-replaced the held session
    assert len(stops) == 2 and len(made) == 2
    assert isinstance(sess[0], _FakeSpark)
    # round 14: per-key loadavg stamped for measured AND dead keys
    assert set(load) == {"flaky_key", "dead_key"}


# --- round 13: self-contained weather adjudication (VERDICT r12 #2) ---------
#
# BENCH.json must carry the box state (loadavg before/after each set)
# and the calibration sample spread so a contention-tainted run is
# identifiable from the artifact alone — the r12 driver run's scaled
# column (guest load 15) vs the same-day quiet-window run could only
# be told apart via BASELINE.md archaeology.


def test_loadavg_now_shape():
    la = bench.loadavg_now()
    # linux container: three non-negative floats (1/5/15 min)
    assert la is not None and len(la) == 3
    assert all(isinstance(x, float) and x >= 0 for x in la)


def test_cpu_now_shape_and_delta_pct():
    # linux container: 8 monotone cumulative jiffie counters; the
    # delta classifier returns bounded percentages that sum <= 100
    a = bench.cpu_now()
    assert a is not None and len(a) == 8 and all(v >= 0 for v in a)
    import time

    time.sleep(0.05)
    b = bench.cpu_now()
    assert all(y >= x for x, y in zip(a, b))
    pct = bench.cpu_delta_pct(a, b)
    assert pct is not None and set(pct) == {"u", "s", "w", "st"}
    assert all(0.0 <= v <= 100.0 for v in pct.values())
    assert sum(pct.values()) <= 100.0 + 1e-6
    # degenerate inputs -> None, never a crash
    assert bench.cpu_delta_pct(None, b) is None
    assert bench.cpu_delta_pct(a, a) is None


def test_run_set_stamps_per_key_cpu_breakdown(spark):
    def good(s, d):
        return s.range(2)

    registry = {"k00": _Spec(good), "k01": _Spec(good)}
    t, m, e, load, probes, cpu = bench.run_set(
        spark, registry, "unused", 1, ["k00", "k01"], lambda df: df.collect(),
        with_probe=False,
    )
    assert not e
    # on this linux box the cpu map must cover every completed key
    # with the {u,s,w,st} percentage breakdown
    assert set(cpu) == {"k00", "k01"}
    for pct in cpu.values():
        assert set(pct) == {"u", "s", "w", "st"}
        assert all(0.0 <= v <= 100.0 for v in pct.values())


def test_committed_bench_artifact_carries_weather_fields():
    import os

    path = os.path.join(os.path.dirname(bench.__file__), "BENCH.json")
    with open(path) as fh:
        b = json.load(fh)
    assert "calibration_spread" in b, "re-stamp BENCH.json with round-13 bench.py"
    assert isinstance(b["calibration_spread"], float)
    la = b.get("loadavg", {})
    assert "sf_pre" in la and "sf_post" in la
    assert all(len(v) == 3 for v in la.values())
    if "scaled_calibration" in b:
        assert "scaled_calibration_spread" in b
        assert "scaled_pre" in la and "scaled_post" in la


def test_errs_list_is_bounded_on_the_line():
    # an irreducibly long errs list must truncate, not trip the hard
    # byte-cap assert in the finally-print (ADVICE r12)
    out = _out(0)
    out["errors"] = {f"some_failing_query_name_{i:03d}": "x" for i in range(50)}
    d = json.loads(bench.compact_stdout_line(out))
    assert len(d["errs"]) == 13
    assert d["errs"][-1] == "+38 more"
    assert len(json.dumps(d, separators=(",", ":"))) <= bench.STDOUT_LINE_LIMIT


# --- round 14: per-key weather localization (VERDICT r13 "next" #3) ---------
#
# The r13 six-run shakedown proved the set-opening calibration_spread
# cannot catch BURSTY steal landing mid-set (run 6: pristine 0.012
# spread, worst column of the day). run_set now stamps the 1-min
# loadavg per key and re-times the frozen calibration probe every
# MID_PROBE_EVERY completed keys, so a burst is bracketed to the keys
# it actually hit — in the committed BENCH.json only, never the line.


def test_mid_set_probe_cadence(spark, monkeypatch):
    fired = []

    def fake_probe(s, cpus):
        fired.append(cpus)
        return 0.8

    monkeypatch.setattr(bench, "calibration_probe_once", fake_probe)

    def good(s, d):
        return s.range(2)

    names = [f"k{i:02d}" for i in range(bench.MID_PROBE_EVERY * 2 + 1)]
    registry = {n: _Spec(good) for n in names}
    t, m, e, load, probes, cpu = bench.run_set(
        spark, registry, "/unused", 1, names, lambda df: df.collect(),
        with_probe=False, cpus=4,
    )
    assert not e and set(load) == set(names)
    # exactly one probe after each MID_PROBE_EVERY-th completed key,
    # keyed by the name of the key just finished
    assert fired == [4, 4]
    assert set(probes) == {
        names[bench.MID_PROBE_EVERY - 1],
        names[2 * bench.MID_PROBE_EVERY - 1],
    }
    assert all(v == 0.8 for v in probes.values())


def test_sf01_probe_cadence_is_tightened_to_every_4(spark, monkeypatch):
    """Round 15: both r14 bursts landed between every-8 probes (keys
    9–13 and 7–9 — inside the 7-key blind window). The sf0.1 column
    now probes every MID_PROBE_EVERY_SF01=4 completed keys so a burst
    brackets to ≤3 keys; main() passes it for the sf set only."""
    import inspect

    fired = []

    def fake_probe(s, cpus):
        fired.append(cpus)
        return 0.8

    monkeypatch.setattr(bench, "calibration_probe_once", fake_probe)
    assert bench.MID_PROBE_EVERY_SF01 == 4
    names = [f"k{i:02d}" for i in range(9)]
    registry = {n: _Spec(lambda s, d: s.range(1)) for n in names}
    t, m, e, load, probes, cpu = bench.run_set(
        spark, registry, "/unused", 1, names, lambda df: df.collect(),
        with_probe=False, cpus=4, probe_every=bench.MID_PROBE_EVERY_SF01,
    )
    assert not e and len(fired) == 2
    assert set(probes) == {names[3], names[7]}
    # and main() actually wires the tight cadence to the sf column
    src = inspect.getsource(bench.main)
    assert "probe_every=MID_PROBE_EVERY_SF01" in src


def test_mid_set_probe_failure_does_not_kill_the_set(spark, monkeypatch):
    def exploding_probe(s, cpus):
        raise RuntimeError("probe session died")

    monkeypatch.setattr(bench, "calibration_probe_once", exploding_probe)
    names = [f"k{i:02d}" for i in range(bench.MID_PROBE_EVERY)]
    registry = {n: _Spec(lambda s, d: s.range(1)) for n in names}
    t, m, e, load, probes, cpu = bench.run_set(
        spark, registry, "/unused", 1, names, lambda df: df.collect(),
        with_probe=False, cpus=4,
    )
    assert set(t) == set(names) and not e and probes == {}


def test_per_key_weather_maps_never_reach_the_printed_line():
    out = _out(8)
    out["queries_load"] = {f"some_headline_query_name_{i:03d}": 1.5 for i in range(8)}
    out["mid_calibrations"] = {"some_headline_query_name_007": 0.84}
    out["queries_cpu"] = {f"some_headline_query_name_{i:03d}": {"u": 50.0, "s": 5.0, "w": 0.0, "st": 3.2} for i in range(8)}
    out["scaled_queries_load"] = dict(out["queries_load"])
    out["scaled_mid_calibrations"] = dict(out["mid_calibrations"])
    out["scaled_queries_cpu"] = dict(out["queries_cpu"])
    d = json.loads(bench.compact_stdout_line(out))
    for k in d:
        assert "load" not in k and "mid_calibrations" not in k and "cpu" not in k


def test_calibration_probe_once_matches_calibration_times(spark):
    # the mid-set probe IS the frozen calibration query: same plan,
    # same constant result-blindness — one run returns a positive sec
    import os

    cpus = min(8, os.cpu_count() or 8)
    v = bench.calibration_probe_once(spark, cpus)
    assert isinstance(v, float) and v > 0


# --- round 16: harness fixes (ADVICE r15 + VERDICT r15 #3) -------------------


def test_cpu_now_short_procstat_line_returns_none(monkeypatch):
    """A /proc/stat cpu line without the steal field (pre-2.6.11
    kernels) must yield None per the docstring's 'None where
    unsupported' contract — not a short list that IndexErrors inside
    cpu_delta_pct mid-set (ADVICE r15 low)."""
    import builtins
    import io

    real_open = builtins.open

    def fake_open(path, *a, **kw):
        if path == "/proc/stat":
            return io.StringIO("cpu  100 0 50 900 10\n")
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", fake_open)
    assert bench.cpu_now() is None


def test_mid_set_probe_burn_not_charged_to_next_key(spark, monkeypatch):
    """The calibration probe saturates every core by design; its CPU
    burn must be re-snapshotted away so it is not charged to the NEXT
    key's queries_cpu delta as user time (ADVICE r15 medium)."""
    snaps = []
    real_cpu_now = bench.cpu_now

    def tracking_cpu_now():
        s = real_cpu_now()
        snaps.append(s)
        return s

    monkeypatch.setattr(bench, "cpu_now", tracking_cpu_now)
    monkeypatch.setattr(
        bench, "calibration_probe_once", lambda s, cpus: 0.8
    )
    names = [f"k{i:02d}" for i in range(bench.MID_PROBE_EVERY)]
    registry = {n: _Spec(lambda s, d: s.range(1)) for n in names}
    bench.run_set(
        spark, registry, "/unused", 1, names, lambda df: df.collect(),
        with_probe=False, cpus=4,
    )
    # one snapshot at set open + one per key + one EXTRA after the
    # probe that fires on the MID_PROBE_EVERY-th key
    assert len(snaps) == 1 + len(names) + 1


def test_mid_set_probe_resnapshots_even_when_probe_raises(spark, monkeypatch):
    snaps = []
    real_cpu_now = bench.cpu_now

    def tracking_cpu_now():
        s = real_cpu_now()
        snaps.append(s)
        return s

    def exploding_probe(s, cpus):
        raise RuntimeError("probe died")

    monkeypatch.setattr(bench, "cpu_now", tracking_cpu_now)
    monkeypatch.setattr(bench, "calibration_probe_once", exploding_probe)
    names = [f"k{i:02d}" for i in range(bench.MID_PROBE_EVERY)]
    registry = {n: _Spec(lambda s, d: s.range(1)) for n in names}
    t, m, e, load, probes, cpu = bench.run_set(
        spark, registry, "/unused", 1, names, lambda df: df.collect(),
        with_probe=False, cpus=4,
    )
    assert set(t) == set(names) and not e and probes == {}
    assert len(snaps) == 1 + len(names) + 1


def test_artifact_paths_include_core_stamped_twin():
    """The driver's reduced-core scaling run must never clobber the
    full-core per-key data (it did in r15: the 32-core scaled column
    was lost to the c8 run — VERDICT r15 'What's wrong' #1). The
    artifact now also lands at BENCH_c{cpus}.json."""
    import os

    paths = bench.artifact_paths(32)
    names = [os.path.basename(p) for p in paths]
    assert names == ["BENCH.json", "BENCH_c32.json"]
    assert os.path.basename(bench.artifact_paths(8)[1]) == "BENCH_c8.json"
    # main() writes through artifact_paths (both files, every flush)
    import inspect

    src = inspect.getsource(bench.main)
    assert "artifact_paths(cpus)" in src
