"""Registry / rotation invariants: the driver verifies the FIRST
``_WINDOW`` entries of ``queries()`` each round, so the ordering and
the spec-hash ledger (QUERY_SPECS.json) are correctness
infrastructure — a stale ledger silently rotates an EDITED query out
of the window with only outdated verification evidence behind it.
"""

from __future__ import annotations

from datafusion_functions_variant_spark import queries as Q


def test_spec_ledger_fresh_for_upcoming_window():
    """Every query in the upcoming driver window must have a ledger
    entry matching its CURRENT spec hash. If this fails you edited a
    window query's builder or oracle — run
    ``python -m datafusion_functions_variant_spark.queries`` to
    re-stamp the ledger before committing."""
    reg = Q.load_all_queries()
    ledger = Q._load_spec_ledger()
    stale = [
        name
        for name in list(reg)[: Q._WINDOW]
        if ledger.get(name, {}).get("hash") != Q.spec_hash(reg[name])
    ]
    assert not stale, (
        f"stale QUERY_SPECS.json entries for window queries: {stale}; "
        "run `python -m datafusion_functions_variant_spark.queries`"
    )


def test_edited_spec_invalidates_verification():
    """A green CORRECTNESS row must stop counting as verification once
    the query's spec hash diverges from the ledger entry."""
    reg = Q.load_all_queries()
    green = Q._driver_green_rounds()
    ledger = Q._load_spec_ledger()
    # pick any green query with a ledger entry
    cands = [n for n in green if n in ledger and n in reg]
    assert cands, "no ledgered green queries to exercise"
    name = cands[0]
    verified = Q._driver_verified_names()
    entry = dict(ledger[name])
    try:
        ledger[name] = {"hash": "0" * 32, "round": entry.get("round", 0)}
        # monkey-patch the loader to serve the tampered ledger
        orig = Q._load_spec_ledger
        Q._load_spec_ledger = lambda: ledger
        assert name not in Q._driver_verified_names()
    finally:
        Q._load_spec_ledger = orig
        ledger[name] = entry
    # untampered state unchanged
    assert (name in Q._driver_verified_names()) == (name in verified)


def test_reverify_sample_rotates_and_is_deterministic():
    verified = {f"q{i}" for i in range(20)}
    s1 = Q._reverify_sample(verified)
    s2 = Q._reverify_sample(verified)
    assert s1 == s2 and len(s1) == Q._REVERIFY_SAMPLE
    assert s1 <= verified
    assert Q._reverify_sample(set()) == set()


def test_unverified_queries_fill_window_first():
    """Registry order: no verified query may sit in the window while
    an unverified one waits behind it (the sweep invariant)."""
    reg = Q.load_all_queries()
    verified = Q._driver_verified_names() - Q._reverify_sample(
        Q._driver_verified_names()
    )
    names = list(reg)
    seen_verified = False
    for n in names:
        if n in verified:
            seen_verified = True
        elif seen_verified:
            raise AssertionError(f"unverified query {n!r} behind verified ones")


def test_never_verified_queries_all_front_the_window():
    """A never-driver-verified (or stale-spec) query must NEVER be
    displaced from the verification window by the rotating re-verify
    sample — tier 0 strictly outranks tier 1 (regression: round 6's
    new query landed at position _WINDOW+1 behind 8 sample entries)."""
    reg = Q.load_all_queries()
    window = set(list(reg)[: Q._WINDOW])
    verified = Q._driver_verified_names()
    unverified = [n for n in reg if n not in verified]
    overflow = [n for n in unverified if n not in window]
    # only legitimate overflow: more unverified queries than slots
    assert len(unverified) <= Q._WINDOW or not window - set(unverified), (
        f"re-verify sample displaced never-verified queries: {overflow}"
    )
    if len(unverified) <= Q._WINDOW:
        assert not overflow, (
            f"never-verified queries outside the window: {overflow}"
        )


def test_window_capacity_not_exceeded_by_new_queries():
    """Hard cap for in-round additions: every never-verified query
    must fit the driver window in ONE round, or the cumulative-sweep
    guarantee (every query driver-hashed at least once) silently
    breaks. If this fails, STOP adding registry queries this round."""
    reg = Q.load_all_queries()
    unverified = [n for n in reg if n not in Q._driver_verified_names()]
    assert len(unverified) <= Q._WINDOW, (
        f"{len(unverified)} never-verified queries > window "
        f"{Q._WINDOW}: the overflow would miss this round's sweep"
    )


def test_tier2_order_rotates_with_round(monkeypatch):
    """Verified queries beyond the re-verify sample must not freeze in
    module order: the free window slots should land on different
    verified queries each round."""
    orders = []
    for rnd in (7, 8):
        monkeypatch.setattr(Q, "_current_round", lambda r=rnd: r)
        reg = Q.load_all_queries()
        verified = Q._driver_verified_names()
        sample = Q._reverify_sample(verified)
        orders.append(
            [n for n in reg if n in verified and n not in sample][:20]
        )
    assert orders[0] != orders[1]
