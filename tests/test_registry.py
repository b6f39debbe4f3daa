"""The queries()/oracle_sql() registries are the external driver's
grading contract: the FIRST 50 queries() entries get graded, so
ordering and key uniqueness are load-bearing. A duplicate dict key is
silently deduped by Python (keeping the FIRST position with the LAST
value) — exactly the kind of slip that would silently change what
gets graded (it happened in round 7: three keys listed twice)."""

import ast
import os

import __spark_entry__ as entry_mod

_SRC = os.path.abspath(entry_mod.__file__)


def _queries_dict_keys() -> list[str]:
    """The string keys of the dict literal returned by queries(), in
    source order INCLUDING duplicates (which the runtime dict hides)."""
    tree = ast.parse(open(_SRC).read())
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    ret = next(n for n in ast.walk(fn) if isinstance(n, ast.Return))
    assert isinstance(ret.value, ast.Dict), "queries() must return a dict literal"
    keys = []
    for k in ret.value.keys:
        assert isinstance(k, ast.Constant) and isinstance(k.value, str)
        keys.append(k.value)
    return keys


def test_registry_no_duplicate_keys():
    keys = _queries_dict_keys()
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate queries() keys: {dupes}"
    # the AST view and the runtime dict agree exactly
    assert keys == list(entry_mod.queries().keys())


def test_registry_round12_window():
    """The round-12 grading window (first 50), VERDICT r11 item #2
    rotation: the round's NEW queries lead (position-pinned), every
    query whose CODE changed this round regrades (a changed query
    must never coast on a stale green), and a SURVEY 2 core re-cert
    band stays in (five join flavors, ktable, rate_limiter, windowed
    family — the composition VERDICT r11 called exactly right). SET
    containment for the rotation body — r8's lesson: the fully
    position-pinned form rotted when a head insert wasn't mirrored
    here."""
    window = list(entry_mod.queries().keys())[:50]
    # new this round — must lead the window
    assert window[:13] == [
        "funnel_latency",
        "event_pattern_spans",
        "rfm_segments",
        "attribution",
        "referential_integrity",
        "correlation_matrix",
        "ewma_smooth",
        "cusum_alarms",
        "acf_daily",
        "bfs_hops",
        "spearman",
        "kcore",
        "radius_join",
    ]
    must_grade = {
        # SURVEY 2 core re-cert band (kept per VERDICT r11 item #2)
        "kstream_left_join", "kstream_inner_join", "ktable_left_join",
        "ktable_inner_join", "ktable_outer_join", "ktable_latest",
        "rate_limiter", "windowed_count", "hopping_count",
        "windowed_sum_by_type", "session_windows", "windowed_ktable",
        # round-12 changed-code regrades
        "benford",          # string-rendered digit extraction (ADVICE r11)
        "category_drift",   # shared-counts refactor (streaming twins)
        "numeric_drift",
        "dup_clusters",     # CC rewrite attempted+reverted: safety re-cert
        "dup_clusters_fixed",
        "cluster_reps",
    }
    missing = must_grade - set(window)
    assert not missing, f"round-12 must-grade queries not in window: {missing}"
    # events/TIMESTAMP(NANOS) load path stays in-window (verify-skill
    # contract): these read the events table
    assert {"windowed_count", "funnel_latency"} <= set(window)
    assert len(window) == len(set(window)) == 50


def test_oracles_cover_registered_queries():
    """Every oracle key maps to a registered query, and every graded
    (first-50) query has an oracle — rows-only entries are allowed
    only OUTSIDE the window."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    window = list(q.keys())[:50]
    missing = [name for name in window if name not in o]
    assert not missing, f"graded queries without oracles: {missing}"
