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


def test_registry_round9_window():
    """The round-9 grading window (first 50) contains the queries
    VERDICT r8 item #7 demanded driver rows for. SET containment, not
    position-pinning — r8's lesson: the position-pinned form rotted
    when a head insert wasn't mirrored here. Only the round's NEW /
    code-changed queries are position-checked (they must lead)."""
    window = list(entry_mod.queries().keys())[:50]
    # new or rewritten this round — must lead the window
    assert window[:9] == [
        "sitemap_frontier",
        "domain_rollup_full",
        "winnow_fingerprints",
        "winnow_dup_pairs",
        "surt_index",
        "decontaminate_bloom",
        "train_classifier",
        "stupid_backoff",
        "link_graph",
    ]
    must_grade = {
        # r8 newcomers kept in
        "domain_rollup", "domain_rank",
        # VERDICT r8 item #7 named re-certs
        "pack_sequences", "rate_limiter",
        "windowed_count", "hopping_count", "windowed_sum_by_type",
        "session_windows", "windowed_ktable",
        "kstream_left_join", "kstream_inner_join", "ktable_left_join",
        "ktable_inner_join", "ktable_outer_join",
        "asof_join", "asof_forward", "asof_nearest",
        "range_join", "interval_join", "semi_join", "anti_join",
    }
    missing = must_grade - set(window)
    assert not missing, f"round-9 must-grade queries not in window: {missing}"
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
