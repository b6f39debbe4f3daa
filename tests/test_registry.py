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


def test_registry_round8_window():
    """The round-8 grading window (first 50) leads with the queries
    VERDICT r7 demanded driver rows for."""
    window = list(entry_mod.queries().keys())[:50]
    must_grade = [
        "dup_span_intervals",
        "dup_spans_removed",
        "train_shuffle",
        "shard_assign",
        "perplexity_buckets",
        "url_canonicalize",
        "html_to_text",
        "robots_gate",
        "domain_rollup",
        "link_graph",
        "domain_rank",
        "dup_clusters",
        "scalar_functions",
        "media_features_knn",
    ]
    assert window[: len(must_grade)] == must_grade
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
