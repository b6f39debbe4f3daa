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


def test_registry_round10_window():
    """The round-10 grading window (first 50) is the VERDICT r9 item
    #4 rotation: the round's NEW queries lead (position-pinned), the
    round-9 additions re-certify, and the rest is oldest-cert-first
    (the r5/r6-graded tail ungraded for 3-4 rounds, then the
    r7-graded kspp core). SET containment for the rotation body —
    r8's lesson: the fully position-pinned form rotted when a head
    insert wasn't mirrored here."""
    window = list(entry_mod.queries().keys())[:50]
    # new this round — must lead the window
    assert window[:21] == [
        "hll_cardinality",
        "hll_merge_slices",
        "contamination_scores",
        "snapshot_diff",
        "heavy_hitters",
        "typo_pairs",
        "quantile_histogram",
        "outlier_gate",
        "cms_counts",
        "cms_estimates",
        "minmax_scaled",
        "dedup_paragraphs",
        "event_transitions",
        "trending_terms",
        "domain_quality",
        "nfc_normalize",
        "hard_negatives",
        "hits_rank",
        "anchor_terms",
        "crawl_budget",
        "cluster_reps",
    ]
    must_grade = {
        # round-9 additions kept in for a second driver row
        "sitemap_frontier", "domain_rollup_full", "winnow_fingerprints",
        "winnow_dup_pairs", "surt_index", "decontaminate_bloom",
        "train_classifier", "stupid_backoff",
        # stalest certs: r5-graded stragglers
        "curate_docs", "minhash_pairs_portable", "simhash_portable",
        # the r6-graded tail, ungraded since round 6
        "bm25_indexed", "bpe_encoded", "bpe_merges", "bpe_merges_chars",
        "inverted_index", "ivf_exhaustive", "knn_cosine",
        "local_supplier_volume", "ngram_counts", "phrase_search",
        "phrase_search_indexed", "positional_index", "quantized_ann",
        "rollup_cascade", "scd2_lookup", "srp_ann", "srp_pairs",
        "token_pairs",
        # top_terms_per_lang (r6) and the whole r7-graded kspp-core
        # fill (count/ktable/filter/transform/flat_map/word_count/
        # merge/repartition) rotated out as the r10 head grew to 21 —
        # every one stays registered, benched every round, and
        # oracle-parity-tested on every pytest run; the events/
        # TIMESTAMP(NANOS) load path stays in-window via
        # event_transitions
    }
    missing = must_grade - set(window)
    assert not missing, f"round-10 must-grade queries not in window: {missing}"
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
