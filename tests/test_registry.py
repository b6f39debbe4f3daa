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


def test_registry_round14_window():
    """The round-14 grading window (first 50): every query whose
    code changed in the second optimization round regrades in-window
    (the r13 heads keep their certs for a second row), the
    materialize_once swap is represented by its heaviest users, and
    the SURVEY 2 core re-cert band stays in. SET containment for the
    rotation body — r8's lesson: the fully position-pinned form
    rotted when a head insert wasn't mirrored here."""
    window = list(entry_mod.queries().keys())[:50]
    # the r13 heads hold their certs for a second driver row
    assert window[:9] == ["knn_radius", "mad_outliers",
                          "attribution_decay", "theil_sen",
                          "stickiness", "hotspots", "knn_vote",
                          "assortativity", "readability"]
    # the round-14 rotation band: changed-code regrades + the
    # exact-twin grading surfaces + the held-over r13 (b) tail
    assert set(window[9:24]) == {
        "boilerplate_clean", "hll_error_band", "attribution",
        "domain_rank", "cusum_alarms", "numeric_drift",
        "category_drift", "srp_diverse_sample", "item_associations",
        "stupid_backoff", "cohort_retention", "rate_ztest",
        "score_calibration", "triangle_counts", "zorder_stats",
    }
    must_grade = {
        # SURVEY 2 core re-cert band (kept every round; hopping_count
        # / windowed_sum_by_type / windowed_ktable — and, for the
        # second optimization batch, session_windows / rate_limiter /
        # ktable_latest, for the third batch ktable_outer_join, for
        # the fourth batch ktable_inner_join, for the fifth batch
        # kstream_inner_join / ktable_left_join, and for the eighth
        # batch kstream_left_join itself (code unchanged, driver-green
        # r1-r12) — rotate just below the window for the
        # optimization-round regrades — green in r12 and the r13
        # build, parity-covered locally)
        "windowed_count",
        # round-13 build changed-code regrades
        "radius_join",          # explode-side + int64-safe floor cell
        "event_pattern_spans",  # marker metacharacter guard
        "rfm_segments",         # oracle NULL-contract fix
        # (attribution rotated just below for the tenth batch:
        # funnel_latency is the in-window representative of the same
        # finalize-split mechanism and holds the events load-path pin)
        "funnel_latency",
        "dup_clusters",         # CC three-engine restructure +
        "dup_clusters_fixed",   # r13-opt partition-local contraction
        # (cluster_reps rotated just below for the ninth batch: the
        # shared CC-engine change keeps these two in-window
        # representatives and cluster_reps' own layer — the
        # representative pick over the CC output — is unchanged,
        # parity-covered)
        # round-13 OPTIMIZATION-pass regrades (operator internals
        # restructured: winnow native rightmost-min, ppjoin
        # materialized stream, cooccurrence pack checkpoint,
        # stupid_backoff's token-frame spread+checkpoint, lazy
        # fixed-iteration checkpoints via hits_rank; the spread-only
        # entries typo_pairs / train_classifier / heavy_hitters
        # rotated just below the window for the sixth batch — their
        # conditional-input-spread mechanism is the one already
        # parity-covered below the window)
        "winnow_fingerprints", "winnow_dup_pairs", "ppjoin_pairs",
        # optimization-pass second batch: the value-table statistics
        # family restructured after the first close-out (spearman
        # rank-join fusion, correlation_matrix single-pass explode,
        # weighted_quantiles conditional-min picks — the engine under
        # theil_sen / mad_outliers / rfm_segments / funnel_latency)
        "spearman", "correlation_matrix", "weighted_median",
        # optimization-pass third batch (resumed session):
        # gopher_repetition restructured to map-only in-row
        # run-length folds (zero shuffles)
        "gopher_repetition",
        # optimization-pass fourth batch (second resumed session):
        # curate_docs gate filters moved above a lazy lineage cut so
        # the regex metric suite evaluates once per document instead
        # of once per pushed-down filter
        "curate_docs",
        # optimization-pass fifth batch: page_links' scheme gate now
        # precedes the RFC 3986 resolution (the pushed Filter re-ran
        # the whole resolve_url regex tree per anchor) — both
        # consumers regrade
        "link_graph", "anchor_terms",
        # optimization-pass sixth batch: the index-build family's
        # first aggregation restructured to MAP-ONLY in-row sorted
        # runs (per_doc_term_stats) — the three builds regrade;
        # phrase/bm25_indexed keep the explode shape via terms=
        # (physical plans verified identical) and sit below on parity
        "inverted_index", "positional_index", "positional_index_folded",
        # optimization-pass seventh batch: signature_band_slices'
        # NULL drop moved into the generator (the pushable Filter
        # re-ran the whole computed-signature expression below the
        # scan spread); quantized_ann checkpoints the band-slices
        # frame its two join branches re-derived. item_associations /
        # stupid_backoff / hits_rank (materialization-only lineage
        # cuts) rotate just below to make room.
        "srp_pairs", "srp_ann", "quantized_ann",
        # optimization-pass eighth batch: heavy_hitters' pass-2 sketch
        # prune rides a generator instead of a pushable filter (the
        # predicate was pushed below the scan-spread exchange,
        # serializing the hash-probe kernel); in-window representative
        # of the shared kernel — heavy_hitters_production differs only
        # by hash family and holds local parity below the window
        "heavy_hitters",
        # optimization-pass ninth batch: contamination_bloom's probe
        # prune rides a generator instead of a pushable
        # .filter(exists(...)) — the pushed predicate ran the whole
        # shingle+md5+bloom-probe kernel below the scan-spread
        # exchange on the single pre-spread split (the c9 mechanism;
        # the one real flag of the full-registry Filter plan sweep)
        "decontaminate_bloom",
        # optimization-pass tenth batch: minhash_lsh_pairs' candidate
        # materialization moved from persist()+count() to a lazy
        # localCheckpoint (one fewer full-lineage job; both verify
        # references truncate to one LogicalRDD) — rows-only regrade,
        # twin-consistency certified
        "minhash_lsh_pairs",
        # ROUND-14 changed-code regrades: the ppjoin aggregated
        # positional filter, the correlation_matrix int64-product
        # moments, the boilerplate in-row unit dedup, the
        # materialize_once representatives, the pagerank ChainReset,
        # and the new HLL error-band property twin
        "ppjoin_pairs", "correlation_matrix", "boilerplate_clean",
        "hll_error_band", "attribution", "domain_rank",
        "cusum_alarms", "numeric_drift", "category_drift",
        "item_associations", "stupid_backoff", "srp_diverse_sample",
    }
    missing = must_grade - set(window)
    assert not missing, f"round-14 must-grade queries not in window: {missing}"
    # events/TIMESTAMP(NANOS) load path stays in-window (verify-skill
    # contract): these read the events table
    assert {"windowed_count", "funnel_latency"} <= set(window)
    assert len(window) == len(set(window)) == 50


def test_oracles_cover_registered_queries():
    """Every oracle key maps to a registered query, and every graded
    (first-50) query has an oracle — EXCEPT the named rows-only
    production twins VERDICT r12 item #1 ordered into the round-13
    window: they are non-SQL-expressible by design (xxhash64 / seeded
    spark.ml KMeans / weighted reservoir), so the driver's rows-only
    check IS their strongest available signal, and each carries a
    semantic certification in tests/test_twin_consistency.py
    instead."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    window = list(q.keys())[:50]
    rows_only_ok = {"diverse_sample", "embedding_clusters",
                    "hll_production",
                    # c11: xxhash64 LSH — non-SQL-expressible by
                    # design; semantic contract is the r10
                    # twin-consistency certification
                    "minhash_lsh_pairs"}
    missing = [
        name for name in window
        if name not in o and name not in rows_only_ok
    ]
    assert not missing, f"graded queries without oracles: {missing}"
