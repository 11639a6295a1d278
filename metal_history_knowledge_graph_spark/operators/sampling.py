"""Deterministic sampling / dataset-mixing operators for training-data
pipelines.

Why not ``df.sample()``: Spark's built-in sampler draws per-partition
from a seeded RNG, so the selected set changes whenever the input's
partitioning changes (repartition, AQE coalescing, file-split drift) —
unacceptable for a resumable pipeline whose checkpoint story promises
exact re-runs (SURVEY §2.1 resume semantics). These operators decide
per *row key* instead: a row is kept iff a hash of its key lands below
the rate cutoff. That decision is

* deterministic and partition-independent (stable under repartition,
  resume, speculative re-execution),
* a narrow ``Filter`` — no shuffle, applied before any downstream
  exchange, column-pruned to the key column on the scan side,
* cross-engine reproducible: the hash is ``md5`` (bit-identical in
  every engine), so the driver's DuckDB oracle replays the exact
  keep/drop decision (unlike xxhash64, which DuckDB lacks).

At 100 TB the md5-per-row cost is one JVM intrinsic inside
whole-stage codegen — no Python, no UDF, no extra scan.

Scale notes per operator are in each docstring. The reference repo has
no sampling surface; these are the training-data-pipeline additions
required alongside the KG operators (brief: dedup/sampling/mixing as
first-class components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Hash-bucket resolution: rates are exact multiples of 1e-6.
BUCKETS = 1_000_000


def md5_mod(key: Column, prefix: str, m: int, hex_chars: int = 15) -> Column:
    """The repo's cross-engine deterministic hash: first ``hex_chars``
    hex digits of ``md5(prefix || key)`` as a BIGINT, mod ``m`` —
    exactly reproducible in ANSI SQL (DuckDB: ``('0x' ||
    substr(md5(prefix || key), 1, hex_chars))::UBIGINT % m``).
    ``hex_chars`` ≤ 15 keeps the value inside 60 bits (BIGINT-safe).
    Shared by sampling buckets (8 hex), Bloom positions and count-min
    columns (15 hex) so the Spark/DuckDB parity logic lives in one
    place."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), key.cast("string"))),
                    1, hex_chars),
        16,
        10,
    ).cast("bigint")
    return h % m


def hash_bucket(key: Column, seed: int = 0, domain: str = "") -> Column:
    """Deterministic bucket in ``[0, BUCKETS)`` from the first 8 hex
    chars of ``md5(domain || seed || '|' || key)`` — 32 hash bits,
    uniform, and exactly reproducible in ANSI SQL (DuckDB: ``('0x' ||
    substr(md5(...),1,8))::UBIGINT % 1000000``).

    ``domain`` separates OPERATORS, not runs: each sampling operator
    hashes in its own domain so composed operators are statistically
    independent even at the same seed. Without it, sampling the output
    of ``train_test_split`` at the same seed would be perfectly
    correlated (the test side occupies exactly the low buckets, so a
    5% sample of the train side returns zero rows), and
    ``assign_shards`` after ``hash_sample`` would concentrate the
    sample into the low shards."""
    return md5_mod(key, f"{domain}{seed}|", BUCKETS, hex_chars=8)


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: int = 0) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    ``hash_bucket(key) < rate * BUCKETS``.

    Narrow filter, no shuffle; the same (key, seed, rate) always makes
    the same decision, so incremental/resumed runs and the DuckDB
    oracle agree row-for-row. ``rate`` is truncated to 1e-6 resolution.
    """
    cutoff = int(rate * BUCKETS)
    return df.where(hash_bucket(F.col(key_col), seed, domain="samp:") < cutoff)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``s`` keeps rows at
    ``rates[s]`` (strata absent from ``rates`` keep at
    ``default_rate``; 0.0 drops them).

    The rate table is vocabulary-sized (languages, source domains), so
    it is inlined as a ``CASE``/literal-map expression — whole-stage
    codegen, no join, no shuffle, no broadcast round-trip. The keep
    decision itself is the same narrow hash filter as
    :func:`hash_sample`, so two strata never disagree about a shared
    key by accident (seed is shared).
    """
    cutoff = None
    for stratum, rate in sorted(rates.items()):
        c = int(rate * BUCKETS)
        cond = F.col(strata_col) == stratum
        cutoff = F.when(cond, c) if cutoff is None else cutoff.when(cond, c)
    cutoff = F.lit(int(default_rate * BUCKETS)) if cutoff is None else cutoff.otherwise(int(default_rate * BUCKETS))
    return df.where(hash_bucket(F.col(key_col), seed, domain="strat:") < cutoff)


def mixing_rates(
    counts: dict[str, int], targets: dict[str, float]
) -> dict[str, float]:
    """Downsample-only acceptance rates that reshape observed
    per-source ``counts`` into the ``targets`` mixture.

    The binding source (highest demand relative to supply) keeps rate
    1.0 and everything else downsamples around it — no row is ever
    duplicated (upsampling a training corpus silently re-weights
    near-duplicates; repeat-epoch logic belongs to the trainer, not
    the engine). Pure driver-side arithmetic over a vocabulary-sized
    dict.
    """
    total_w = sum(targets.values())
    if total_w <= 0:
        raise ValueError(f"targets must carry positive total weight, got {targets}")
    shares = {s: w / total_w for s, w in targets.items()}
    missing = [s for s, share in shares.items() if share > 0 and not counts.get(s)]
    if missing:
        # a demanded source with zero supply makes the mixture
        # infeasible — raising beats silently emptying a 100 TB mix
        raise ValueError(
            f"target sources absent from the input (typo?): {sorted(missing)}"
        )
    # Feasible output size: min over sources of count/share.
    limit = min(counts.get(s, 0) / share for s, share in shares.items() if share > 0)
    return {
        s: (min(1.0, (limit * share) / counts[s]) if counts.get(s) else 0.0)
        for s, share in shares.items()
    }


def mix_sources(
    df: DataFrame,
    source_col: str,
    targets: dict[str, float],
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Dataset mixing: filter ``df`` so the surviving rows match the
    ``targets`` proportions across ``source_col`` (sources not in
    ``targets`` are dropped).

    Two passes: (1) a per-source count — a partial-agg-friendly
    ``groupBy`` whose scan is pruned to the one source column, output
    vocabulary-sized; (2) one narrow stratified hash filter using the
    driver-computed rates. At 100 TB pass 1 is the cheap column-pruned
    scan and pass 2 is free inside whatever stage consumes the mix.
    Deterministic end to end: same input + seed → same mixture.
    """
    counts = {
        r[source_col]: r["cnt"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("cnt")).collect()
    }
    rates = mixing_rates(counts, targets)
    return stratified_sample(df, source_col, rates, key_col, seed=seed, default_rate=0.0)


def train_test_split(
    df: DataFrame, key_col: str, test_frac: float, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, provably disjoint and exhaustive split: test =
    buckets ``[0, test_frac*BUCKETS)``, train = the rest. Keyed on
    ``key_col`` so all rows sharing a key (e.g. chunks of one
    document) land on the same side — no train/test leakage through
    intra-document near-duplicates. Both sides are narrow filters over
    the same scan."""
    cutoff = int(test_frac * BUCKETS)
    b = hash_bucket(F.col(key_col), seed, domain="split:")
    return df.where(b >= cutoff), df.where(b < cutoff)


def assign_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Training-export shard assignment: ``shard = hash_bucket(key) %
    n_shards`` as a new column.

    Properties a 100 TB export needs: deterministic (re-runs and
    resumed runs assign identically — an interrupted export can skip
    completed shards), key-affine (all chunks of one document share a
    shard when keyed by document), and balanced by law of large
    numbers (hash buckets are uniform; expected shard-size spread at
    M rows over S shards is O(sqrt(M/S)), i.e. <1% at any realistic
    shard size). Writing ``partitionBy("shard")`` then gives one
    self-contained directory per shard with no extra shuffle beyond
    the write's own partitioning."""
    return df.withColumn(
        "shard",
        (hash_bucket(F.col(key_col), seed, domain="shard:") % n_shards).cast("int"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Domain balancing: keep at most ``cap`` rows per group, chosen
    deterministically (md5-hash order with ``key_col`` tie-break, so
    the survivors are a stable pseudo-random subset — NOT the first
    rows of whatever partition order the scan produced). The standard
    guard against single-domain dominance in a crawl mix.

    Partitioned window (never a global sort); the rank runs per group
    over hash-ordered rows. Skew note: a group with 10⁹ rows makes one
    reducer sort 10⁹ rows — pre-filter pathological groups with an
    aggregate count gate if that regime is expected.
    """
    order = md5_mod(F.col(key_col), f"cap:{seed}|", BUCKETS)
    w = (
        Window.partitionBy(group_col)
        .orderBy(order.asc(), F.col(key_col).asc())
    )
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap)
        .drop("_r")
    )


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n_target: int,
    key_col: str,
    seed: int = 0,
    n_buckets: int = 1024,
) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: draw
    ``n_target`` selections where each row's expected pick count is
    ``n_target · w / Σw`` — the sampler a data-mixing pipeline needs
    when "sample 1M documents proportional to token count" must be
    exact, deterministic, and identically reproducible by the SQL
    oracle (no RNG, no float: md5-derived offset, BIGINT cumulative
    weights, floor-divide interval counting).

    Classic systematic PPS on a deterministic pseudo-random order
    (md5(key), key — decorrelated from input order): exclusive prefix
    sums W_i over integer weights, step = Σw div n_target (≥1),
    offset = md5("pps:seed") mod step, selection points offset + j·step
    for j = 0..n_target−1; row i is picked once per point inside
    [W_i, W_i + w_i). Output keeps picked rows with an ``n_copies``
    count (a row with w > step can be picked multiple times — sampling
    WITH replacement in the heavy-weight regime, the standard PPS
    behavior). Σ n_copies = n_target exactly whenever Σw ≥ n_target;
    when Σw < n_target the integer step clamps to 1 and every weight
    unit is a selection point, yielding Σw picks (n_copies = w) — the
    rule cannot mint more distinct integer points than weight units. Zero-weight rows have empty intervals and are never
    picked; negative weights raise downstream-corruption guards at
    plan build.

    Scale shape — the global prefix sum WITHOUT a global sort: the
    order hash is bucketized into ``n_buckets`` fixed ranges
    (deterministic boundaries, not sampled like repartitionByRange),
    bucket subtotals form a vocabulary-sized table whose running
    offsets broadcast back, and the within-bucket cumsum is a window
    partitioned by bucket. Two partial-agg shuffles total; no
    SinglePartition window over the data (plan-gated in tests). The
    Σw total is one scalar aggregate (a single collected row, like
    the graph-algo normalization totals).
    """
    if n_target <= 0:
        raise ValueError(f"pps_systematic_sample: n_target must be > 0, got {n_target}")
    import hashlib

    w = F.col(weight_col).cast("long")
    # isNull() must be explicit: NULL < 0 is NULL, so a bare w < 0
    # filter would let NULL-weight rows slip past the corruption guard
    neg = df.filter(w.isNull() | (w < 0)).limit(1).count()
    if neg:
        raise ValueError(
            f"pps_systematic_sample: null/negative {weight_col} values — corrupt input"
        )
    total = df.agg(F.sum(F.when(w > 0, w).otherwise(F.lit(0)))).collect()[0][0] or 0
    if total == 0:
        return df.withColumn("n_copies", F.lit(0).cast("long")).limit(0)
    step = max(total // n_target, 1)
    offset = int(hashlib.md5(f"pps:{seed}".encode()).hexdigest()[:15], 16) % step

    ord_hash = md5_mod(F.col(key_col), f"ppsord:{seed}|", BUCKETS)
    bucket_width = max(BUCKETS // n_buckets, 1)
    rows = df.filter(w > 0).select(
        "*",
        ord_hash.alias("_ord"),
        (ord_hash / F.lit(bucket_width)).cast("long").alias("_b"),
    )
    bucket_tot = rows.groupBy("_b").agg(F.sum(w).alias("_bt"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "_b", F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy("_ord", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        rows.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_W",
            (F.col("_boff") + F.coalesce(F.sum(w).over(w_in), F.lit(0)))
            .cast("long"),
        )
    )

    # f(x) = selections strictly below x = max(0, (x-offset-1) div step + 1),
    # clamped to n_target; n_copies = f(W + w) - f(W). Pure BIGINT SQL.
    def _f(x_sql):
        return (
            f"least(CASE WHEN ({x_sql}) <= {offset}L THEN 0L "
            f"ELSE (({x_sql}) - {offset}L - 1L) div {step}L + 1L END, "
            f"{n_target}L)"
        )

    picked = cum.withColumn("_wl", w).withColumn(
        "n_copies",
        F.expr(f"{_f('_W + _wl')} - {_f('_W')}").cast("long"),
    ).filter(F.col("n_copies") > 0)
    return picked.drop("_ord", "_b", "_boff", "_W", "_wl")


def select_to_token_budget(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    budget: int,
    key_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Budget-capped corpus selection: keep the best-scoring documents
    whose cumulative token count fits ``budget`` — "give me the top
    quality slice that is exactly N tokens", the selection step between
    quality scoring and training export. Deterministic rule: documents
    ordered by (score desc, key asc); a document is kept iff the
    tokens of all strictly-better documents plus its own fit the
    budget (``W_excl + tokens ≤ budget`` — the straddling document is
    dropped, never truncated; truncation is the packer's job). Adds
    ``cum_tokens`` = the inclusive prefix at each kept row.

    Scale shape — the global prefix WITHOUT a global sort, same
    two-pass trick as :func:`pps_systematic_sample` but ordered by a
    VALUE (score) instead of a hash: scores bucketize into
    ``n_buckets`` fixed ranges (monotone in the sort order, computed
    from one min/max aggregate), bucket subtotals broadcast their
    running offsets back, and the within-bucket cumsum windows on the
    bucket key. Skewed score distributions skew bucket sizes but never
    correctness; all arithmetic BIGINT (negative token counts raise —
    corrupt input)."""
    if budget < 0:
        raise ValueError(f"select_to_token_budget: negative budget {budget}")
    t = F.col(tokens_col).cast("long")
    if df.filter(t < 0).limit(1).count():
        raise ValueError(
            f"select_to_token_budget: negative {tokens_col} values — corrupt input"
        )
    lo, hi = df.agg(
        F.min(F.col(score_col).cast("long")),
        F.max(F.col(score_col).cast("long")),
    ).collect()[0]
    if lo is None:
        return df.withColumn("cum_tokens", F.lit(0).cast("long")).limit(0)
    span = hi - lo + 1
    s = F.col(score_col).cast("long")
    rows = df.select(
        "*",
        F.expr(
            f"(({hi}L - cast({score_col} as long)) * {n_buckets}L) div {span}L"
        ).cast("long").alias("_b"),
    )
    bucket_tot = rows.groupBy("_b").agg(F.sum(t).alias("_bt"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "_b", F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy(s.desc(), key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = rows.join(F.broadcast(offsets), "_b").withColumn(
        "_W",
        (F.col("_boff") + F.coalesce(F.sum(t).over(w_in), F.lit(0))).cast("long"),
    )
    return (
        cum.filter(F.expr(f"_W + cast({tokens_col} as long) <= {budget}L"))
        .withColumn(
            "cum_tokens",
            F.expr(f"_W + cast({tokens_col} as long)").cast("long"),
        )
        .drop("_b", "_boff", "_W")
    )


def temperature_rates_ppm(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, int]:
    """Temperature-scaled mixing rates in integer parts-per-million —
    the multilingual/multi-domain rebalancing rule (sampling
    probability ∝ count^α, α < 1 flattens the head so tail domains
    survive; Conneau & Lample 2019 / mT5's exponential smoothing),
    downsample-only like :func:`mixing_rates`.

    All arithmetic is EXACT integer so any engine replays the
    decision chain bit-for-bit (the DuckDB oracle re-derives every
    rate from the raw counts — no exports):

        w_d      = isqrt(c_d)                 (α = 0.5, exact)
        q_d      = (c_d · 10^6) div w_d       (scaled demand c_d/w_d)
        L        = min_d q_d                  (the binding domain)
        rate_d   = min(10^6, (L · w_d) div c_d)

    The double floor quantizes the binding domain's rate to 999999 ppm
    occasionally — a deterministic 1e-6 undershoot, documented and
    accepted (the alternative, exact rationals, is not portable SQL).
    Overflow-safe while every count < 9·10^12 rows (L ≤ 10^6·√c_max so
    L·w_d ≤ 10^6·c_max < 2^63).

    α values other than 0.5 use float ``c**α`` floored to integer
    weights — fine driver-side, but only α = 0.5 is cross-engine
    exact; the oracle-backed path pins that one.
    """
    import math

    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    if any(c < 0 for c in counts.values()):
        raise ValueError(f"negative count in {counts}")
    pos = {d: int(c) for d, c in counts.items() if c > 0}
    if not pos:
        return {d: 0 for d in counts}
    if alpha == 0.5:
        w = {d: math.isqrt(c) for d, c in pos.items()}
    elif alpha == 1.0:
        w = dict(pos)
    else:
        w = {d: max(1, math.floor(c**alpha)) for d, c in pos.items()}
    limit = min((c * BUCKETS) // w[d] for d, c in pos.items())
    return {
        d: (min(BUCKETS, (limit * w[d]) // pos[d]) if d in pos else 0)
        for d in counts
    }


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    alpha: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based dataset mixing: keep rows so the surviving
    mixture's per-domain share is ∝ count^α (α = 1 preserves natural
    proportions; α → 0 approaches uniform), without ever upsampling.

    Same two-pass shape as :func:`mix_sources`: (1) vocabulary-sized
    per-domain count (column-pruned scan, partial agg); (2) one narrow
    md5-keyed filter with the driver-computed integer ppm cutoffs
    inlined as a CASE expression — whole-stage codegen, no join, no
    shuffle, decision deterministic under any partitioning. Hashes in
    its own domain ("tmix:") so composing with the other samplers at a
    shared seed stays statistically independent.
    """
    counts = {
        r[source_col]: r["cnt"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("cnt")).collect()
    }
    rates = temperature_rates_ppm(counts, alpha)
    cutoff = None
    for dom, ppm in sorted(rates.items()):
        cond = F.col(source_col) == dom
        cutoff = F.when(cond, ppm) if cutoff is None else cutoff.when(cond, ppm)
    cutoff = F.lit(0) if cutoff is None else cutoff.otherwise(F.lit(0))
    return df.where(
        hash_bucket(F.col(key_col), seed, domain="tmix:") < cutoff
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    seed: int = 0,
    checkpoint: bool = True,
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 2007): a weighted
    WITHOUT-replacement sample of exactly ``min(k, n)`` rows whose
    ``w_hat`` column is an unbiased subset-sum estimator — the sampler
    a pipeline needs when "keep the 10k most representative documents,
    weighted by tokens, and still estimate any stratum's total token
    mass from the sample alone" must hold. Complements
    :func:`pps_systematic_sample` (WITH-replacement expected counts).

    Priorities are integer-exact for cross-engine replay: each row
    draws ``u`` = md5-derived 32-bit int + 1 (so ``u ∈ [1, 2^32]``,
    never zero), and the DLT priority ``w/u`` is ranked via the
    inverted integer key ``qkey = max(1, (u·2^20) div w)`` — ascending
    qkey ⟺ descending priority, every compare a BIGINT compare, ties
    broken by key. ``u·2^20 ≤ 2^52`` keeps the product BIGINT-safe;
    the ``max(1, ·)`` clamp (reached only when ``w > u·2^20``) is part
    of the operator definition so both engines agree on ultra-heavy
    rows. The DLT threshold is the (k+1)-th smallest qkey τ_q, mapped
    back to weight units as ``tau_w = 2^52 div τ_q``, and the
    estimator is ``w_hat = max(w, tau_w)`` (``w_hat = w`` when the
    population has ≤ k rows — the sample is then exhaustive and
    exact). E[Σ_{i∈S, i∈A} w_hat_i] = Σ_{i∈A} w_i for any fixed subset
    A, per DLT Theorem 1.

    Scale shape: the per-row key is one md5 inside whole-stage codegen
    (narrow, no shuffle); the top-(k+1) cut is
    ``TakeOrderedAndProject`` — per-partition heaps of size k+1
    merged on one reducer, never a global sort; the only window runs
    over the k+1 survivors (bounded, not data-sized); the threshold
    row broadcasts back via a 1-row cross-join. Priority samples are
    MERGEABLE (union the (key, w, qkey) tables, re-cut top-k — qkeys
    are pure row functions, independent of which shard drew them), so
    per-partition / per-day samples fold into a corpus sample without
    rescanning; see :func:`priority_merge`.

    Reference repo has no sampling surface; this is a training-data
    addition (brief: sampling as a first-class component).
    """
    if k <= 0:
        raise ValueError(f"priority_sample: k must be > 0, got {k}")
    w = F.col(weight_col).cast("long")
    neg = df.filter(w.isNull() | (w < 0)).limit(1).count()
    if neg:
        raise ValueError(
            f"priority_sample: null/negative {weight_col} values — corrupt input"
        )
    u = (md5_mod(F.col(key_col), f"prio:{seed}|", 1 << 32, hex_chars=8) + 1)
    keyed = (
        df.filter(w > 0)
        .withColumn("_u", u.cast("long"))
        .withColumn(
            "qkey",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"(_u * 1048576L) div CAST({weight_col} AS BIGINT)"),
            ),
        )
        .drop("_u")
    )
    return _priority_cut(keyed, weight_col, k, key_col, checkpoint=checkpoint)


def _priority_cut(
    keyed: DataFrame, weight_col: str, k: int, key_col: str,
    checkpoint: bool = True,
) -> DataFrame:
    """Shared top-k + threshold + estimator tail of priority sampling:
    input already carries ``qkey``. Bounded state only — a (k+1)-row
    TakeOrdered, a window over those k+1 rows, a 1-row broadcast."""
    top = keyed.orderBy("qkey", key_col).limit(k + 1)
    rn = F.row_number().over(Window.orderBy("qkey", key_col))
    # localCheckpoint: ranked feeds BOTH the threshold row and the kept
    # rows; k+1 rows of state, and the TakeOrdered lineage runs once
    # (the build_triples two-consumer rule). checkpoint=False exists
    # only so plan gates can see the pre-cut TakeOrderedAndProject.
    ranked = top.withColumn("_rn", rn)
    if checkpoint:
        ranked = ranked.localCheckpoint(eager=True)
    tau = ranked.filter(F.col("_rn") == k + 1).select(
        F.expr("4503599627370496L div qkey").alias("_tau_w")
    )
    w = F.col(weight_col).cast("long")
    # Left join on TRUE, not crossJoin: when the population has ≤ k
    # rows there is no (k+1)-th qkey, tau is EMPTY, and a cross join
    # would wipe the sample; the left join keeps it with _tau_w NULL.
    out = ranked.filter(F.col("_rn") <= k).join(
        F.broadcast(tau), F.lit(True), "left"
    )
    return (
        out.withColumn(
            "w_hat", F.greatest(w, F.coalesce(F.col("_tau_w"), w)).cast("long")
        )
        .drop("_rn", "_tau_w")
    )


def priority_merge(
    parts: list[DataFrame], weight_col: str, k: int, key_col: str
) -> DataFrame:
    """Merge per-shard priority samples into the corpus-level sample:
    union the carried (key, weight, qkey) tables and re-cut the
    top-k + threshold. Because qkey is a pure function of (key,
    weight, seed) — independent of shard membership — the merged
    result is IDENTICAL to sampling the concatenated corpus directly
    whenever each shard kept min(k, shard rows) (DLT §4 mergeability;
    pinned in test_sampling_priority). This is the incremental path:
    sample each day's partition once, fold daily samples into the
    rolling corpus sample without rescanning history."""
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return _priority_cut(
        merged.drop("w_hat").dropDuplicates([key_col]), weight_col, k, key_col
    )
