"""Distribution drift between two dataset snapshots — the data-quality
gate a production feature pipeline runs before retraining: "did this
week's feature distribution move away from the training snapshot?".

Not in the reference (its closest analog is the data_gen
``DatasetGen`` KS verification, data_gen.py:441-466, which tests one
dataset against a THEORETICAL distribution); this compares two
OBSERVED snapshots — Population Stability Index (the credit-scoring
standard) and Jensen-Shannon divergence — over a shared,
reference-anchored binning.

Scale shape (the 100 TB case is "this week" = tens of TB vs a fixed
training snapshot): the reference scan is ONE min/max aggregate; each
snapshot then pays ONE map-side-partial groupBy on a computed bin id
(codegen arithmetic, no UDF); the two ≤``bins``-row histograms
broadcast-join onto a dense ``bins``-row grid. Nothing quadratic,
nothing driver-side except the two scalar edges, and the snapshot
scans read only ``col`` (column-pruned).

Determinism: bin edges come from the REFERENCE snapshot only, so the
current snapshot's values never move the grid (a drifted max would
otherwise silently re-bin the reference); probabilities use Laplace
(add-``alpha``) smoothing so empty bins are defined without ad-hoc
epsilon clamps, and the whole computation is exact arithmetic — no
sampling, no sketches — hence reproducible across engines (the oracle
runs the identical formula in SQL).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _clean(col: str):
    c = F.col(col).cast("double")
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)  # NaN ≡ missing


def _bin_id(col, lo: float, width: float, bins: int):
    """Fixed-width bin index in [0, bins-1]; values at/above the
    reference max clamp into the last bin, below the min into bin 0 —
    the conventional PSI treatment of out-of-range drift (it must
    COUNT as mass in an edge bin, not vanish)."""
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))


def psi(ref: DataFrame, cur: DataFrame, col: str, bins: int = 10,
        alpha: float = 0.5,
        edges: Optional[Tuple[float, float]] = None) -> DataFrame:
    """Per-bin drift table over ``bins`` fixed-width bins anchored to
    the REFERENCE snapshot's [min, max] (or explicit ``edges``): one
    row per bin id in [0, bins), columns ``bin, n_ref, n_cur, p_ref,
    p_cur, psi_contrib, js_contrib``. NULL/NaN values are excluded
    from both snapshots.

    With Laplace-smoothed ``p_b = (n_b + alpha) / (N + alpha*bins)``::

        psi_contrib = (p_cur - p_ref) * ln(p_cur / p_ref)
        js_contrib  = (p_ref*ln(p_ref/m) + p_cur*ln(p_cur/m)) / 2,
                      m = (p_ref + p_cur) / 2

    ``df.agg(F.sum("psi_contrib"))`` is the PSI (rule of thumb: <0.1
    stable, 0.1-0.25 moderate, >0.25 action); same for the JS
    divergence, in nats, bounded by ln 2. The dense grid keeps the
    smoothing denominators exact and the output shape fixed
    (``bins`` rows at any data scale).
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero-count bins would "
                         "make ln(p/q) undefined)")
    if edges is None:
        row = ref.select(F.min(_clean(col)).alias("lo"),
                         F.max(_clean(col)).alias("hi")).collect()[0]
        if row["lo"] is None:
            raise ValueError(f"reference snapshot has no non-null "
                             f"values in {col!r}")
        lo, hi = float(row["lo"]), float(row["hi"])
    else:
        lo, hi = float(edges[0]), float(edges[1])
        if hi <= lo:
            raise ValueError(
                f"edges must satisfy lo < hi, got ({lo}, {hi}) — a "
                f"reversed range would silently garbage the bin "
                f"assignments")
    width = ((hi - lo) / bins) or 1.0    # constant column → one bin

    def counts(df: DataFrame, name: str) -> DataFrame:
        # filter nulls BEFORE binning: Spark's greatest/least skip
        # nulls, so _bin_id would otherwise clamp a NULL into bin 0
        return (df.select(_clean(col).alias("__v__"))
                .where(F.col("__v__").isNotNull())
                .select(_bin_id(F.col("__v__"), lo, width, bins)
                        .alias("bin"))
                .groupBy("bin").agg(F.count("*").alias(name)))

    grid = ref.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin"))
    dense = (grid.join(F.broadcast(counts(ref, "n_ref")), "bin", "left")
                 .join(F.broadcast(counts(cur, "n_cur")), "bin", "left")
                 .na.fill({"n_ref": 0, "n_cur": 0}))
    # totals via an unpartitioned window over the bins-row table —
    # trivially single-partition at this size, avoids a second scan
    w = Window.partitionBy()
    a, ab = F.lit(float(alpha)), F.lit(float(alpha * bins))
    p_r = (F.col("n_ref") + a) / (F.sum("n_ref").over(w) + ab)
    p_c = (F.col("n_cur") + a) / (F.sum("n_cur").over(w) + ab)
    m = (p_r + p_c) / 2
    return dense.select(
        "bin", "n_ref", "n_cur",
        p_r.alias("p_ref"), p_c.alias("p_cur"),
        ((p_c - p_r) * F.log(p_c / p_r)).alias("psi_contrib"),
        ((p_r * F.log(p_r / m) + p_c * F.log(p_c / m)) / 2)
        .alias("js_contrib"))


def drift_summary(ref: DataFrame, cur: DataFrame, col: str,
                  bins: int = 10, alpha: float = 0.5,
                  edges: Optional[Tuple[float, float]] = None
                  ) -> DataFrame:
    """One-row rollup of :func:`psi`: ``psi, js_divergence, n_ref,
    n_cur`` — the form a retraining gate thresholds on."""
    t = psi(ref, cur, col, bins=bins, alpha=alpha, edges=edges)
    return t.agg(F.sum("psi_contrib").alias("psi"),
                 F.sum("js_contrib").alias("js_divergence"),
                 F.sum("n_ref").alias("n_ref"),
                 F.sum("n_cur").alias("n_cur"))


def psi_categorical(ref: DataFrame, cur: DataFrame, col: str,
                    top_k: int = 100, alpha: float = 0.5,
                    other: str = "__other__") -> DataFrame:
    """Categorical drift table: per-category ``category, n_ref, n_cur,
    p_ref, p_cur, psi_contrib, js_contrib`` over the reference
    snapshot's ``top_k`` most frequent categories plus one ``other``
    bucket absorbing everything else (on BOTH sides — a category that
    exploded into the current snapshot but wasn't top-k in the
    reference shows up as ``other`` drift, which is exactly the signal
    a vocabulary-shift gate needs). NULLs are excluded, matching
    :func:`psi`.

    Scale shape: one groupBy per snapshot on the RAW column (map-side
    partial → ≤cardinality rows), then every later step operates on
    histograms, never rows: the top-k cut is a distributed
    TakeOrdered (orderBy freq desc, category asc, LIMIT k — no
    single-partition window), the bucketing is a broadcast left join
    of histogram onto the k-row top table, and the final table is
    ≤k+1 rows. Ties at the top-k boundary break lexicographically, so
    the bucket set is deterministic across engines.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    if alpha <= 0:
        raise ValueError("alpha must be > 0")

    def hist(df: DataFrame) -> DataFrame:
        c = F.col(col).cast("string")
        return (df.select(c.alias("category"))
                .where(F.col("category").isNotNull())
                .groupBy("category").agg(F.count("*").alias("n")))

    h_ref, h_cur = hist(ref), hist(cur)
    top = (h_ref.orderBy(F.desc("n"), F.asc("category")).limit(top_k)
           .select(F.col("category").alias("__top__")))

    def bucket(h: DataFrame, name: str) -> DataFrame:
        b = h.join(F.broadcast(top),
                   h["category"] == F.col("__top__"), "left")
        return (b.select(F.coalesce(F.col("__top__"), F.lit(other))
                         .alias("category"), "n")
                .groupBy("category").agg(F.sum("n").alias(name)))

    # dense bucket grid: top-k categories + other, so Laplace
    # denominators are exact even for buckets absent from one side
    grid = top.select(F.col("__top__").alias("category")).union(
        top.sparkSession.createDataFrame([(other,)], "category string"))
    dense = (grid.join(F.broadcast(bucket(h_ref, "n_ref")),
                       "category", "left")
                 .join(F.broadcast(bucket(h_cur, "n_cur")),
                       "category", "left")
                 .na.fill({"n_ref": 0, "n_cur": 0}))
    w = Window.partitionBy()
    nb = F.count("*").over(w)             # actual bucket count (≤ k+1)
    a = F.lit(float(alpha))
    p_r = (F.col("n_ref") + a) / (F.sum("n_ref").over(w) + a * nb)
    p_c = (F.col("n_cur") + a) / (F.sum("n_cur").over(w) + a * nb)
    m = (p_r + p_c) / 2
    return dense.select(
        "category", "n_ref", "n_cur",
        p_r.alias("p_ref"), p_c.alias("p_cur"),
        ((p_c - p_r) * F.log(p_c / p_r)).alias("psi_contrib"),
        ((p_r * F.log(p_r / m) + p_c * F.log(p_c / m)) / 2)
        .alias("js_contrib"))


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Feature-selection association score: one-row DataFrame ``mi,
    h_x, h_y, nmi, n`` — the plug-in (MLE) mutual information between
    two categorical columns in nats, their marginal entropies, and the
    sqrt-normalized NMI ``mi / sqrt(h_x * h_y)`` (0 when either
    marginal is constant). Rows with a NULL on either side are
    excluded — a NULL category pairs with nothing.

    Scale shape: ONE map-side-partial groupBy builds the contingency
    table (≤ |X|·|Y| cells — categorical cardinalities, not row
    count); every later step (marginals, entropies, the MI fold) runs
    over that table with broadcast joins. The raw rows are scanned
    exactly once reading exactly two columns. MLE needs no smoothing:
    unobserved cells carry zero mass and contribute exactly zero.
    """
    x = F.col(x_col).cast("string").alias("x")
    y = F.col(y_col).cast("string").alias("y")
    cont = (df.select(x, y)
            .where(F.col("x").isNotNull() & F.col("y").isNotNull())
            .groupBy("x", "y").agg(F.count("*").alias("nxy")))
    tot = cont.agg(F.sum("nxy").cast("double").alias("n"))
    mx = cont.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = cont.groupBy("y").agg(F.sum("nxy").alias("ny"))
    j = (cont.join(F.broadcast(mx), "x")
             .join(F.broadcast(my), "y")
             .crossJoin(F.broadcast(tot)))
    mi = j.agg(F.sum((F.col("nxy") / F.col("n"))
                     * F.log(F.col("nxy") * F.col("n")
                             / (F.col("nx") * F.col("ny"))))
               .alias("mi"))
    hx = (mx.crossJoin(F.broadcast(tot))
          .agg((-F.sum((F.col("nx") / F.col("n"))
                       * F.log(F.col("nx") / F.col("n")))).alias("h_x")))
    hy = (my.crossJoin(F.broadcast(tot))
          .agg((-F.sum((F.col("ny") / F.col("n"))
                       * F.log(F.col("ny") / F.col("n")))).alias("h_y")))
    out = mi.crossJoin(hx).crossJoin(hy).crossJoin(tot)
    nmi = F.when((F.col("h_x") > 0) & (F.col("h_y") > 0),
                 F.col("mi") / F.sqrt(F.col("h_x") * F.col("h_y"))) \
        .otherwise(F.lit(0.0))
    return out.select("mi", "h_x", "h_y", nmi.alias("nmi"),
                      F.col("n").cast("long").alias("n"))


def correlation_matrix(df: DataFrame, cols) -> DataFrame:
    """Pairwise Pearson correlations of the given numeric columns as a
    long-form DataFrame ``(col_x, col_y, corr)`` — one row per
    unordered pair, lexicographic order, diagonal omitted. The
    feature-redundancy screen run before training.

    Scale shape: ALL k·(k-1)/2 correlations come from ONE ``df.agg``
    pass (Spark's streaming Pearson aggregate, whole-stage codegen) —
    a single scan reading exactly ``cols``, one 1-row result reshaped
    to long form with ``stack``; no join, no second pass, no driver
    arithmetic. NaN targets are nulled first so a stray NaN poisons
    nothing (pairs with a NULL on either side are skipped by ``corr``
    on both Spark and the SQL oracle twin).
    """
    cols = sorted(cols)
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]

    def clean(c: str):
        col = F.col(c).cast("double")
        return F.when(F.isnan(col), F.lit(None)).otherwise(col)

    aggs = [F.corr(clean(a), clean(b)).alias(f"__c{i}__")
            for i, (a, b) in enumerate(pairs)]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', __c{i}__" for i, (a, b) in enumerate(pairs))
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_x, col_y, corr)")


_NUMERIC = ("int", "bigint", "smallint", "tinyint", "float", "double",
            "decimal")


def schema_drift(ref: DataFrame, cur: DataFrame, cols=None) -> DataFrame:
    """Column-level profile drift between two snapshots: one row per
    shared column — ``null_frac_ref/cur`` and, for numeric columns,
    ``mean/std`` on both sides plus the Welch standardized mean shift
    ``z_mean = (mean_cur - mean_ref) / sqrt(std_ref²/n_ref +
    std_cur²/n_cur)`` (NULL for non-numeric columns or degenerate
    denominators). The cheap always-on companion to :func:`psi`: run
    this over EVERY column each ingest, escalate to the binned PSI
    gate only where it flags.

    Scale shape: ONE ``df.agg`` pass per snapshot computes every
    column's count/mean/std together (whole-stage codegen, single
    scan); the two 1-row results assemble driver-side into the
    ≤#columns-row report. NaNs are nulled first, so null_frac counts
    them as missing and moments never poison.
    """
    import math
    shared = [c for c in (cols or ref.columns) if c in cur.columns]
    if not shared:
        raise ValueError("no shared columns to compare")
    types = {f.name: f.dataType.simpleString() for f in ref.schema.fields}
    types_cur = {f.name: f.dataType.simpleString()
                 for f in cur.schema.fields}
    # numeric-ness is decided PER SIDE: a column whose type drifted to
    # non-numeric in the current snapshot (the exact condition this
    # function exists to surface) must not be cast by the reference's
    # type — under ANSI that job errors, otherwise failed casts would
    # silently count as nulls. Moments are computed only where BOTH
    # sides are numeric; the dtype column reports the mismatch.
    num_ref = {c for c in shared if types.get(c, "").startswith(_NUMERIC)}
    num_cur = {c for c in shared
               if types_cur.get(c, "").startswith(_NUMERIC)}
    numeric = num_ref & num_cur

    def profile(df, num_side):
        aggs = [F.count(F.lit(1)).alias("__rows__")]
        for c in shared:
            cc = F.col(c)
            if c in num_side:
                cc = cc.cast("double")
                cc = F.when(F.isnan(cc), F.lit(None)).otherwise(cc)
            aggs.append(F.count(cc).alias(f"n_{c}"))
            if c in numeric:
                aggs += [F.avg(cc).alias(f"m_{c}"),
                         F.stddev_samp(cc).alias(f"s_{c}")]
        return df.agg(*aggs).collect()[0]

    a, b = profile(ref, num_ref), profile(cur, num_cur)
    rows = []
    for c in shared:
        nr, nc = a[f"n_{c}"], b[f"n_{c}"]
        nfr = 1.0 - nr / a["__rows__"] if a["__rows__"] else None
        nfc = 1.0 - nc / b["__rows__"] if b["__rows__"] else None
        mr = ms = cr = cs = z = None
        if c in numeric:
            mr, cr = a[f"m_{c}"], a[f"s_{c}"]
            ms, cs = b[f"m_{c}"], b[f"s_{c}"]
            if None not in (mr, ms, cr, cs) and nr > 1 and nc > 1:
                den = math.sqrt(cr * cr / nr + cs * cs / nc)
                z = (ms - mr) / den if den > 0 else None
        dtype = types.get(c)
        if types_cur.get(c) != types.get(c):
            dtype = f"{types.get(c)}!={types_cur.get(c)}"
        rows.append((c, dtype, nfr, nfc, mr, ms, cr, cs, z))
    return ref.sparkSession.createDataFrame(
        rows, "column string, dtype string, null_frac_ref double, "
              "null_frac_cur double, mean_ref double, mean_cur double, "
              "std_ref double, std_cur double, z_mean double")
