"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exactness baseline: broadcast the
  (small) query set, one pass over the corpus, per-query top-k via
  window. Dot products are ``F.zip_with`` + ``F.aggregate`` — pure
  codegen, no UDF.
* LSH-bucketed variant (random signed hyperplanes, deterministic from
  md5 hashes) — the 100 TB path: bucket corpus once, probe only
  matching buckets, rerank candidates exactly.
* embedding cosine near-duplicates — self-join variant for dedup.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import planning



def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    # zero vectors: NULL, not a job-killing ANSI DIVIDE_BY_ZERO
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(None)).otherwise(dot(a, b) / d)


def _safe_norm(a: Column) -> Column:
    n = norm(a)
    return F.when(n == 0, F.lit(1.0)).otherwise(n)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: Optional[str] = None,
                     query_vec_col: Optional[str] = None,
                     include_self: bool = False) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine_sim).
    Queries are broadcast — corpus is scanned once, no shuffle before
    the per-query top-k (which AQE keeps small)."""
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    from . import planning
    # the scoring pass is pure per-row compute (|Q| cosines per corpus
    # row); a single-row-group corpus would otherwise score on ONE core
    corpus = planning.ensure_min_parallelism(corpus)
    q = queries.select(F.col(qid).alias("query_id"),
                       F.col(qvec).alias("__qv__"))
    joined = corpus.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("__cv__")) \
        .crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    sim = cosine(F.col("__qv__").cast("array<double>"),
                 F.col("__cv__").cast("array<double>"))
    scored = joined.withColumn("cosine_sim", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine_sim"))


def _plane_signs(tag: int, dim: int) -> List[float]:
    """±1 plane components sign(md5hash(tag#d) mod 2) — the SAME value
    the previous per-row expression ``pmod(hash64(concat('{tag}#', d),
    'md5'), 2)*2-1`` produced, but computed ONCE driver-side: the signs
    are data-independent, and Catalyst does not constant-fold through
    higher-order-function lambdas, so the expression form cost
    dim×planes md5 evaluations PER ROW. Oracle parity unchanged
    (__spark_entry__ computes the identical constants in Python)."""
    import hashlib
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{tag}#{d}".encode()).hexdigest()[:15], 16)
        out.append(float((h % 2) * 2 - 1))
    return out


def hyperplane_bits(vec: Column, dim: int, num_planes: int = 8,
                    family: str = "md5") -> Column:
    """Deterministic random-hyperplane signature: plane p has ±1
    components sign(md5hash(p#d) mod 2); bit p = (vec · plane_p) > 0.
    Plane signs are inlined as literals (:func:`_plane_signs`) — the
    per-row work is just the dot-product folds.

    Only ``family="md5"`` is supported (plane signs are md5-derived
    driver-side); any other value raises rather than silently
    returning md5 buckets."""
    if family != "md5":
        raise ValueError(
            f"hyperplane_bits: unsupported family {family!r}; plane "
            "signs are md5-derived (see _plane_signs)")
    acc = F.lit(0)
    for p in range(num_planes):
        comp = F.array(*[F.lit(s) for s in _plane_signs(p, dim)])
        proj = F.aggregate(F.zip_with(vec.cast("array<double>"), comp,
                                      lambda x, y: x * y),
                           F.lit(0.0), lambda a, v: a + v)
        acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, num_planes: int = 8,
             multiprobe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: candidates = corpus rows whose hyperplane
    bucket is within ``multiprobe_hamming`` bits of the query bucket,
    reranked by exact cosine. At scale the corpus bucketing is computed
    once and reused (write the bucketed table out)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv__"),
                      hyperplane_bits(F.col(vec_col), dim, num_planes)
                      .alias("__cb__"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv__"),
                       hyperplane_bits(F.col(vec_col), dim, num_planes)
                       .alias("__qb__"))
    cand = c.join(F.broadcast(q),
                  F.bit_count(F.col("__cb__").bitwiseXOR(F.col("__qb__")))
                  <= multiprobe_hamming)
    cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    sim = cosine(F.col("__qv__").cast("array<double>"),
                 F.col("__cv__").cast("array<double>"))
    scored = cand.withColumn("cosine_sim", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine_sim"))


def _centroid_array(centroids) -> Column:
    return F.array(*[F.array(*[F.lit(float(x)) for x in c])
                     for c in centroids])


def _unit(vec) -> List[float]:
    import math
    n = math.sqrt(sum(x * x for x in vec)) or 1.0
    return [x / n for x in vec]


def ivf_train(corpus: DataFrame, n_centroids: int = 16, iters: int = 3,
              sample_rows: int = 20000, id_col: str = "vec_id",
              vec_col: str = "embedding", seed: int = 7):
    """Spherical k-means coarse quantizer (IVF training), DataFrame-
    native: init = the ``n_centroids`` sample vectors with smallest
    xxhash64(id) (deterministic); each Lloyd iteration assigns the
    sample to its max-cosine centroid in ONE broadcast pass, then
    re-averages per (cluster, dimension) via posexplode+groupBy. Only
    the (n_centroids × dim) centroid table ever reaches the driver."""
    samp = (corpus.select(F.col(id_col).alias("id"),
                          F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.xxhash64(F.col("id"), F.lit(seed)))
            .limit(sample_rows))
    samp = samp.localCheckpoint(eager=False)  # sample once, reuse per iter
    init = samp.limit(n_centroids).collect()
    if not init:
        raise ValueError("ivf_train: empty corpus")
    n_centroids = min(n_centroids, len(init))  # tiny-corpus guard
    centroids = [_unit(list(r["v"])) for r in init]
    for _ in range(iters):
        cents = _centroid_array(centroids)
        sims = F.transform(cents,
                           lambda c: dot(F.col("v"), c)
                           / _safe_norm(F.col("v")))
        cluster = F.array_position(sims, F.array_max(sims)) - 1
        assigned = samp.select(F.col("v"), cluster.alias("__c__"))
        dims = (assigned.select("__c__", F.posexplode("v").alias("d", "x"))
                .groupBy("__c__", "d").agg(F.avg("x").alias("m"))
                .groupBy("__c__")
                .agg(F.transform(
                    F.sort_array(F.collect_list(F.struct("d", "m"))),
                    lambda s: s["m"]).alias("centroid"))
                .collect())
        new = {int(r["__c__"]): _unit(list(r["centroid"])) for r in dims}
        centroids = [new.get(i, centroids[i]) for i in range(n_centroids)]
    return centroids


def ivf_assign(corpus: DataFrame, centroids, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """One-pass corpus→centroid assignment:
    ``(neighbor_id, __cv__, __cl__)``. This is the expensive step of an
    IVF probe (a full corpus scan), so at scale compute it ONCE and
    persist it with :func:`ivf_write_assignment`."""
    cents = _centroid_array(centroids)

    def best_cluster(vec):
        sims = F.transform(cents, lambda c: dot(vec, c) / _safe_norm(vec))
        return F.array_position(sims, F.array_max(sims)) - 1

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("__cv__"))
    return c.withColumn("__cl__", best_cluster(F.col("__cv__")))


def ivf_write_assignment(corpus: DataFrame, centroids, path: str,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> None:
    """Materialize the IVF assignment PARTITIONED BY cluster id, so a
    probe over ``nprobe`` inverted lists becomes a partition-pruned
    scan reading ~``nprobe / n_centroids`` of the corpus — the layout
    that makes repeated ANN queries affordable at 100 TB."""
    ivf_assign(corpus, centroids, id_col, vec_col) \
        .write.mode("overwrite").partitionBy("__cl__").parquet(path)


def ivf_read_assignment(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ivf_topk(corpus: Optional[DataFrame], queries: DataFrame, centroids,
             k: int = 10, nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding",
             assignment: Optional[DataFrame] = None) -> DataFrame:
    """IVF approximate top-k: corpus rows are assigned to their
    max-cosine centroid in one pass (at scale: compute once with
    :func:`ivf_write_assignment` and pass the stored table as
    ``assignment`` — the per-query cost then drops to a partition-pruned
    read of the probed clusters); each query probes its ``nprobe``
    nearest inverted lists and reranks candidates exactly. Candidate
    volume ≈ corpus × nprobe / n_centroids — the knob that makes 100 TB
    ANN affordable."""
    if assignment is not None:
        c = assignment.select("neighbor_id",
                              F.col("__cv__").cast("array<double>")
                              .alias("__cv__"), "__cl__")
    else:
        if corpus is None:
            raise ValueError("ivf_topk needs a corpus or an assignment")
        c = ivf_assign(corpus, centroids, id_col, vec_col)
    cents = _centroid_array(centroids)

    qv = F.col(vec_col).cast("array<double>")
    sims = F.transform(cents, lambda cc: dot(qv, cc) / _safe_norm(qv))
    ranked = F.slice(
        F.reverse(F.array_sort(F.zip_with(
            sims, F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda s, i: F.struct(s.alias("s"), i.alias("i"))))),
        1, nprobe)
    q = queries.select(F.col(id_col).alias("query_id"),
                       qv.alias("__qv__"),
                       F.transform(ranked, lambda x: x["i"]).alias("__pr__"))
    q = q.select("query_id", "__qv__",
                 F.explode("__pr__").alias("__cl__"))
    cand = c.join(F.broadcast(q), "__cl__") \
        .filter(F.col("neighbor_id") != F.col("query_id"))
    sim = cosine(F.col("__qv__"), F.col("__cv__"))
    scored = cand.withColumn("cosine_sim", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine_sim"))


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64, num_planes=8,
                        max_bucket: Optional[int] = 1000,
                        exact: bool = False,
                        approx_count: Optional[int] = None) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold. ``exact=True`` does
    the O(n²) self-join (small corpora / verification); default buckets
    by hyperplane signature first (pairs in the same bucket only) —
    recall < 1, tune num_planes down for higher recall.

    Scale: the bucket key space is 2^num_planes (256 at the default);
    without a cap a clustered corpus piles into few buckets and the
    self-join degenerates quadratic. ``max_bucket`` drops buckets
    holding more rows than the cap before the join (same cap semantics
    as the dedup LSH family). ``num_planes="auto"`` sizes the key space
    from the corpus count so EXPECTED occupancy stays well under the
    cap (~max_bucket/4 per bucket for a uniform corpus), clamped to
    [8, 30] — the knob the cap then only has to enforce on skew.

    The "auto" corpus count comes from ``approx_count`` when given,
    else from plan statistics (file sizes ÷ row width — no job, no
    scan; embeddings are fixed-width so the estimate is tight), else a
    bounded LIMIT probe capped at 4M rows.  A log₂-scale knob tolerates
    a few× count error; at 100 TB pass ``approx_count`` explicitly."""
    base = df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("v"))
    if not exact:
        if num_planes == "auto":
            import math
            n = approx_count
            if n is None:
                n = planning.estimate_row_count(df)
            if n is None:
                n = df.limit(4_000_000).count()
            occupancy = max((max_bucket or 1000) // 4, 1)
            num_planes = min(30, max(8, math.ceil(
                math.log2(max(n, 1) / occupancy)) if n > occupancy else 8))
        base = base.withColumn(
            "bucket", hyperplane_bits(F.col("v"), dim, num_planes))
        if max_bucket:
            # capped: one shuffle (group + in-array expansion) instead
            # of [cap groupBy + anti-join + self-join exchanges]
            from .dedup import _group_pairs
            pairs = _group_pairs(base, ["bucket"], max_bucket)
        else:
            a, b = base.alias("a"), base.alias("b")
            pairs = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                           & (F.col("a.doc") < F.col("b.doc")))
    else:
        a, b = base.alias("a"), base.alias("b")
        pairs = a.join(b, F.col("a.doc") < F.col("b.doc"))
    sim = cosine(F.col("a.v").cast("array<double>"),
                 F.col("b.v").cast("array<double>"))
    return (pairs.select(F.col("a.doc").alias("id_a"),
                         F.col("b.doc").alias("id_b"),
                         sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold))


def random_projection(vec: Column, dim: int, out_dim: int = 16) -> Column:
    """Johnson–Lindenstrauss sign random projection (Achlioptas 2003,
    public): ``y_j = (Σ_i x_i · r_ij) / sqrt(out_dim)`` with
    ``r_ij ∈ {−1, +1}`` from the shared md5-derived plane table
    (:func:`_plane_signs` — same construction as
    :func:`hyperplane_bits`, inlined driver-side so the SQL twin can
    inline identical constants and rows pay only the fold). Distance-
    preserving dimensionality reduction for embedding columns: project
    once, then run any of the ANN paths on the cheaper ``out_dim``
    vectors. Pure expressions, no shuffle."""
    scale = 1.0 / (out_dim ** 0.5)
    outs = []
    for j in range(out_dim):
        comp = F.array(*[F.lit(s) for s in _plane_signs(j, dim)])
        proj = F.aggregate(F.zip_with(vec.cast("array<double>"), comp,
                                      lambda x, y: x * y),
                           F.lit(0.0), lambda a, v: a + v)
        outs.append(proj * F.lit(scale))
    return F.array(*outs)


def pca_fit(df: DataFrame, vec_col: str = "embedding", dim: int = 64,
            out_dim: int = 8, center: bool = True) -> dict:
    """Distributed PCA fit over an ``array<float>`` column — the
    whitening / dimensionality-reduction step of embedding-dedup
    pipelines (SemDeDup-style, Abbas et al. 2023 — public method).

    Plan shape at 100 TB: ONE Arrow-batched ``mapInPandas`` pass emits
    ONE partial-moment row per PARTITION (``(n, Σx, ΣxᵀX)`` — a
    d²+d+1 double vector, accumulated across the partition's batches
    in numpy), then a single Spark-side element-wise reduction
    (posexplode + groupBy position) combines partitions to ONE row, so
    the driver receives d²+d+1 doubles regardless of corpus size or
    partition count; the (d×d) eigendecomposition runs in numpy on the
    driver (d is the embedding width, never the corpus).

    Returns ``{"mean": [d], "components": [[d] × out_dim],
    "explained_variance": [out_dim], "n": int}``. Component sign is
    canonicalized (largest-|coefficient| entry positive) so refits are
    reproducible.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField
    from pyspark.sql.types import LongType, StructType

    d = int(dim)
    out_schema = StructType([
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("xtx", ArrayType(DoubleType())),
    ])

    # pilot shift (centered fit only): moments of raw x suffer
    # catastrophic cancellation in xtx - n·μμᵀ when ||μ|| ≫ the spread
    # (common for un-normalized encoder outputs) — accumulate moments
    # of (x - pilot) instead, with ONE global pilot vector (a single
    # LIMIT-1 job) so partitions stay summable; covariance around the
    # pilot is numerically benign and μ = pilot + Σ(x-pilot)/n exactly
    pilot = np.zeros(d)
    if center:
        row = (df.select(F.col(vec_col).alias("v"))
               .filter(F.size("v") == d).limit(1).collect())
        if row and row[0]["v"] is not None:
            pilot = np.asarray(row[0]["v"], dtype="float64")
    pilot_list = pilot.tolist()

    def partials(batches):
        # ONE row per partition: accumulate across the iterator so the
        # later reduction sees O(partitions) rows, not O(batches)
        shift = np.asarray(pilot_list)
        n_acc, s_acc, xtx_acc = 0, np.zeros(d), np.zeros((d, d))
        for pdf in batches:
            arrs = [np.asarray(v, dtype="float64")
                    for v in pdf[vec_col] if v is not None and len(v) == d]
            if not arrs:
                continue
            x = np.stack(arrs) - shift
            n_acc += x.shape[0]
            s_acc += x.sum(axis=0)
            xtx_acc += x.T @ x
        if n_acc:
            yield pd.DataFrame({"n": [n_acc], "s": [s_acc.tolist()],
                                "xtx": [xtx_acc.ravel().tolist()]})

    part = df.select(vec_col).mapInPandas(partials, out_schema)
    # Spark-side tree combine in ONE job: flatten each partial —
    # [n, Σx…, ΣxᵀX…] — to (pos, value) rows and sum by position; the
    # driver receives exactly d²+d+1 doubles however many partitions
    # the corpus has
    flat = part.select(F.posexplode(
        F.concat(F.array(F.col("n").cast("double")), "s", "xtx"))
        .alias("pos", "val"))
    combined = (flat.groupBy("pos").agg(F.sum("val").alias("val"))
                .orderBy("pos").collect())
    if not combined:
        raise ValueError(f"pca_fit: no rows with a length-{d} {vec_col!r}")
    vals = np.asarray([r["val"] for r in combined])
    n = int(vals[0])
    s = vals[1:d + 1]                  # Σ(x - pilot)
    xtx = vals[d + 1:].reshape(d, d)   # Σ(x - pilot)(x - pilot)ᵀ
    if center:
        mu_shift = s / n
        cov = (xtx - n * np.outer(mu_shift, mu_shift)) / max(n - 1, 1)
        mu = pilot + mu_shift
    else:
        cov = xtx / max(n - 1, 1)      # pilot is zero in this branch
        mu = np.zeros(d)
    w, v = np.linalg.eigh(cov)                  # ascending eigenvalues
    order = np.argsort(w)[::-1][:int(out_dim)]
    comps = []
    for j in order:
        c = v[:, j]
        if c[int(np.argmax(np.abs(c)))] < 0:    # deterministic sign
            c = -c
        comps.append(c.tolist())
    return {"mean": mu.tolist(), "components": comps,
            "explained_variance": [float(w[j]) for j in order], "n": int(n)}


def pca_project(vec: Column, model: dict) -> Column:
    """Project an embedding column with a :func:`pca_fit` model —
    components and mean inlined as literals, the per-dim dot product a
    JVM-side fold (same zero-shuffle shape as
    :func:`random_projection`)."""
    mean = model["mean"]
    centered = F.zip_with(vec.cast("array<double>"),
                          F.array(*[F.lit(float(m)) for m in mean]),
                          lambda x, m: x - m)
    outs = []
    for comp in model["components"]:
        c = F.array(*[F.lit(float(x)) for x in comp])
        outs.append(F.aggregate(F.zip_with(centered, c,
                                           lambda x, y: x * y),
                                F.lit(0.0), lambda a, v: a + v))
    return F.array(*outs)


def semantic_dedup(df: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: int = 64, pca_dim: Optional[int] = None,
                   n_clusters="auto", max_cluster: int = 10000,
                   keep_by: Optional[str] = None,
                   checkpoint_dir: Optional[str] = None,
                   approx_count: Optional[int] = None,
                   keep_pairs: bool = False):
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    public method): optional PCA reduction → spherical k-means
    clustering (:func:`ivf_train`) → WITHIN-cluster cosine pairing →
    connected components → one survivor per semantic cluster
    (min id, or the best ``keep_by`` score — see
    :func:`~nvtabular_spark.functions.dedup.drop_near_duplicates`).

    ``n_clusters="auto"`` (default) sizes the clustering to the corpus
    so expected occupancy stays well under ``max_cluster`` — essential,
    because an over-cap k-means cluster is DROPPED from pair
    generation (the occupancy-cap contract shared with every pair
    generator here), and with a fixed small ``n_clusters`` a large
    corpus would silently no-op. Dropped over-cap clusters raise a
    ``ResourceWarning`` naming the count, never pass silently. The
    auto count uses ``approx_count`` when given, else plan statistics,
    else a bounded LIMIT probe.

    Composition of already-scaled parts: the PCA fit ships d²-sized
    partials, clustering is the IVF trainer (sampled k-means, one
    assignment pass over the lazily-checkpointed projected vectors —
    projected ONCE, not once per consumer), pair generation is
    per-cluster capped, and the survivor anti-join ships only ids.
    Returns the surviving rows of ``df``; with ``keep_pairs=True``
    returns ``(survivors, pairs)`` for auditing.

    Note the semantics: near-duplicate PAIRS require cosine ≥
    ``threshold`` in the (possibly PCA-reduced) embedding space, and
    candidate pairs are only generated within a k-means cluster —
    recall < 1 at cluster boundaries, the same trade the published
    pipeline makes (it also searches within clusters only).
    """
    from .dedup import _group_pairs, drop_near_duplicates
    work = df.select(F.col(id_col).alias("doc"),
                     F.col(vec_col).alias("v"))
    if pca_dim:
        model = pca_fit(df, vec_col, dim=dim, out_dim=pca_dim)
        work = work.withColumn("v", pca_project(F.col("v"), model))
        # two consumers below (trainer sample scan + assignment pass):
        # without the checkpoint each would re-run the projection fold
        # over the whole corpus
        work = work.localCheckpoint(eager=False)
    if n_clusters == "auto":
        import math
        n = approx_count
        if n is None:
            n = planning.estimate_row_count(df)
        if n is None:
            n = df.limit(4_000_000).count()
        occupancy = max(max_cluster // 4, 1)
        n_clusters = max(16, math.ceil(max(n, 1) / occupancy))
    cents = ivf_train(work, n_centroids=int(n_clusters),
                      id_col="doc", vec_col="v")
    assigned = ivf_assign(work, cents, id_col="doc", vec_col="v") \
        .select(F.col("neighbor_id").alias("doc"),
                F.col("__cv__").alias("v"),
                F.col("__cl__").alias("bucket"))
    pairs = _group_pairs(assigned, ["bucket"], max_cluster)
    sim = cosine(F.col("a.v").cast("array<double>"),
                 F.col("b.v").cast("array<double>"))
    dup_pairs = (pairs.select(F.col("a.doc").alias("id_a"),
                              F.col("b.doc").alias("id_b"),
                              sim.alias("cosine_sim"))
                 .filter(F.col("cosine_sim") >= F.lit(float(threshold))))
    # loud, not silent: an over-cap cluster contributes NO pairs
    dropped = (assigned.groupBy("bucket").count()
               .filter(F.col("count") > max_cluster).count())
    if dropped:
        import warnings
        warnings.warn(
            f"semantic_dedup: {dropped} cluster(s) exceed "
            f"max_cluster={max_cluster} and were excluded from pair "
            "generation — raise n_clusters (or max_cluster) to cover "
            "them", ResourceWarning)
    survivors = drop_near_duplicates(df, dup_pairs, id_col=id_col,
                                     checkpoint_dir=checkpoint_dir,
                                     keep_by=keep_by)
    return (survivors, dup_pairs) if keep_pairs else survivors
