"""Dataset I/O helpers + deterministic synthetic generators.

Reference parity:
* ``Dataset(paths, engine, part_size)`` → ``read_dataset`` (parquet/csv;
  Iceberg catalogs via ``spark.table`` when configured); partition
  sizing maps to ``spark.sql.files.maxPartitionBytes``
  (tests/conftest.py:226-242, troubleshooting.md:143-151).
* ``Dataset.to_parquet(shuffle, out_files_per_proc)`` →
  ``write_shuffled`` (bench/examples/MultiGPUBench.md:77-89).
* ``Dataset.shuffle_by_keys`` → ``df.repartition(*keys)``.
* ``tools/data_gen.DatasetGen`` → ``tokenized_sequences`` (the
  north-rule table: doc_id, tokens:array<int32>, n_tok, source, plus
  entity/ts/label columns per FIXTURES.md F1) — fully deterministic,
  generated JVM-side from ``spark.range`` + hash columns (no Python
  row loop, scales to any row count).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Dataset:
    """API-parity wrapper for the reference ``nvtabular.Dataset``
    (re-export of merlin.io.Dataset; usage tests/conftest.py:226-242):
    a lazy, partitioned table handle. Thin by design — the engine works
    directly on DataFrames; this class exists so reference user code
    ports 1:1."""

    def __init__(self, data, engine: str = "parquet",
                 part_size_mb: Optional[int] = None,
                 spark: Optional[SparkSession] = None, **options):
        if isinstance(data, DataFrame):
            self.df = data
        else:
            spark = spark or SparkSession.getActiveSession()
            if spark is None:
                raise ValueError("Dataset(paths) needs an active SparkSession")
            self.df = read_dataset(spark, data, engine=engine,
                                   part_size_mb=part_size_mb, **options)

    # reference surface -----------------------------------------------------
    def to_ddf(self, columns=None) -> DataFrame:
        return self.df.select(*columns) if columns else self.df

    def compute(self):
        return self.df.toPandas()

    #: pandas-frame alias so Dataset and DataFrame results interchange
    toPandas = compute

    def to_parquet(self, output_path: str, shuffle: Optional[str] = "per_partition",
                   out_files_per_proc: Optional[int] = None,
                   partition_on: Optional[List[str]] = None, **kw) -> None:
        write_shuffled(self.df, output_path, shuffle=shuffle or "none",
                       out_files=out_files_per_proc,
                       partition_on=partition_on, **kw)

    def shuffle_by_keys(self, keys, npartitions: Optional[int] = None) -> "Dataset":
        return Dataset(shuffle_by_keys(self.df, list(keys), npartitions))

    @property
    def schema(self):
        """Sidecar Schema, CACHED so reference-style in-place tagging
        (``dataset.schema.column_schemas[n] = ...with_tags(...)``,
        reference tests/unit/workflow/test_workflow.py:79-84) persists
        and is visible to ``Workflow.fit(dataset)``."""
        if getattr(self, "_schema", None) is None:
            from ..plans.schema import Schema
            self._schema = Schema.from_spark(self.df.schema)
        return self._schema

    def __repr__(self):
        return f"Dataset({self.df})"


def read_dataset(spark: SparkSession, paths, engine: str = "parquet",
                 part_size_mb: Optional[int] = None, **options) -> DataFrame:
    if part_size_mb:
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       f"{part_size_mb}m")
    if isinstance(paths, str):
        paths = [paths]
    if engine == "parquet":
        return spark.read.options(**options).parquet(*paths)
    if engine == "csv":
        return spark.read.options(header="true", inferSchema="true",
                                  **options).csv(paths)
    if engine == "json":
        return spark.read.options(**options).json(paths)
    if engine == "orc":
        return spark.read.options(**options).orc(*paths)
    if engine == "avro":
        # needs the spark-avro package on the classpath (external, like
        # the reference's avro engine needs uavro); absence surfaces as
        # AnalysisException FAILED_TO_FIND_DATA_SOURCE at read time
        return spark.read.options(**options).format("avro").load(paths)
    if engine == "table":  # Iceberg/catalog table name
        return spark.table(paths[0])
    raise ValueError(f"unknown engine {engine!r}")


def shuffle_by_keys(df: DataFrame, keys: List[str],
                    npartitions: Optional[int] = None) -> DataFrame:
    """Reference Dataset.shuffle_by_keys (groupby.py:33-40 precondition).
    Rarely needed — Spark groupBy/window shuffles on its own keys."""
    if npartitions:
        return df.repartition(npartitions, *keys)
    return df.repartition(*keys)


def write_shuffled(df: DataFrame, path: str, shuffle: str = "per_partition",
                   out_files: Optional[int] = None, seed: int = 42,
                   fmt: str = "parquet", mode: str = "overwrite",
                   partition_on: Optional[List[str]] = None) -> None:
    """Training-set sink with intra-file row shuffle (reference
    Shuffle.PER_PARTITION / PER_WORKER semantics):
    * per_partition — rows shuffled within each output file
    * full          — global random repartition + within-file shuffle
    * partition_on  — hive-style directory partitioning by column values
      (reference Dataset.to_parquet(partition_on=...), merlin io)
    """
    out = df
    if shuffle == "full":
        out = out.repartition(out_files or df.rdd.getNumPartitions(),
                              F.rand(seed))
    elif out_files:
        out = out.repartition(out_files)
    if shuffle in ("per_partition", "full"):
        out = out.sortWithinPartitions(F.rand(seed))
    writer = out.write.mode(mode).format(fmt)
    if partition_on:
        writer = writer.partitionBy(*partition_on)
    writer.save(path)


def write_bucketed(df: DataFrame, table: str, buckets: int,
                   key: str, sort_cols: Optional[List[str]] = None,
                   mode: str = "overwrite") -> None:
    """Persist entity-bucketed, timestamp-sorted storage (the north-rule
    layout: "entity-range-partitioned, timestamp-sorted partitions").

    Reading the table back gives HashPartitioning(key) for free — every
    window/as-of/sessionize over (key, ts) then plans WITHOUT an
    Exchange (verified by tests/test_checkpoint_and_scale.py): at 100 TB
    the entire windowed feature pass becomes shuffle-free, paying only a
    bucket-local sort."""
    (df.write.mode(mode).bucketBy(buckets, key)
       .sortBy(key, *(sort_cols or [])).saveAsTable(table))


def inspect_dataset(df: DataFrame, exact_cardinality: bool = False) -> dict:
    """Dataset stats → JSON-safe dict (reference
    tools/dataset_inspector.py:38+): per-column dtype, min/max/mean/std,
    null fraction, string cardinality — one aggregation job."""
    from ..operators.data_stats import DataStats
    from ..operators.base import TransformContext
    from ..plans.graph import ColumnSelector

    ds = DataStats(exact_cardinality=exact_cardinality)
    sel = ColumnSelector(df.columns)
    ctx = TransformContext(sel, {c: c for c in df.columns}, {})
    ds.fit(ctx, df)
    return {"num_rows": ds.num_rows, "columns": ds.stats}


# ---------------------------------------------------------------------------
# deterministic synthetic generators (FIXTURES.md F1)
# ---------------------------------------------------------------------------

def synthetic_tabular(spark: SparkSession, n_rows: int, seed: int = 42,
                      n_cats: int = 4, n_conts: int = 3,
                      cat_cardinality: int = 1000, powerlaw: float = 1.5,
                      multihot_max: int = 8,
                      partitions: Optional[int] = None) -> DataFrame:
    """Reference ``tools/data_gen.DatasetGen`` equivalent
    (nvtabular/tools/data_gen.py:41-441): power-law categorical columns
    ``cat_0..``, uniform continuous ``cont_0..``, a binary ``label`` and
    one multi-hot ``mh_0`` column — deterministic, pure JVM expressions.
    """
    df = spark.range(0, n_rows, 1,
                     partitions or spark.sparkContext.defaultParallelism)
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))  # noqa: E731
    cols = [F.col("id").alias("row_id")]
    for i in range(n_cats):
        u = (h(f"cat{i}") % 1000000) / 1000000.0
        # inverse-CDF power-law over [0, cardinality)
        rank = (F.pow(u, F.lit(powerlaw)) * cat_cardinality).cast("int")
        cols.append(F.concat(F.lit(f"c{i}_"), rank.cast("string"))
                    .alias(f"cat_{i}"))
    for i in range(n_conts):
        cols.append(((h(f"cont{i}") % 1000000) / 1000000.0 * 2 - 1)
                    .alias(f"cont_{i}"))
    n_mh = (h("mh") % multihot_max + 1).cast("int")
    cols.append(F.transform(
        F.sequence(F.lit(1), n_mh),
        lambda j: (F.abs(F.xxhash64(F.col("id"), j, F.lit(seed)))
                   % cat_cardinality).cast("int")).alias("mh_0"))
    cols.append((h("label") % 100 < 25).cast("int").alias("label"))
    return df.select(*cols)


def tokenized_sequences(spark: SparkSession, n_rows: int, seed: int = 42,
                        vocab_size: int = 50000, max_len: int = 256,
                        n_entities: int = 1000,
                        partitions: Optional[int] = None) -> DataFrame:
    """The north-rule input table::

        doc_id:string, tokens:array<int32>, n_tok:int32, source:string,
        entity_id:string, ts:timestamp, label:int8, x:double, y:double

    Deterministic for a given (n_rows, seed): every column derives from
    xxhash64(row_id, seed). Token length ~ Zipf-ish via inverse-power of
    a uniform hash; 2 hot entities own ~20% of rows (skew testing).
    Pure JVM expressions — generating 10^9 rows is embarrassingly
    parallel with zero Python cost.
    """
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))  # noqa: E731

    # Zipf-truncated length in [1, max_len]: u^3 concentrates near 0
    u = (h("len") % 1000000) / 1000000.0
    n_tok = (F.pow(u, F.lit(3.0)) * (max_len - 1) + 1).cast("int")

    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: (F.abs(F.xxhash64(F.col("id"), i, F.lit(seed)))
                   % vocab_size).cast("int"))

    source = (F.when(h("src") % 100 < 70, "web")
              .when(h("src") % 100 < 85, "books")
              .when(h("src") % 100 < 95, "code")
              .otherwise("wiki"))

    # skew: ~20% of rows land on 2 hot entities
    ent_hash = h("ent")
    entity = (F.when(ent_hash % 10 == 0, F.lit("e_hot_0"))
              .when(ent_hash % 10 == 1, F.lit("e_hot_1"))
              .otherwise(F.concat(F.lit("e"),
                                  (ent_hash % n_entities).cast("string"))))

    ts = F.timestamp_seconds(
        F.lit(1577836800)  # 2020-01-01
        + (F.col("id") % 86400) * 37 + (h("jit") % 1800))

    label = (h("lab") % 100 < (20 + (n_tok % 60))).cast("tinyint")
    x = F.when(h("xn") % 100 == 0, F.lit(None).cast("double")) \
        .otherwise(((h("x") % 1000000) / 1000000.0) * 10.0 - 5.0)
    y = F.when(h("yn") % 100 == 1, F.lit(None).cast("double")) \
        .otherwise(((h("y") % 1000000) / 1000000.0) * 2.0)

    return df.select(
        F.format_string("doc_%010d", F.col("id")).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
        entity.alias("entity_id"),
        ts.alias("ts"),
        label.alias("label"),
        x.alias("x"),
        y.alias("y"),
    )


def verify_distribution(df: DataFrame, col: str, distro: str = "uniform",
                        alpha: float = 0.1, bins: int = 1000):
    """Goodness-of-fit check for generated data — the Spark twin of the
    reference's ``DatasetGen.verify_df`` (tools/data_gen.py:321-331,
    scipy ``kstest`` against the uniform / powerlaw CDF).

    Returns ``(ks_stat, p_value)`` for ``col`` (values scaled to
    [0, 1]) against:

    * ``"uniform"``  — CDF(x) = x
    * ``"powerlaw"`` — CDF(x) = x**alpha (scipy ``powerlaw(a)``
      convention, as the reference uses)

    Computed DISTRIBUTIVELY with no scipy: one groupBy over
    ``floor(x·bins)`` buckets builds the ECDF on a ``bins``-point grid
    (discretization error ≤ 1/bins, far below any decision threshold);
    the sup-difference is the KS statistic and the p-value comes from
    the asymptotic Kolmogorov series — public formulas throughout.
    """
    import math

    import numpy as np

    x = F.col(col).cast("double")
    # NULL/NaN carry no distribution information: a null bucket key
    # would crash the histogram fill and skew the ECDF denominator
    counts = (df.select(x.alias("x"))
              .where(x.isNotNull() & ~F.isnan(x))
              .select(F.least(F.greatest(F.floor(F.col("x") * bins),
                                         F.lit(0)),
                              F.lit(bins - 1)).alias("b"))
              .groupBy("b").count().orderBy("b").collect())
    n = sum(r["count"] for r in counts)
    if n == 0:
        raise ValueError(f"verify_distribution: column {col!r} is empty")
    hist = np.zeros(bins)
    for r in counts:
        hist[int(r["b"])] = r["count"]
    ecdf = np.cumsum(hist) / n
    grid = (np.arange(1, bins + 1)) / bins      # right edge of each bucket
    if distro == "uniform":
        cdf = grid
    elif distro == "powerlaw":
        cdf = np.power(grid, alpha)
    else:
        raise ValueError(f"unknown distro {distro!r}")
    stat = float(np.max(np.abs(ecdf - cdf)))
    # asymptotic Kolmogorov p-value (two-sided)
    lam = (math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * stat
    p = 2.0 * sum((-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
                  for k in range(1, 101))
    return stat, max(0.0, min(1.0, p))
