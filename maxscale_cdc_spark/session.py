"""SparkSession factory tuned for the test/bench environment.

Local mode is a single JVM; on a real cluster the same configs apply,
with `spark.sql.shuffle.partitions` sized to ~2-3x total cores and AQE
coalescing handling the rest.  Session timezone is pinned to UTC so
timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "maxscale-cdc-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's byte-based coalescing can't see per-row EXPRESSION cost:
        # at bench scale a few MB of class/candidate rows carrying
        # md5-minhash transforms or array_intersect verifies coalesce to
        # 1-3 post-shuffle partitions and the whole stage serializes on
        # one core (measured r14: the staged trigram class table
        # materialized as ONE partition, 1.8 s vs 0.3 s spread; the
        # dedup/banding heavies min-of-4 improved 13.5→10.2, 12.4→9.8,
        # 8.4→6.9 s with a 64k floor, kmeans/streaming/tail flat-to-
        # better — interleaved A/B, OPTIMIZATION_r14.md).  64k keeps
        # genuinely tiny scalar stages fully coalesced while spreading
        # KB-per-row compute stages across cores.  Scale-adaptive: at
        # production volumes every partition exceeds any floor, so the
        # knob is inert there (conf.py keeps the 128 MB advisory/1m
        # profile); env-parameterised so the driver's lower-core bench
        # run compares like with like.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Pre-size the heap: in local mode the driver JVM IS the
        # cluster, and letting the heap grow from the JDK's small
        # default -Xms means the first memory-heavy query pays a
        # cascade of full GCs while the heap expands (measured: the
        # same self-join query 11-131 s cold vs 6.6 s warm).  -Xms at
        # -Xmx removes heap-growth GCs entirely.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "-Xms16g"),
        )
    )
    # A/B instrument + ops escape hatch: `SPARK_EXTRA_CONF="k=v;k2=v2"`
    # applies arbitrary conf overrides at session build.  Unset (the
    # driver default) this is a no-op, so the bench contract is
    # unchanged; it exists so config experiments (GC, codegen cache,
    # shuffle knobs) run the REAL get_spark() path instead of a
    # hand-rolled session that silently drifts from it.
    extra = os.environ.get("SPARK_EXTRA_CONF", "")
    for kv in extra.split(";"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Central registry of the per-(session, sf_dir) COMPUTE caches
# (staged shingle/trigram lineage, CC components, BPE merge tables,
# the chooser curve/choice …).  The r10 verdict's instrument finding:
# min-of-3-in-one-session amortizes these, turning the per-query floor
# for cached-family queries into a suite floor (0.02 s recorded for a
# 12 s query).  bench.py's BENCH_COLD=1 clears them before every
# attempt via reset_family_caches(), so the recorded floor prices each
# query's own lineage.  Registration is a no-op wrapper at declaration
# (the dict object is unchanged) — emitted plans/SQL are identical.
FAMILY_CACHES: list[dict] = []


def register_family_cache(cache: dict) -> dict:
    FAMILY_CACHES.append(cache)
    return cache


def reset_family_caches() -> None:
    """Clear every registered compute cache (BENCH_COLD instrument)."""
    for c in FAMILY_CACHES:
        c.clear()


def session_cache_key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Key for the per-(session, sf_dir) staged-DataFrame caches
    (_SHINGLE_CACHE / _CLUSTER_CACHE / _LEARN_CACHE).  Keyed by the
    SparkContext applicationId, NOT id(spark): a stopped-and-GC'd
    session's id can be reused by a new SparkSession, which would
    return checkpointed DataFrames bound to a dead SparkContext."""
    return (spark.sparkContext.applicationId, sf_dir)


def prune_dead_cache_entries(cache: dict, spark: SparkSession) -> None:
    """Evict cache entries keyed to any OTHER application id — they
    reference lineage owned by a context that no longer exists (one
    live context per process), so they can never be read again."""
    app = spark.sparkContext.applicationId
    for k in [k for k in cache if k[0] != app]:
        del cache[k]


import contextlib


@contextlib.contextmanager
def quiet_expected_failure(spark: SparkSession):
    """Silence JVM log output around a stage that is EXPECTED to fail
    (fault-injection fixtures): executor tracebacks from the injected
    raise otherwise spray the driver/sweep logs that real failures
    must be grepped from (VERDICT r12 #3).  The exception itself still
    propagates to the caller — only the log4j noise is suppressed."""
    sc = spark.sparkContext
    # Restore the CALLER's effective root level, not a hardcoded WARN:
    # verify/bench sessions run at ERROR (the documented recipe) and a
    # WARN restore silently re-noised them after any manifest-sink
    # fixture (ADVICE r13).  Spark 4 logs through log4j2.
    try:
        prior = str(
            sc._jvm.org.apache.logging.log4j.LogManager.getRootLogger().getLevel()
        )
    except Exception:
        prior = "WARN"
    sc.setLogLevel("OFF")
    try:
        yield
    finally:
        sc.setLogLevel(prior)


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Settings the driver-provided session needs for oracle parity.

    `nanosAsLong` lets Spark read parquet TIMESTAMP(NANOS) columns
    (events.ts) as long; the loader converts them to microsecond
    timestamps, matching DuckDB's truncation.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make `maxscale_cdc_spark` importable on Python workers regardless
    of the driver's cwd: UDF closures that touch module-level helpers
    are pickled by reference, so executors must be able to import the
    package.  Zipped once per SparkContext and shipped via addPyFile."""
    sc = spark.sparkContext
    if getattr(sc, "_maxscale_pkg_shipped", False):
        return
    import os
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="pkg_ship_")
    zip_base = os.path.join(staging, "maxscale_cdc_spark")
    shutil.copytree(pkg_dir, os.path.join(zip_base, "maxscale_cdc_spark"))
    zip_path = shutil.make_archive(zip_base, "zip", zip_base)
    sc.addPyFile(zip_path)
    sc._maxscale_pkg_shipped = True
