"""The Python UDF surface: scalar Pandas UDF, grouped-map, UDTF-style.

Spark's slow path, used deliberately: Arrow-batched Pandas UDFs (never
row-at-a-time Python), grouped-map `applyInPandas` for per-group
imperative logic, and explode-based fan-out where a UDTF would be.
Each result is designed to be integer-/order-deterministic so the
DuckDB oracle checks the UDF machinery exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maxscale_cdc_spark.registry import register
from maxscale_cdc_spark.tables import table


@register(
    "udf_pandas_scalar",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) - CAST(len(string_split(text, ' ')) AS BIGINT) + 1 AS n_nonspace_ish
    FROM documents
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar Pandas UDF (tokenizer stand-in): ~10-100×
    the throughput of a row-at-a-time Python UDF; the JVM⇄Python hop is
    per-batch, not per-row."""

    @F.pandas_udf("bigint")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.split(" ").map(len).astype("int64")

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens("text").alias("n_tokens"),
        (F.length("text").cast("long") - n_tokens("text") + 1).alias(
            "n_nonspace_ish"
        ),
    )


@register(
    "udf_grouped_map",
    """
    SELECT doc_id, lang,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS size_rank
    FROM documents
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (per-group imperative logic — the UDAF/
    partition-programming escape hatch).  Each language group arrives as
    one pandas DataFrame; ranking is done in pandas and checked against
    the SQL window oracle."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        pdf["size_rank"] = range(1, len(pdf) + 1)
        return pdf[["doc_id", "lang", "size_rank"]]

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        rank_group, "doc_id bigint, lang string, size_rank bigint"
    )


@register(
    "udf_explode_udtf",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id, CAST(pos AS INT) AS pos, w[pos + 1] AS token
    FROM t, unnest(generate_series(0, len(w) - 1)) AS u(pos)
    WHERE len(w) > 0 AND pos < 8
    """,
)
def udf_explode_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style row fan-out via posexplode (first 8 tokens per doc):
    Spark's native lateral-view mechanism — executor-side, partition-
    preserving, what a table function compiles to."""
    d = table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    return (
        d.select("doc_id", F.posexplode(F.slice(w, 1, 8)).alias("pos", "token"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "token")
    )


# ---------------------------------------------------------------------------
# udf_parity_audit — UDF governance: any Python kernel that shadows a
# built-in must be PROVEN equal to it on the actual corpus before it
# ships (the repo rule "UDFs are the slow path" needs an enforcement
# surface, not just a convention).  The same per-doc token count is
# computed twice — an Arrow pandas UDF and the Catalyst built-in —
# and the export counts agreements per source: n_equal == n_docs is
# the contract; a drifting kernel (unicode edge, NA handling, dtype
# truncation) shows up as a deficit, located by source.
#
# Scale shape: ONE scan carrying both computations (the Arrow batch
# and the codegen'd expression run in the same stage), one
# map-side-combinable source aggregate.
# ---------------------------------------------------------------------------

@register(
    "udf_parity_audit",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_equal,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
    FROM documents
    GROUP BY source
    """,
)
def udf_parity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF vs built-in token count, agreement audited per
    source.  The oracle asserts the CONTRACT (n_equal = n_docs and the
    built-in's sum): a kernel drift breaks the value-hash, not just a
    soft metric."""

    @F.pandas_udf("bigint")
    def py_tokens(s: pd.Series) -> pd.Series:
        return s.str.split(" ").map(len).astype("int64")

    d = table(spark, sf_dir, "documents")
    both = d.select(
        "source",
        py_tokens("text").alias("py_n"),
        F.size(F.split("text", " ")).cast("long").alias("jvm_n"),
    )
    return both.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("py_n") == F.col("jvm_n"), 1).otherwise(0))
        .cast("long")
        .alias("n_equal"),
        F.sum("jvm_n").cast("long").alias("sum_tokens"),
    )
