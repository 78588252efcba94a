"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (CDC latest-state materialization
joined to a dimension, aggregated) at sf0.001; `queries()` /
`oracle_sql()` expose the full SURVEY §2B operator inventory backed by
`maxscale_cdc_spark.registry`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maxscale_cdc_spark import registry
from maxscale_cdc_spark.functions.numeric import dsum
from maxscale_cdc_spark.session import tune_for_oracle
from maxscale_cdc_spark.tables import table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: materialize current per-user state from the CDC-shaped
    event stream (last image per PK, deletes dropped), enrich with the
    broadcast customer dim, aggregate per market segment.

    Exercises scan → window (CDC apply) → broadcast join → hash agg —
    the canonical CDC-consumer pipeline at any scale.
    """
    tune_for_oracle(spark)
    from maxscale_cdc_spark.operators.cdc import cdc_latest_state

    state = cdc_latest_state(spark, SF0001)
    cust = table(spark, SF0001, "customer")
    return (
        state.join(F.broadcast(cust), state.pk == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_users"),
            dsum("last_value", "sum_value"),
        )
    )


# Queries that earned a green driver CORRECTNESS row in round 1 AND are
# unchanged since (the round-1 sweep was cut off by its time budget
# after 50 entries; queries rewritten in round 2 — llm_dedup_near,
# llm_dedup_cluster, llm_sim_ivf, llm_quality_score, rel_agg_approx —
# are deliberately NOT listed: their old green rows no longer certify
# the current code, so they sort with the unverified group).
# queries() orders the dict so still-unverified queries run FIRST —
# if a budget truncates the sweep again, it verifies new ground instead
# of re-verifying these.  Nothing else changes: every query runs the
# same oracle check whenever it is reached.
_R1_DRIVER_GREEN = {
    "cdc_event_dispatch", "cdc_gtid", "cdc_gtid_filter", "cdc_payload_project",
    "cdc_order", "cdc_dedup_exact", "cdc_update_pair", "cdc_latest_state",
    "cdc_scd2", "cdc_gap_detect", "cdc_snapshot_tail", "cdc_schema_registry",
    "llm_dedup_exact", "llm_ngram_top",
    "llm_dedup_simhash", "llm_dedup_simhash_pairs", "llm_fingerprint",
    "llm_sim_cosine", "llm_sim_topk_pergroup", "llm_dedup_embed",
    "llm_embed_centroid", "llm_pack_sequences", "llm_train_split",
    "llm_text_stats", "llm_lang_id", "llm_token_count",
    "mm_meta", "mm_decode_stub", "mm_features", "mm_frame_sample",
    "rel_project", "rel_filter", "rel_agg_hash", "rel_agg_distinct",
    "rel_agg_stats", "rel_agg_rollup", "rel_agg_cube",
    "rel_agg_gsets", "rel_having", "rel_join_inner", "rel_join_left",
    "rel_join_right", "rel_join_full", "rel_join_semi", "rel_join_anti",
}

# Long-pole queries (streaming setup / Python DataSource cold start /
# iterative algorithms) — within each group they run after the cheap
# ones so a time-budgeted sweep maximizes rows checked.
_HEAVY = {
    "src_cdc_datasource", "src_tcp_transport", "src_cdc_stream", "snk_append",
    "snk_upsert", "snk_partitioned", "str_stream_stream_join", "str_tumbling",
    "str_sliding", "str_watermark_late", "str_dedup_stream",
    "str_dedup_within_watermark", "str_stateful", "str_stream_static_join",
    "llm_dedup_cluster", "llm_dedup_near", "llm_dedup_embed",
    "llm_dedup_simhash_pairs", "llm_sim_ivf", "llm_sim_ivf_probe",
    "mm_decode_stub",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        return run

    names = sorted(
        registry.QUERIES,
        key=lambda n: (n in _R1_DRIVER_GREEN, n in _HEAVY, n),
    )
    return {name: _wrap(registry.QUERIES[name]) for name in names}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLE)
