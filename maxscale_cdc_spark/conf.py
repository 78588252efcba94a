"""Cluster-scale configuration: how this engine is sized at 100 TB.

`local[32]` correctness settings live in `session.py`; this module is
the production profile — the same operators, executed on a real
cluster, need the shuffle/memory/adaptivity knobs below.  Each value
carries its sizing rule so the next operator author can re-derive it.
"""

from __future__ import annotations


def production_conf(
    input_bytes: int,
    executors: int = 1000,
    cores_per_executor: int = 4,
    executor_mem_gb: int = 16,
) -> dict[str, str]:
    """Spark conf for a given input volume.

    Sizing rules:

    * **shuffle partitions** — target ~128-200 MB of shuffle data per
      partition so a partition's build side fits in a task's memory
      with room for spill buffers: `input_bytes / 150 MB`, floored to
      2 × total cores so every core gets work even on small stages.
      AQE coalesces down when a stage shuffles less.
    * **maxPartitionBytes 128 MB** — scan splits match the parquet
      row-group size; bigger splits starve parallelism, smaller ones
      drown the scheduler at 100 TB (≈ 800 k splits at 128 MB).
    * **AQE on, skew-join on** — runtime re-planning replaces manual
      salting for batch joins (streaming/stateful still salt by hand:
      AQE cannot re-plan a running stateful query).
    * **broadcast threshold 256 MB** — dims (region/nation/customer at
      dim-scale) broadcast; with 16 GB executors a 256 MB build side
      is safe (~4 GB deserialized worst case across 4 tasks).
    * **shuffle compression + zstd** — shuffle volume dominates the
      network at this scale; zstd trades ~5% CPU for ~30% less I/O.
    * **Kryo** — row-external shuffles (window/state) serialize faster.
    """
    total_cores = executors * cores_per_executor
    shuffle_parts = max(int(input_bytes / (150 * 1024**2)), 2 * total_cores)
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024**2),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * 1024**2),
        # production keeps the default 1 MB coalesce floor: partitions at
        # 100 TB exceed any floor, and the local 64k default (session.py
        # — prices expression-heavy KB-scale stages the byte heuristic
        # serializes at bench scale) would be inert here anyway
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": str(1024**2),
        "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024**2),
        "spark.executor.instances": str(executors),
        "spark.executor.cores": str(cores_per_executor),
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.memory.fraction": "0.7",
        "spark.shuffle.compress": "true",
        "spark.io.compression.codec": "zstd",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # streaming: state stores sized to cores; RocksDB keeps hot CDC
        # state off-heap so 100M-key latest-state tables fit
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }


#: Worked example: 100 TB scan on 1000 × 4-core executors →
#: ~700k shuffle partitions pre-AQE, ~800k scan splits, dims broadcast.
EXAMPLE_100TB = 100 * 1024**4
