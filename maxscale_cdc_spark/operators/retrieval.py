"""Retrieval / semantic-dedup operators: BM25 ranking and SemDeDup.

`llm_bm25_rank` is the classic sparse-retrieval scorer a data pipeline
uses to mine topical subsets of a crawl (query → top-k documents);
`llm_semdedup` is the SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540): k-means the embedding space, then drop any point
whose cosine to a LOWER-ID member of its own cluster exceeds a
threshold — near-duplicate pruning whose quadratic term is bounded by
the cluster size, never the corpus.

Exactness discipline: BM25's idf is the log-free odds ratio
(N - df + ½)/(df + ½) — the log is a monotone per-term transform whose
last-ulp behavior differs across libm builds, while the rational form
is a single IEEE-exact division chain that both engines evaluate
identically when the expression tree is written identically (which it
is, below).  All exported doubles are rounded to 6 dp at the boundary.

Scale notes (100 TB): BM25 is two linear passes — one map-side-
combinable scalar aggregate for corpus stats (broadcast back, KB-sized)
and one scan-speed per-row score; the only shuffle is the final top-k
(a TakeOrdered, driver receives k rows).  SemDeDup is the IVF k-means
(broadcast-join assignment per Lloyd round) plus a per-cell self-join —
O(Σ cell²); production raises K so cells stay ~10⁴-10⁵ rows and the
join key (cid) spreads cells across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from maxscale_cdc_spark.functions.text import words
from maxscale_cdc_spark.functions.vectors import (
    as_double,
    cosine,
    dot,
    norm_sq,
    q30_mean_arrays,
    sql_cosine,
)
from maxscale_cdc_spark.operators.llm import _KMEANS_ITERS, _sql_kmeans_ctes
from maxscale_cdc_spark.registry import register
from maxscale_cdc_spark.tables import table, wide_table

# ---------------------------------------------------------------------------
# llm_bm25_rank — BM25 top-20 for a fixed conjunctive keyword query.
# k1 = 1.2, b = 0.75 (the Robertson defaults); idf is the odds ratio
# without the log (see module docstring).  Every factor is written as
# the SAME expression tree in Spark and DuckDB, so the doubles agree
# bitwise before the defensive 6-dp rounding.
# ---------------------------------------------------------------------------

_BM25_TERMS = ["table", "join", "query"]
_BM25_TOPK = 20

_BM25_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), tf AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS dl,
         {', '.join(
             f"CAST(len(list_filter(w, x -> x = '{term}')) AS BIGINT) AS tf{i}"
             for i, term in enumerate(_BM25_TERMS)
         )}
  FROM t
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_dl,
         {', '.join(
             f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
             for i in range(len(_BM25_TERMS))
         )}
  FROM tf
), scored AS (
  SELECT tf.doc_id, tf.dl, {', '.join(f'tf.tf{i}' for i in range(len(_BM25_TERMS)))},
         round(
           {' + '.join(
               f"((CAST(s.n_docs - s.df{i} AS DOUBLE) + 0.5) / (CAST(s.df{i} AS DOUBLE) + 0.5))"
               f" * (CAST(tf.tf{i} AS DOUBLE) * 2.2)"
               f" / (CAST(tf.tf{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 * "
               f"(CAST(tf.dl * s.n_docs AS DOUBLE) / CAST(s.total_dl AS DOUBLE))))"
               for i in range(len(_BM25_TERMS))
           )}
         , 6) AS score
  FROM tf CROSS JOIN stats s
)
SELECT doc_id, dl,
       {', '.join(f'tf{i} AS tf_{term}' for i, term in enumerate(_BM25_TERMS))},
       score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
FROM scored
ORDER BY score DESC, doc_id
LIMIT {_BM25_TOPK}
"""


@register("llm_bm25_rank", _BM25_ORACLE)
def llm_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for the fixed query {table, join, query}.

    Pass 1: one scalar aggregate (doc count, total length, per-term
    document frequency) — map-side combinable longs, broadcast back as
    a single row.  Pass 2: per-row scoring at scan speed (tf via
    array filter, no explode), then a global top-k which Spark executes
    as TakeOrdered (per-partition heap + k-row driver merge, no full
    sort shuffle).  Corpus growth changes only the broadcast scalars."""
    d = wide_table(spark, sf_dir, "documents")

    def _tf(i: int, term: str):
        # NB: binding via a two-parameter lambda (`lambda x, t=term`) would
        # make filter() treat the second parameter as the element INDEX —
        # bind the term through this closure instead (see llm.py `_mh`).
        return (
            F.size(F.filter(F.col("w"), lambda x: x == F.lit(term)))
            .cast("long")
            .alias(f"tf{i}")
        )

    # split ONCE — four expressions over the same `w` array instead of
    # four independent split() evaluations per row
    split = d.select("doc_id", words("text").alias("w"))
    tf = split.select(
        "doc_id",
        F.size("w").cast("long").alias("dl"),
        *[_tf(i, term) for i, term in enumerate(_BM25_TERMS)],
    )
    stats = tf.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).cast("long").alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    # identical expression tree to the oracle: odds-ratio idf × saturated
    # tf × length normalization, summed left-to-right over the terms
    ratio = F.col("dl").cast("double") * F.col("n_docs") / F.col("total_dl").cast(
        "double"
    )

    def term_score(i: int):
        idf = ((F.col("n_docs") - F.col(f"df{i}")).cast("double") + 0.5) / (
            F.col(f"df{i}").cast("double") + 0.5
        )
        tfc = F.col(f"tf{i}").cast("double")
        return idf * (tfc * 2.2) / (tfc + 1.2 * (0.25 + 0.75 * ratio))

    score = term_score(0)
    for i in range(1, len(_BM25_TERMS)):
        score = score + term_score(i)
    scored = tf.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        *[F.col(f"tf{i}").alias(f"tf_{t}") for i, t in enumerate(_BM25_TERMS)],
        F.round(score, 6).alias("score"),
    )
    # top-k FIRST (TakeOrdered: per-partition heap, k-row merge — no full
    # sort shuffle), then rank the k survivors; the global window touches
    # only _BM25_TOPK rows.
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(_BM25_TOPK)
    w = W.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rk", F.row_number().over(w).cast("long")).select(
        "doc_id",
        "dl",
        *[f"tf_{t}" for t in _BM25_TERMS],
        "score",
        "rk",
    )


# ---------------------------------------------------------------------------
# llm_semdedup — SemDeDup semantic near-duplicate pruning: k-means the
# embeddings (same seeded Lloyd rounds as llm_sim_ivf), then inside each
# cluster drop any vector whose cosine to a lower-id cluster member
# exceeds the threshold.  τ = 0.35 is the demonstration threshold for
# this synthetic corpus (max pairwise cosine ≈ 0.51; production corpora
# with real duplicates use ~0.95).
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.35
#: more cells than the IVF queries (32 vs 8): the dedup pass is
#: quadratic in cell size, so K balances assignment cost (N·K per Lloyd
#: round) against pairwise cost (N²/K) — K ≈ √N is the sweet spot.
_SEMDEDUP_CELLS = 32

_SEMDEDUP_ORACLE = f"""
WITH {_sql_kmeans_ctes(_SEMDEDUP_CELLS)},
cells AS (
  SELECT a.vec_id, a.cid, a.v,
         CAST(count(*) OVER (PARTITION BY a.cid) AS BIGINT) AS n_cell
  FROM a{_KMEANS_ITERS} a
), pairs AS (
  SELECT me.vec_id, max({sql_cosine('me.v', 'lo.v')}) AS max_sim_lower
  FROM cells me JOIN cells lo
    ON me.cid = lo.cid AND lo.vec_id < me.vec_id
  GROUP BY me.vec_id
)
SELECT c.vec_id, c.cid, c.n_cell,
       COALESCE(p.max_sim_lower, CAST(-1.0 AS DOUBLE)) AS max_sim_lower,
       (COALESCE(p.max_sim_lower, CAST(-1.0 AS DOUBLE)) > {_SEMDEDUP_TAU}) AS is_dup
FROM cells c LEFT JOIN pairs p ON c.vec_id = p.vec_id
"""


def _sd_kmeans_cells(e: DataFrame) -> DataFrame:
    """`llm._kmeans_cells` with K=_SEMDEDUP_CELLS and squared norms
    precomputed per row/centroid instead of per pair.  norm_sq is a
    deterministic function of the vector, so every similarity this
    computes is the bitwise-same double `cosine()` would produce — the
    oracle's per-pair `sql_cosine` matches — at one third of the
    assignment flops (the crossJoin evaluates N·K pairs per round).
    Kept separate from llm._kmeans_cells on purpose: that helper backs
    driver-green queries (llm_sim_ivf/_probe) whose code must not churn
    — see the demotion rule in __spark_entry__.py; the two MUST stay
    arithmetically identical (Q1.30 update via q30_mean_arrays,
    round-6 cosine, cid tie-break).

    Pass `e` through wide_table so the N·K crossJoin similarity loop is
    spread across cores, not serialized on a one-row-group scan."""
    vecs = e.select("vec_id", as_double("embedding").alias("v")).withColumn(
        "nsq", norm_sq(F.col("v"))
    )
    cents = (
        e.filter(F.col("vec_id") < _SEMDEDUP_CELLS)
        .select(F.col("vec_id").alias("cid"), as_double("embedding").alias("cv"))
        .withColumn("cnsq", norm_sq(F.col("cv")))
    )

    def assign(cents_df: DataFrame) -> DataFrame:
        sim = F.round(
            dot(F.col("v"), F.col("cv")) / F.sqrt(F.col("nsq") * F.col("cnsq")), 6
        )
        scored = vecs.crossJoin(F.broadcast(cents_df)).select(
            "vec_id", "v", "nsq", "cid", sim.alias("sim")
        )
        w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", "nsq", "cid")
        )

    def update(assigned_df: DataFrame) -> DataFrame:
        # identical Q1.30 fixed-point mean as llm._kmeans_cells.update
        return q30_mean_arrays(assigned_df, "cid").withColumn(
            "cnsq", norm_sq(F.col("cv"))
        )

    assigned = assign(cents)
    for _ in range(_KMEANS_ITERS):
        assigned = assign(update(assigned))
    return assigned


@register("llm_semdedup", _SEMDEDUP_ORACLE)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _semdedup_frame(spark, sf_dir, stage=True)


def _semdedup_frame(spark: SparkSession, sf_dir: str, stage: bool) -> DataFrame:
    """SemDeDup: per-cluster semantic dedup verdicts.

    Same seeded Lloyd's k-means as llm_sim_ivf (broadcast-join
    assignment, Q1.30 fixed-point centroid means — bitwise-identical
    cells in both engines) but with K=32 cells and per-row norm
    precomputation (see _sd_kmeans_cells).  The dedup pass is ONE
    self-join keyed on the cluster id: each vector meets only its own
    cluster's lower-id members, so the quadratic term is Σ cell² —
    bounded by how K scales with the corpus, never N².  Keep-lowest-id
    is the deterministic greedy SemDeDup keeper rule; max_sim_lower is
    the audit value a pipeline thresholds when tuning τ.

    `stage=False` skips the localCheckpoint pin so plan gates can
    assert on the FULL lineage (a checkpoint hides everything upstream
    behind a LogicalRDD scan — see test_plans.py)."""
    e = wide_table(spark, sf_dir, "embeddings")
    # the self-join + cell-size window evaluate this lineage three
    # times; pin the (tiny: id, vector, nsq, cid) assignment once —
    # A/B-measured 5.7 s → 4.1 s at sf0.1 (min-of-3)
    assigned = _sd_kmeans_cells(e)
    if stage:
        assigned = assigned.localCheckpoint(eager=True)
    cells = assigned.withColumn(
        "n_cell", F.count("*").over(W.partitionBy("cid")).cast("long")
    )
    me = cells.select("vec_id", "cid", "v", "nsq", "n_cell")
    lo = cells.select(
        F.col("vec_id").alias("lo_id"),
        F.col("cid").alias("lo_cid"),
        F.col("v").alias("lo_v"),
        F.col("nsq").alias("lo_nsq"),
    )
    sim = F.round(
        dot(F.col("v"), F.col("lo_v")) / F.sqrt(F.col("nsq") * F.col("lo_nsq")), 6
    )
    pairs = (
        me.join(lo, (F.col("cid") == F.col("lo_cid")) & (F.col("lo_id") < F.col("vec_id")))
        .groupBy("vec_id")
        .agg(F.max(sim).alias("max_sim_lower"))
    )
    sim_lower = F.coalesce(F.col("max_sim_lower"), F.lit(-1.0))
    return me.join(pairs, "vec_id", "left").select(
        "vec_id",
        "cid",
        "n_cell",
        sim_lower.alias("max_sim_lower"),
        (sim_lower > _SEMDEDUP_TAU).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# llm_embed_outliers — embedding-space QA: cosine of every vector to its
# label's prototype (Q1.30-exact elementwise mean, the llm_embed_centroid
# discipline), with an outlier flag at cos < 0.  Mislabeled / corrupted
# embeddings surface as low-similarity rows — the audit a pipeline runs
# before trusting labels for curriculum or mixture decisions.
# ---------------------------------------------------------------------------

_OUTLIER_TAU = 0.0
_Q30F = 1073741824.0

_OUTLIER_ORACLE = f"""
WITH flat AS (
  SELECT label, i.i AS dim,
         CAST(floor(CAST(embedding AS DOUBLE[])[i.i] * {_Q30F}) AS BIGINT) AS q30
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) i
), m AS (
  SELECT label, dim,
         CAST(sum(q30) AS DOUBLE) / (count(*) * {_Q30F}) AS m
  FROM flat GROUP BY label, dim
), cent AS (
  SELECT label, list(m ORDER BY dim) AS cv FROM m GROUP BY label
)
SELECT e.vec_id, e.label,
       {sql_cosine("CAST(e.embedding AS DOUBLE[])", "c.cv")} AS cos_centroid,
       ({sql_cosine("CAST(e.embedding AS DOUBLE[])", "c.cv")} < {_OUTLIER_TAU}) AS is_outlier
FROM embeddings e JOIN cent c ON e.label = c.label
"""


@register("llm_embed_outliers", _OUTLIER_ORACLE)
def llm_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector cosine to the label prototype, outlier-flagged.

    One (label, dim) keyed aggregation builds the prototypes (Q1.30
    fixed-point sums — partitioning-invariant and cross-engine exact,
    see llm_embed_centroid), reassembled to arrays and BROADCAST back
    (|labels| rows) so the scoring pass is a map-side join at scan
    speed.  At 100 TB: the only shuffle carries (label, dim) partial
    sums — combinable longs; the N-row pass never shuffles."""
    e = table(spark, sf_dir, "embeddings")
    cent = q30_mean_arrays(
        e.select("label", as_double("embedding").alias("v")), "label"
    )
    sim = F.round(
        dot(as_double("embedding"), F.col("cv"))
        / F.sqrt(norm_sq(as_double("embedding")) * norm_sq(F.col("cv"))),
        6,
    )
    return (
        e.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            sim.alias("cos_centroid"),
            (sim < _OUTLIER_TAU).alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# llm_sim_pq — product quantization (Jégou et al. 2011, "Product
# Quantization for Nearest Neighbor Search"): split each vector into M
# subvectors, quantize each against a per-subspace codebook (seeded
# from the first K vectors — the sampled-codebook variant), and answer
# queries with ADC (asymmetric distance computation): the query's
# distance to every codeword is computed ONCE per subspace, then each
# candidate's approximate distance is M table lookups, never a full
# d-dimensional pass.  The 64-dim embeddings use M=4 subspaces × 16
# dims, K=8 codewords (6 bits/vector here; production uses M=8-64,
# K=256).
# ---------------------------------------------------------------------------

_PQ_M = 4
_PQ_SUB = 16  # dims per subspace (4 × 16 = 64)
_PQ_K = 8
_PQ_TOPK = 5


def _sql_l2sq(a: str, b: str, dim: int) -> str:
    return (
        f"round(CAST(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS DOUBLE), 6)"
    )


def _pq_oracle() -> str:
    subs = []
    for m in range(_PQ_M):
        lo = m * _PQ_SUB + 1
        hi = (m + 1) * _PQ_SUB
        subs.append(
            f"sub{m} AS (SELECT vec_id, v[{lo}:{hi}] AS s FROM vecs)"
        )
        subs.append(
            f"cent{m} AS (SELECT vec_id AS cid, v[{lo}:{hi}] AS cv FROM vecs "
            f"WHERE vec_id < {_PQ_K})"
        )
        # codes: per vector, the codeword minimizing (l2sq, cid) — the
        # struct min is the deterministic tie-break both engines share
        subs.append(
            f"code{m} AS (SELECT vec_id, "
            f"min(struct_pack(d := {_sql_l2sq('s.s', 'c.cv', _PQ_SUB)}, cid := c.cid)) AS mc "
            f"FROM sub{m} s CROSS JOIN cent{m} c GROUP BY vec_id)"
        )
        # ADC lookup: query-subvector distance to every codeword
        subs.append(
            f"qd{m} AS (SELECT c.cid, {_sql_l2sq('q.qs', 'c.cv', _PQ_SUB)} AS d "
            f"FROM cent{m} c CROSS JOIN (SELECT v[{lo}:{hi}] AS qs FROM vecs WHERE vec_id = 0) q)"
        )
    adc = " + ".join(f"qd{m}.d" for m in range(_PQ_M))
    joins = " ".join(
        f"JOIN code{m} ON code{m}.vec_id = v.vec_id "
        f"JOIN qd{m} ON qd{m}.cid = code{m}.mc.cid"
        for m in range(_PQ_M)
    )
    return f"""
WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{', '.join(subs)}
SELECT v.vec_id, round(CAST({adc} AS DOUBLE), 6) AS adc_dist
FROM vecs v {joins}
WHERE v.vec_id <> 0
ORDER BY adc_dist, v.vec_id
LIMIT {_PQ_TOPK}
"""


@register("llm_sim_pq", _pq_oracle())
def llm_sim_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim_pq_frame(spark, sf_dir, stage=True)


def _sim_pq_frame(spark: SparkSession, sf_dir: str, stage: bool) -> DataFrame:
    """PQ/ADC approximate nearest neighbors for query vector 0.

    Encoding is M independent (vector × K-codeword) assignments — each
    a broadcast crossJoin + ONE keyed aggregation whose min is over the
    (distance, cid) struct (lexicographic min = deterministic
    tie-break; no window).  The ADC table is K rows per subspace,
    broadcast; scoring a candidate is M equi-join lookups + an M-term
    sum, independent of the raw dimensionality — the property that
    makes PQ the standard compression for billion-vector indexes.  At
    100 TB the codes (M small ints per vector) replace the raw vectors
    in the scan: 64 doubles → 4 codes is the 128× storage cut this
    operator's layout demonstrates."""
    e = wide_table(spark, sf_dir, "embeddings")
    # consumed 2M+1 times (per-subspace sub + cent, plus the spine) —
    # pin the narrow (id, vector) frame once (4.1 → 1.8 s min-of-3;
    # stage=False keeps the lineage visible for plan gates)
    vecs = e.select("vec_id", as_double("embedding").alias("v"))
    if stage:
        vecs = vecs.localCheckpoint(eager=True)

    def l2sq(a, b):
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    out = vecs.select("vec_id")
    adc_cols = []
    for m in range(_PQ_M):
        lo = m * _PQ_SUB + 1
        sub = vecs.select("vec_id", F.slice("v", lo, _PQ_SUB).alias("s"))
        cent = (
            vecs.filter(F.col("vec_id") < _PQ_K)
            .select(F.col("vec_id").alias("cid"), F.slice("v", lo, _PQ_SUB).alias("cv"))
        )
        code = (
            sub.crossJoin(F.broadcast(cent))
            .groupBy("vec_id")
            .agg(F.min(F.struct(l2sq(F.col("s"), F.col("cv")).alias("d"), F.col("cid").alias("cid"))).alias("mc"))
            .select("vec_id", F.col("mc.cid").alias(f"code{m}"))
        )
        qsub = sub.filter(F.col("vec_id") == 0).select(F.col("s").alias("qs"))
        qd = (
            cent.crossJoin(F.broadcast(qsub))
            .select(F.col("cid").alias(f"qcid{m}"), l2sq(F.col("qs"), F.col("cv")).alias(f"qd{m}"))
        )
        out = out.join(code, "vec_id").join(
            F.broadcast(qd), F.col(f"code{m}") == F.col(f"qcid{m}")
        )
        adc_cols.append(F.col(f"qd{m}"))
    adc = adc_cols[0]
    for c in adc_cols[1:]:
        adc = adc + c
    return (
        out.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(adc, 6).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(_PQ_TOPK)
    )


# ---------------------------------------------------------------------------
# llm_ivf_recall — ANN quality audit: recall of the IVF cell search
# against the brute-force exact top-k.  The tuning table every vector
# index ships with (recall@k vs nprobe); here at nprobe=1 so the
# number is the single-cell floor the probe variants improve on.
# Companion to llm_minhash_accuracy (the dedup-side accuracy audit).
# ---------------------------------------------------------------------------

_RECALL_K = 5

_IVF_RECALL_ORACLE = f"""
WITH {_sql_kmeans_ctes()},
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
qcell AS (SELECT cid FROM a{_KMEANS_ITERS} WHERE vec_id = 0),
cellv AS (
  SELECT a.vec_id FROM a{_KMEANS_ITERS} a JOIN qcell USING (cid)
  WHERE a.vec_id <> 0
),
exact AS (
  SELECT vec_id, cos_sim, rn FROM (
    SELECT e.vec_id,
           {sql_cosine("CAST(e.embedding AS DOUBLE[])", "q.qv")} AS cos_sim,
           row_number() OVER (
             ORDER BY {sql_cosine("CAST(e.embedding AS DOUBLE[])", "q.qv")} DESC,
                      e.vec_id) AS rn
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
  ) WHERE rn <= {_RECALL_K}
)
SELECT CAST(e.rn AS BIGINT) AS rk, e.vec_id, e.cos_sim,
       (c.vec_id IS NOT NULL) AS in_cell
FROM exact e LEFT JOIN cellv c USING (vec_id)
"""


@register("llm_ivf_recall", _IVF_RECALL_ORACLE)
def llm_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 audit of single-cell IVF search: for each of the exact
    brute-force top-5 neighbors, does the query's k-means cell contain
    it?  sum(in_cell)/5 IS recall@5 at nprobe=1 — the row-level export
    keeps WHICH neighbors were missed (always the boundary ones),
    which is what actually drives the nprobe decision.

    Plan: the exact side is one scan + TakeOrdered(5) (the
    llm_sim_cosine shape); the IVF side reuses _kmeans_cells' N·K
    broadcast assignment; the audit join is a 5-row broadcast against
    the query cell's members.  At 100 TB the exact side is the
    expensive half — which is the point: the audit runs on a SAMPLE of
    queries (here the one canonical query vector) to price the index's
    recall, never corpus-wide."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached

    e = table(spark, sf_dir, "embeddings")
    _, assigned = kmeans_cells_cached(spark, sf_dir)
    qcell = assigned.filter(F.col("vec_id") == 0).select(F.col("cid").alias("qcid"))
    cellv = (
        assigned.join(F.broadcast(qcell), F.col("cid") == F.col("qcid"))
        .filter(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("cand_id"))
    )
    q = e.filter(F.col("vec_id") == 0).select(as_double("embedding").alias("qv"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cosine(as_double("embedding"), F.col("qv")).alias("cos_sim"))
    )
    exact = (
        scored.orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_RECALL_K)
        .withColumn(
            "rk",
            F.row_number()
            .over(W.orderBy(F.col("cos_sim").desc(), "vec_id"))
            .cast("long"),
        )
    )
    return (
        exact.join(
            F.broadcast(cellv), exact.vec_id == F.col("cand_id"), "left"
        )
        .select(
            "rk", "vec_id", "cos_sim", F.col("cand_id").isNotNull().alias("in_cell")
        )
    )


# ---------------------------------------------------------------------------
# llm_hard_negatives — contrastive-training margin audit: for every
# vector, cosine to its OWN label prototype vs the best cosine to any
# OTHER label's prototype.  A violation (other >= own is false —
# i.e. cos_other > cos_own) marks the vectors a hard-negative miner
# would surface and a label-quality audit would flag; the per-label
# margin mass prices how separable the label space actually is before
# anyone trains on it.
#
# Exactness: prototypes are the Q1.30 fixed-point means (the
# llm_embed_centroid discipline), cosines round to 6 dp (the
# sanctioned vector export), and margins are exported in INTEGER
# micro-units (round((own-other)*1e6) of already-rounded values — the
# same computation in both engines).
#
# Scale shape: the |labels|-row prototype table broadcasts; the
# scoring pass fans each vector out ×|labels| (a broadcast nested
# loop, |labels| small by construction) and aggregates per vec_id then
# per label — both combinable keyed shuffles.
# ---------------------------------------------------------------------------

_HARDNEG_ORACLE = f"""
WITH flat AS (
  SELECT label, i.i AS dim,
         CAST(floor(CAST(embedding AS DOUBLE[])[i.i] * {_Q30F}) AS BIGINT) AS q30
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) i
), m AS (
  SELECT label, dim,
         CAST(sum(q30) AS DOUBLE) / (count(*) * {_Q30F}) AS m
  FROM flat GROUP BY label, dim
), cent AS (
  SELECT label AS clabel, list(m ORDER BY dim) AS cv FROM m GROUP BY label
), scored AS (
  SELECT e.vec_id, e.label, c.clabel,
         {sql_cosine("CAST(e.embedding AS DOUBLE[])", "c.cv")} AS cos
  FROM embeddings e CROSS JOIN cent c
), per_vec AS (
  SELECT vec_id, label,
         max(CASE WHEN clabel = label THEN cos END) AS cos_own,
         max(CASE WHEN clabel <> label THEN cos END) AS cos_other
  FROM scored GROUP BY vec_id, label
), marg AS (
  SELECT label, cos_own, cos_other,
         CAST(round((cos_own - cos_other) * 1000000, 0) AS BIGINT)
           AS margin_micro
  FROM per_vec
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN cos_other > cos_own THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(sum(margin_micro) AS BIGINT) AS sum_margin_micro,
       CAST(min(margin_micro) AS BIGINT) AS min_margin_micro
FROM marg
GROUP BY label
"""


@register("llm_hard_negatives", _HARDNEG_ORACLE)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label separability audit: own-prototype vs best
    other-prototype cosine, margin mass in integer micro-units,
    violation counts (the hard negatives)."""
    e = table(spark, sf_dir, "embeddings")
    cent = q30_mean_arrays(
        e.select("label", as_double("embedding").alias("v")), "label"
    ).select(F.col("label").alias("clabel"), "cv")
    cos = F.round(
        dot(as_double("embedding"), F.col("cv"))
        / F.sqrt(norm_sq(as_double("embedding")) * norm_sq(F.col("cv"))),
        6,
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "clabel", cos.alias("cos")
    )
    per_vec = scored.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("cos"))).alias(
            "cos_own"
        ),
        F.max(F.when(F.col("clabel") != F.col("label"), F.col("cos"))).alias(
            "cos_other"
        ),
    )
    marg = per_vec.select(
        "label",
        "cos_own",
        "cos_other",
        F.round((F.col("cos_own") - F.col("cos_other")) * 1000000, 0)
        .cast("long")
        .alias("margin_micro"),
    )
    return marg.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("cos_other") > F.col("cos_own"), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
        F.sum("margin_micro").cast("long").alias("sum_margin_micro"),
        F.min("margin_micro").cast("long").alias("min_margin_micro"),
    )


# ---------------------------------------------------------------------------
# llm_ivf_nprobe_sweep — the nprobe tuning TABLE (llm_ivf_recall gives
# the nprobe=1 floor row-by-row; this prices the whole knob): for
# nprobe ∈ {1, 2, 4}, the candidate-scan cost (members of the top-
# nprobe cells by query↔centroid cosine) and recall@5 against the
# brute-force exact top-5.  The ANN-side twin of llm_lsh_tuning: one
# shared cell assignment, cells ranked once, every sweep row derived
# from the SAME small tables.
# ---------------------------------------------------------------------------

_NPROBE_SWEEP = (1, 2, 4)


def _nprobe_sweep_oracle() -> str:
    from maxscale_cdc_spark.operators.llm import _KMEANS_ITERS

    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({np} AS BIGINT) AS nprobe,
       CAST((SELECT count(*) FROM members WHERE crn <= {np}) AS BIGINT)
         AS n_candidates,
       CAST((SELECT count(*) FROM exact e JOIN members m
             ON e.vec_id = m.vec_id AND m.crn <= {np}) AS BIGINT) AS n_hits,
       CAST((SELECT count(*) FROM exact e JOIN members m
             ON e.vec_id = m.vec_id AND m.crn <= {np}) AS DOUBLE)
         / {_RECALL_K} AS recall_at_5"""
        for np in _NPROBE_SWEEP
    )
    return f"""
WITH {_sql_kmeans_ctes()},
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
cellrank AS (
  SELECT c.cid,
         row_number() OVER (ORDER BY {sql_cosine("q.qv", "c.cv")} DESC, c.cid)
           AS crn
  FROM cent{_KMEANS_ITERS} c CROSS JOIN q
),
members AS (
  SELECT a.vec_id, r.crn
  FROM a{_KMEANS_ITERS} a JOIN cellrank r USING (cid)
  WHERE a.vec_id <> 0
),
exact AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
           row_number() OVER (
             ORDER BY {sql_cosine("CAST(e.embedding AS DOUBLE[])", "q.qv")} DESC,
                      e.vec_id) AS rn
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
  ) WHERE rn <= {_RECALL_K}
)
{rows}
"""


@register("llm_ivf_nprobe_sweep", _nprobe_sweep_oracle())
def llm_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan cost vs recall@5 per nprobe: cells ranked ONCE by centroid
    cosine, candidates and hits derived per sweep row from the shared
    assignment — recall is the integer ratio n_hits/5."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached

    e = table(spark, sf_dir, "embeddings")
    cents, assigned = kmeans_cells_cached(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(as_double("embedding").alias("qv"))
    cellrank = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", cosine(F.col("cv"), F.col("qv")).alias("qsim"))
        .withColumn(
            "crn", F.row_number().over(W.orderBy(F.col("qsim").desc(), "cid"))
        )
        .select("cid", "crn")
    )
    members = (
        assigned.join(F.broadcast(cellrank), "cid")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "crn")
        .localCheckpoint(eager=True)
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", cosine(as_double("embedding"), F.col("qv")).alias("cos_sim")
        )
    )
    exact = (
        scored.orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_RECALL_K)
        .select("vec_id")
        .localCheckpoint(eager=True)
    )
    out = None
    for np in _NPROBE_SWEEP:
        cand = members.filter(F.col("crn") <= np)
        nc = cand.agg(F.count("*").cast("long").alias("n_candidates"))
        nh = cand.join(exact, "vec_id").agg(
            F.count("*").cast("long").alias("n_hits")
        )
        row = nc.crossJoin(nh).select(
            F.lit(np).cast("long").alias("nprobe"),
            "n_candidates",
            "n_hits",
            (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_5"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_NPROBE_SAMPLE_PCT = 40


def _nprobe_sweep_sampled_oracle() -> str:
    from maxscale_cdc_spark.functions.sample import sql_hash_sample
    from maxscale_cdc_spark.operators.llm import _N_CELLS

    inner = _nprobe_sweep_oracle().replace("FROM embeddings", "FROM embeddings_s")
    inner = inner.replace(
        "WITH",
        "WITH embeddings_s AS (SELECT * FROM embeddings WHERE "
        f"{sql_hash_sample('vec_id', _NPROBE_SAMPLE_PCT)} "
        f"OR vec_id < {_N_CELLS}),",
        1,
    )
    return f"""
SELECT nprobe, n_candidates, n_hits, recall_at_5,
       CAST({_NPROBE_SAMPLE_PCT} AS BIGINT) AS sample_pct
FROM ({inner}) t
"""


@register("llm_ivf_nprobe_sweep_sampled", _nprobe_sweep_sampled_oracle())
def llm_ivf_nprobe_sweep_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe knob table on a deterministic hash sample of the
    vector corpus (md5-bucket of vec_id < pct, `functions/sample.py`) —
    the 100 TB tuning path: cells, assignment, exact top-5, and every
    sweep row are computed over the SAME bounded sample, with the
    k-means seed rows (vec_id < K, which include the query vec_id 0)
    kept so the cell structure is well-defined under any sample
    fraction.  `sample_pct` is exported as part of the estimate."""
    from maxscale_cdc_spark.functions.sample import hash_sample
    from maxscale_cdc_spark.operators.llm import _N_CELLS, _kmeans_cells

    e = table(spark, sf_dir, "embeddings").filter(
        hash_sample("vec_id", _NPROBE_SAMPLE_PCT) | (F.col("vec_id") < _N_CELLS)
    )
    cents, assigned = _kmeans_cells(e)
    q = e.filter(F.col("vec_id") == 0).select(as_double("embedding").alias("qv"))
    cellrank = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", cosine(F.col("cv"), F.col("qv")).alias("qsim"))
        .withColumn(
            "crn", F.row_number().over(W.orderBy(F.col("qsim").desc(), "cid"))
        )
        .select("cid", "crn")
    )
    members = (
        assigned.join(F.broadcast(cellrank), "cid")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "crn")
        .localCheckpoint(eager=True)
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", cosine(as_double("embedding"), F.col("qv")).alias("cos_sim")
        )
    )
    exact = (
        scored.orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_RECALL_K)
        .select("vec_id")
        .localCheckpoint(eager=True)
    )
    out = None
    for np in _NPROBE_SWEEP:
        cand = members.filter(F.col("crn") <= np)
        nc = cand.agg(F.count("*").cast("long").alias("n_candidates"))
        nh = cand.join(exact, "vec_id").agg(
            F.count("*").cast("long").alias("n_hits")
        )
        row = nc.crossJoin(nh).select(
            F.lit(np).cast("long").alias("nprobe"),
            "n_candidates",
            "n_hits",
            (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_5"),
            F.lit(_NPROBE_SAMPLE_PCT).cast("long").alias("sample_pct"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# llm_ivf_incremental — INCREMENTAL index maintenance for the IVF
# vector store (the r7 verdict's ask #4: the llm_dedup_incremental
# signature-store pattern applied to ANN).  A 100 TB vector store
# cannot recluster per ingest: the new batch is assigned to the
# EXISTING cells (one broadcast-join pass — centroids are KB-sized, no
# Lloyd rounds), and the index publishes per-cell DRIFT so the owner
# can decide when a recluster is actually due:
#
#   - n_seed / n_new     cell mass before / from this batch
#   - growth_ratio       n_new / n_seed (integer-ratio double)
#   - disp_l1_*          L1 centroid displacement if the cell's
#                        centroid were recomputed over seed+new —
#                        in PURE INTEGER Q1.30 space: per dim,
#                        stored − combined = (snum·n_all − cnum·n_old)
#                        / (n_old·n_all) with snum/cnum the Q1.30
#                        coordinate sums; the exported numerator is
#                        Σ_dim |snum·n_all − cnum·n_old| (BIGINT,
#                        bounded by 64·n_old·n_all·2³⁰ — fine up to
#                        ~10⁵ vectors/cell; production rescales per
#                        cell), denominator n_old·n_all
#   - recluster_needed   batch mass > 20% of seed mass (pure-BIGINT
#                        cross-multiply) OR L1 displacement > 0.01
#                        real units (the double compare is the same
#                        expression tree in both engines)
#
# The old corpus slice is vec_id <= div(4·max,5) (the
# llm_dedup_incremental cutover); the oracle recomputes the OLD-only
# k-means (the src-parameterized CTE chain) and the batch assignment
# from scratch — certifying that incremental assignment == full
# recompute restricted to the batch.
# ---------------------------------------------------------------------------


def _ivf_incr_prefix() -> str:
    """Shared WITH-chain through the per-cell `cells`/`disp` tables —
    consumed by llm_ivf_incremental's final SELECT and extended by
    llm_ivf_rebalance_plan."""
    from maxscale_cdc_spark.operators.llm import _Q30, _sql_kmeans_ctes as _ctes

    flat = (
        "SELECT cid, i.i AS dim, CAST(floor(v[i.i] * {q30}) AS BIGINT) AS q "
        "FROM {src}, (SELECT unnest(generate_series(1, 64)) AS i) i"
    )
    return f"""
WITH cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
old_e AS (SELECT * FROM embeddings WHERE vec_id <= (SELECT c FROM cut)),
{_ctes(src="old_e")},
newv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id > (SELECT c FROM cut)
),
nassign AS (
  SELECT vec_id, v, cid FROM (
    SELECT n.vec_id, n.v, c.cid,
           row_number() OVER (PARTITION BY n.vec_id
                              ORDER BY {sql_cosine('n.v', 'c.cv')} DESC, c.cid) AS rn
    FROM newv n CROSS JOIN cent{_KMEANS_ITERS} c
  ) WHERE rn = 1
),
seed_flat AS ({flat.format(q30=_Q30, src=f'a{_KMEANS_ITERS}')}),
new_flat AS ({flat.format(q30=_Q30, src='nassign')}),
seed_dim AS (
  SELECT cid, dim, CAST(sum(q) AS BIGINT) AS snum,
         CAST(count(*) AS BIGINT) AS n_old
  FROM seed_flat GROUP BY cid, dim
),
all_dim AS (
  SELECT cid, dim, CAST(sum(q) AS BIGINT) AS cnum,
         CAST(count(*) AS BIGINT) AS n_all
  FROM (SELECT * FROM seed_flat UNION ALL SELECT * FROM new_flat)
  GROUP BY cid, dim
),
disp AS (
  SELECT s.cid,
         CAST(sum(abs(s.snum * a.n_all - a.cnum * s.n_old)) AS BIGINT)
           AS disp_l1_num,
         CAST(max(s.n_old * a.n_all) AS BIGINT) AS disp_den
  FROM seed_dim s JOIN all_dim a USING (cid, dim)
  GROUP BY s.cid
),
cseed AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_seed FROM a{_KMEANS_ITERS} GROUP BY cid),
cnew AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_new FROM nassign GROUP BY cid),
cells AS (
  SELECT coalesce(s.cid, n.cid) AS cid,
         CAST(coalesce(s.n_seed, 0) AS BIGINT) AS n_seed,
         CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new
  FROM cseed s FULL JOIN cnew n ON s.cid = n.cid
)"""


def _ivf_incr_oracle() -> str:
    from maxscale_cdc_spark.operators.llm import _Q30

    return f"""{_ivf_incr_prefix()}
SELECT c.cid, c.n_seed, c.n_new,
       CASE WHEN c.n_seed > 0 THEN CAST(c.n_new AS DOUBLE) / c.n_seed END
         AS growth_ratio,
       d.disp_l1_num, d.disp_den,
       CASE WHEN d.disp_den IS NOT NULL
            THEN CAST(d.disp_l1_num AS DOUBLE) / d.disp_den END AS disp_l1_q30,
       (5 * c.n_new > c.n_seed)
         OR (CAST(d.disp_l1_num AS DOUBLE) / d.disp_den > 0.01 * {_Q30})
         AS recluster_needed
FROM cells c LEFT JOIN disp d ON d.cid = c.cid
"""


def _ivf_batch_state(spark: SparkSession, sf_dir: str):
    """(cents, assigned, nassign) for the incremental-ingest pair:
    old-slice k-means reused read-only (llm._kmeans_cells — the helper
    backing the driver-green IVF queries, unchanged) plus the new
    batch assigned to the EXISTING centroids in one broadcast pass.
    The one driver read is the scalar cutover (the
    llm_dedup_incremental pattern)."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached_cut

    e = wide_table(spark, sf_dir, "embeddings")
    cents, assigned, cut = kmeans_cells_cached_cut(spark, sf_dir)
    newv = e.filter(F.col("vec_id") > cut).select(
        "vec_id", as_double("embedding").alias("v")
    )
    scored = newv.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "cid", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
    nassign = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )
    return cents, assigned, nassign


def _ivf_cells(assigned: DataFrame, nassign: DataFrame) -> DataFrame:
    """(cid, n_seed, n_new) with absent sides as 0 — the per-cell mass
    table both maintenance queries read."""
    cseed = assigned.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_seed")
    )
    cnew = nassign.groupBy("cid").agg(F.count("*").cast("long").alias("n_new"))
    return cseed.join(cnew, "cid", "full").select(
        "cid",
        F.coalesce("n_seed", F.lit(0)).cast("long").alias("n_seed"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )


@register("llm_ivf_incremental", _ivf_incr_oracle())
def llm_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell drift table for an incremental IVF ingest (see block
    comment): displacement in pure integer Q1.30 space."""
    cents, assigned, nassign = _ivf_batch_state(spark, sf_dir)

    def flat(df: DataFrame) -> DataFrame:
        return df.select("cid", F.posexplode("v").alias("dim0", "val")).select(
            "cid",
            (F.col("dim0") + 1).alias("dim"),
            F.floor(F.col("val") * 1073741824.0).cast("long").alias("q"),
        )

    seed_flat = flat(assigned)
    new_flat = flat(nassign)
    seed_dim = seed_flat.groupBy("cid", "dim").agg(
        F.sum("q").cast("long").alias("snum"),
        F.count("*").cast("long").alias("n_old"),
    )
    all_dim = seed_flat.unionByName(new_flat).groupBy("cid", "dim").agg(
        F.sum("q").cast("long").alias("cnum"),
        F.count("*").cast("long").alias("n_all"),
    )
    disp = (
        seed_dim.join(all_dim, ["cid", "dim"])
        .groupBy("cid")
        .agg(
            F.sum(
                F.abs(F.col("snum") * F.col("n_all") - F.col("cnum") * F.col("n_old"))
            )
            .cast("long")
            .alias("disp_l1_num"),
            F.max(F.col("n_old") * F.col("n_all")).cast("long").alias("disp_den"),
        )
    )
    cells = _ivf_cells(assigned, nassign)
    out = cells.join(disp, "cid", "left")
    return out.select(
        "cid",
        "n_seed",
        "n_new",
        F.when(
            F.col("n_seed") > 0, F.col("n_new").cast("double") / F.col("n_seed")
        ).alias("growth_ratio"),
        "disp_l1_num",
        "disp_den",
        F.when(
            F.col("disp_den").isNotNull(),
            F.col("disp_l1_num").cast("double") / F.col("disp_den"),
        ).alias("disp_l1_q30"),
        (
            (5 * F.col("n_new") > F.col("n_seed"))
            | (
                F.col("disp_l1_num").cast("double") / F.col("disp_den")
                > F.lit(0.01) * F.lit(1073741824.0)
            )
        ).alias("recluster_needed"),
    )


# ---------------------------------------------------------------------------
# llm_ivf_rebalance_plan — the ACTION half of incremental index
# maintenance: given post-ingest cell masses (llm_ivf_incremental's
# cells table), emit the rebalance decision per cell the way a 100 TB
# vector store schedules shard surgery:
#
#   split  if  n_total·K > 2·N      (cell above 2× the mean — the
#                                    partition-skew rule, pure BIGINT)
#   merge  if  4·n_total·K < N      (cell below ¼ of the mean) — with
#                                    merge_target = the NEAREST OTHER
#                                    centroid (cosine desc, cid asc:
#                                    the deterministic argmax over a
#                                    K×K centroid table, KB-sized)
#   keep   otherwise
#
# All thresholds integer cross-multiplies; the centroid-pair cosine is
# the same 6-dp-rounded expression tree in both engines.  The oracle
# recomputes the whole chain (old-slice k-means, batch assignment,
# cell masses, nearest-centroid table, action rules) from scratch.
# ---------------------------------------------------------------------------


def _ivf_rebalance_oracle() -> str:
    return f"""{_ivf_incr_prefix()},
tot AS (
  SELECT CAST(sum(n_seed + n_new) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k
  FROM cells
),
cpair AS (
  SELECT a.cid, b.cid AS other,
         row_number() OVER (PARTITION BY a.cid
                            ORDER BY {sql_cosine('a.cv', 'b.cv')} DESC, b.cid) AS rn
  FROM cent{_KMEANS_ITERS} a JOIN cent{_KMEANS_ITERS} b ON a.cid <> b.cid
),
nearest AS (SELECT cid, CAST(other AS BIGINT) AS other FROM cpair WHERE rn = 1)
SELECT c.cid,
       CAST(c.n_seed + c.n_new AS BIGINT) AS n_total,
       CASE WHEN (c.n_seed + c.n_new) * t.k > 2 * t.n THEN 'split'
            WHEN 4 * (c.n_seed + c.n_new) * t.k < t.n THEN 'merge'
            ELSE 'keep' END AS action,
       CASE WHEN 4 * (c.n_seed + c.n_new) * t.k < t.n THEN nr.other END
         AS merge_target
FROM cells c CROSS JOIN tot t LEFT JOIN nearest nr ON nr.cid = c.cid
"""


@register("llm_ivf_rebalance_plan", _ivf_rebalance_oracle())
def llm_ivf_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split/merge/keep plan per IVF cell after the incremental ingest
    (see block comment)."""
    cents, assigned, nassign = _ivf_batch_state(spark, sf_dir)
    cells = _ivf_cells(assigned, nassign)
    tot = cells.agg(
        F.sum(F.col("n_seed") + F.col("n_new")).cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    a = cents.select(F.col("cid"), F.col("cv"))
    b = cents.select(F.col("cid").alias("other"), F.col("cv").alias("cv_b"))
    pair = a.join(F.broadcast(b), F.col("cid") != F.col("other")).select(
        "cid", "other", cosine(F.col("cv"), F.col("cv_b")).alias("sim")
    )
    w = W.partitionBy("cid").orderBy(F.col("sim").desc(), "other")
    nearest = (
        pair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("other").cast("long").alias("other"))
    )
    n_total = F.col("n_seed") + F.col("n_new")
    out = cells.crossJoin(F.broadcast(tot)).join(
        F.broadcast(nearest), "cid", "left"
    )
    split_c = n_total * F.col("k") > 2 * F.col("n")
    merge_c = 4 * n_total * F.col("k") < F.col("n")
    return out.select(
        "cid",
        n_total.cast("long").alias("n_total"),
        F.when(split_c, F.lit("split"))
        .when(merge_c, F.lit("merge"))
        .otherwise(F.lit("keep"))
        .alias("action"),
        F.when(merge_c, F.col("other")).alias("merge_target"),
    )


# ---------------------------------------------------------------------------
# llm_ivf_rebalance_apply — EXECUTE the rebalance plan (the r8
# verdict's action→state closure): llm_ivf_rebalance_plan only EMITS
# split/merge/keep; this op performs the surgery and certifies the
# post-surgery index.
#
#   split  cells: 2-way Lloyd inside the cell (seeds = the members
#          with min / max vec_id — deterministic; `_SPLIT_ITERS`
#          rounds of assign-by-cosine / Q1.30-mean update, the
#          _kmeans_cells recipe scoped per cell) → two sub-centroids
#          at cid_out = 2·cid and 2·cid + 1 (a singleton sub simply
#          produces no centroid row).
#   merge  cells: centroid REMOVED; members are routed by the global
#          post-surgery nearest-centroid reassignment (the plan's
#          merge_target is advisory — executing the merge as
#          centroid-removal + reassignment is what a production
#          index does, and avoids cascades when the target itself
#          merges).
#   keep   cells: centroid unchanged, cid_out = 2·cid.
#
# The audit half: recall@5 vs brute force over a deterministic query
# sample (the first `_APPLY_NQ` new-batch vector ids — a pure
# predicate, no sort), BEFORE (old centroids, old assignment) and
# AFTER (new centroids, full reassignment); `not_worse` exports the
# ≥ comparison.  Output: one row per post-surgery centroid with its
# member count plus the constant audit columns (the chosen_bands
# export pattern).
#
# Scale: every stage is a broadcast-assignment (centroid tables are
# KB-sized) or a cell-bounded aggregation; the brute-force side is
# sample-bounded (|Q|·N) by construction — the llm_ivf_recall rule
# that an index's recall is priced on a query SAMPLE, never
# corpus-wide.  At 100 TB only split/merge cells' members actually
# move; the full reassignment here doubles as the proof that kept
# cells' members stay put (their nearest centroid is unchanged).
# The oracle recomputes the whole chain — old-slice k-means, batch
# assignment, plan, per-cell 2-means, reassignment, both recall
# numbers — from scratch in SQL.
# ---------------------------------------------------------------------------

_SPLIT_ITERS = 2
_APPLY_NQ = 8


def _ivf_apply_oracle() -> str:
    from maxscale_cdc_spark.operators.llm import _Q30

    k = _KMEANS_ITERS

    def sql_assign(src: str, cent: str) -> str:
        return (
            f"SELECT vec_id, v, cid, sub FROM ("
            f"SELECT m.vec_id, m.v, m.cid, s.sub, "
            f"row_number() OVER (PARTITION BY m.cid, m.vec_id "
            f"ORDER BY {sql_cosine('m.v', 's.cv')} DESC, s.sub) AS rn "
            f"FROM {src} m JOIN {cent} s ON s.cid = m.cid) WHERE rn = 1"
        )

    def sql_update(src: str) -> str:
        return (
            f"SELECT cid, sub, i.i AS dim, "
            f"CAST(SUM(CAST(floor(v[i.i] * {_Q30}) AS BIGINT)) AS DOUBLE)"
            f" / (COUNT(*) * {_Q30}) AS m "
            f"FROM {src}, (SELECT unnest(generate_series(1, 64)) AS i) i "
            f"GROUP BY cid, sub, i.i"
        )

    lloyd = [f"sa0 AS ({sql_assign('sm', 'seeds')})"]
    for it in range(_SPLIT_ITERS):
        lloyd.append(f"su{it} AS ({sql_update(f'sa{it}')})")
        lloyd.append(
            f"scent{it + 1} AS (SELECT cid, sub, list(m ORDER BY dim) AS cv "
            f"FROM su{it} GROUP BY cid, sub)"
        )
        if it + 1 < _SPLIT_ITERS:
            lloyd.append(f"sa{it + 1} AS ({sql_assign('sm', f'scent{it + 1}')})")
    lloyd_sql = ",\n".join(lloyd)

    return f"""{_ivf_incr_prefix()},
tot AS (
  SELECT CAST(sum(n_seed + n_new) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k
  FROM cells
),
plan AS (
  SELECT c.cid,
         CASE WHEN (c.n_seed + c.n_new) * t.k > 2 * t.n THEN 'split'
              WHEN 4 * (c.n_seed + c.n_new) * t.k < t.n THEN 'merge'
              ELSE 'keep' END AS action
  FROM cells c CROSS JOIN tot t
),
allv AS MATERIALIZED (
  SELECT vec_id, v, cid FROM a{k}
  UNION ALL
  SELECT vec_id, v, cid FROM nassign
),
sm AS (
  SELECT a.vec_id, a.v, a.cid FROM allv a
  JOIN plan p ON p.cid = a.cid AND p.action = 'split'
),
seeds AS (
  SELECT cid, 0 AS sub, arg_min(v, vec_id) AS cv FROM sm GROUP BY cid
  UNION ALL
  SELECT cid, 1 AS sub, arg_max(v, vec_id) AS cv FROM sm GROUP BY cid
),
{lloyd_sql},
newcent AS MATERIALIZED (
  SELECT CAST(2 * c.cid AS BIGINT) AS cid_out,
         CAST(c.cid AS BIGINT) AS src_cid, 'kept' AS kind, c.cv
  FROM cent{k} c JOIN plan p ON p.cid = c.cid AND p.action = 'keep'
  UNION ALL
  SELECT CAST(2 * cid + sub AS BIGINT), CAST(cid AS BIGINT), 'split', cv
  FROM scent{_SPLIT_ITERS}
),
post AS MATERIALIZED (
  SELECT vec_id, cid_out FROM (
    SELECT a.vec_id, n.cid_out,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {sql_cosine('a.v', 'n.cv')} DESC,
                                       n.cid_out) AS rn
    FROM allv a CROSS JOIN newcent n
  ) WHERE rn = 1
),
members AS (
  SELECT cid_out, CAST(count(*) AS BIGINT) AS n_members
  FROM post GROUP BY cid_out
),
qs AS (
  SELECT vec_id AS qid, v AS qv, cid AS q_pre FROM allv
  WHERE vec_id > (SELECT c FROM cut)
    AND vec_id <= (SELECT c FROM cut) + {_APPLY_NQ}
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {sql_cosine('e.v', 'q.qv')} DESC,
                                       e.vec_id) AS rn
    FROM allv e JOIN qs q ON e.vec_id <> q.qid
  ) WHERE rn <= {_RECALL_K}
),
recall AS (
  SELECT CAST(coalesce(sum(CASE WHEN ep.cid = q.q_pre THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS recall_pre_num,
         CAST(coalesce(sum(CASE WHEN pp.cid_out = qp.cid_out THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS recall_post_num,
         CAST(count(*) AS BIGINT) AS recall_den
  FROM brute b
  JOIN qs q ON q.qid = b.qid
  JOIN allv ep ON ep.vec_id = b.vec_id
  JOIN post pp ON pp.vec_id = b.vec_id
  JOIN post qp ON qp.vec_id = b.qid
)
SELECT n.cid_out, n.src_cid, n.kind,
       CAST(coalesce(m.n_members, 0) AS BIGINT) AS n_members,
       r.recall_pre_num, r.recall_post_num, r.recall_den,
       (r.recall_post_num >= r.recall_pre_num) AS not_worse
FROM newcent n
LEFT JOIN members m ON m.cid_out = n.cid_out
CROSS JOIN recall r
"""


def _split_cells_lloyd(sm: DataFrame) -> DataFrame:
    """2-way Lloyd inside each split cell (see block comment): returns
    the final sub-centroids (cid, sub, cv).  Each round is one
    broadcast-join assignment plus one keyed Q1.30-mean aggregation —
    _kmeans_cells scoped per cell; sub-centroid tables are KB-sized."""
    seeds = (
        sm.groupBy("cid")
        .agg(F.min_by("v", "vec_id").alias("cv"))
        .select("cid", F.lit(0).alias("sub"), "cv")
        .unionByName(
            sm.groupBy("cid")
            .agg(F.max_by("v", "vec_id").alias("cv"))
            .select("cid", F.lit(1).alias("sub"), "cv")
        )
    )

    def assign(cent: DataFrame) -> DataFrame:
        scored = sm.join(F.broadcast(cent), "cid").select(
            "cid", "vec_id", "v", "sub",
            cosine(F.col("v"), F.col("cv")).alias("sim"),
        )
        w = W.partitionBy("cid", "vec_id").orderBy(F.col("sim").desc(), "sub")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cid", "vec_id", "v", "sub")
        )

    def update(a: DataFrame) -> DataFrame:
        flat = a.select(
            "cid", "sub", F.posexplode("v").alias("dim0", "val")
        ).select(
            "cid", "sub",
            (F.col("dim0") + 1).alias("dim"),
            F.floor(F.col("val") * 1073741824.0).cast("long").alias("q30"),
        )
        m = flat.groupBy("cid", "sub", "dim").agg(
            (F.sum("q30").cast("double") / (F.count("*") * F.lit(1073741824.0))).alias("m")
        )
        return m.groupBy("cid", "sub").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("cv")
        )

    cents = seeds
    a = assign(cents)
    for _ in range(_SPLIT_ITERS):
        cents = update(a)
        a = assign(cents)
    return cents


@register("llm_ivf_rebalance_apply", _ivf_apply_oracle())
def llm_ivf_rebalance_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the IVF rebalance plan and audit the post-surgery index
    (see block comment).  One row per post-surgery centroid plus
    constant recall@{_RECALL_K} audit columns; `not_worse` certifies
    the surgery did not degrade recall on the query sample."""
    cents, _, _ = _ivf_batch_state(spark, sf_dir)
    # stage the Lloyd-iterated centroid table ONCE and re-derive both
    # assignments from it with single broadcast passes (bit-identical:
    # _kmeans_cells' returned assignment IS assign(final cents), and
    # _ivf_batch_state's nassign IS the same argmax over the new
    # slice) — downstream the state feeds the plan, the split Lloyd,
    # the post reassignment, and the brute-force audit; unstaged, each
    # consumer re-runs the whole Lloyd chain (CLAUDE.md rule 5;
    # measured 36 s → 6 s at sf0.01)
    # eager (anti-convoy rule, see autotune.trigram_classes16): the
    # staged cents/assignments each feed several CONCURRENT downstream
    # stages (plan + split Lloyd + post reassignment + brute audit)
    cents = cents.localCheckpoint(eager=True)
    e = wide_table(spark, sf_dir, "embeddings")
    # same cutover scalar _ivf_batch_state derives (one config read)
    cut = int(
        e.agg(F.expr("div(max(vec_id) * 4, 5)").alias("c")).collect()[0]["c"]
    )
    vecs = e.select("vec_id", as_double("embedding").alias("v"))

    def bassign(df: DataFrame) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cid", cosine(F.col("v"), F.col("cv")).alias("sim")
        )
        w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", "cid")
        )

    assigned = bassign(vecs.filter(F.col("vec_id") <= cut)).localCheckpoint(
        eager=True
    )
    nassign = bassign(vecs.filter(F.col("vec_id") > cut)).localCheckpoint(
        eager=True
    )
    cells = _ivf_cells(assigned, nassign)
    tot = cells.agg(
        F.sum(F.col("n_seed") + F.col("n_new")).cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    n_total = F.col("n_seed") + F.col("n_new")
    plan = cells.crossJoin(F.broadcast(tot)).select(
        "cid",
        F.when(n_total * F.col("k") > 2 * F.col("n"), F.lit("split"))
        .when(4 * n_total * F.col("k") < F.col("n"), F.lit("merge"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )
    allv = assigned.unionByName(nassign)
    sm = allv.join(
        F.broadcast(plan.filter(F.col("action") == "split").select("cid")),
        "cid",
    ).select("vec_id", "v", "cid")
    scents = _split_cells_lloyd(sm)
    newcent = (
        cents.join(
            F.broadcast(plan.filter(F.col("action") == "keep").select("cid")),
            "cid",
        )
        .select(
            (F.col("cid") * 2).cast("long").alias("cid_out"),
            F.col("cid").cast("long").alias("src_cid"),
            F.lit("kept").alias("kind"),
            "cv",
        )
        .unionByName(
            scents.select(
                (F.col("cid") * 2 + F.col("sub")).cast("long").alias("cid_out"),
                F.col("cid").cast("long").alias("src_cid"),
                F.lit("split").alias("kind"),
                "cv",
            )
        )
    )
    post = (
        allv.select("vec_id", "v")
        .crossJoin(F.broadcast(newcent.select("cid_out", "cv")))
        .select(
            "vec_id", "cid_out", cosine(F.col("v"), F.col("cv")).alias("sim")
        )
    )
    wp = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid_out")
    post = (
        post.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid_out")
    )
    members = post.groupBy("cid_out").agg(
        F.count("*").cast("long").alias("n_members")
    )
    qs = allv.filter(
        (F.col("vec_id") > cut) & (F.col("vec_id") <= cut + _APPLY_NQ)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("cid").alias("q_pre"),
    )
    brute = (
        allv.select("vec_id", "v", F.col("cid").alias("e_pre"))
        .join(F.broadcast(qs), F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "q_pre", "vec_id", "e_pre",
            cosine(F.col("v"), F.col("qv")).alias("sim"),
        )
    )
    wb = W.partitionBy("qid").orderBy(F.col("sim").desc(), "vec_id")
    brute = (
        brute.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= _RECALL_K)
        .select("qid", "q_pre", "vec_id", "e_pre")
    )
    ppost = post.select(
        F.col("vec_id").alias("p_vid"), F.col("cid_out").alias("e_post")
    )
    qpost = post.select(
        F.col("vec_id").alias("pq_vid"), F.col("cid_out").alias("q_post")
    )
    recall = (
        brute.join(ppost, F.col("vec_id") == F.col("p_vid"))
        .join(qpost, F.col("qid") == F.col("pq_vid"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("e_pre") == F.col("q_pre"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("recall_pre_num"),
            F.coalesce(
                F.sum(F.when(F.col("e_post") == F.col("q_post"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("recall_post_num"),
            F.count("*").cast("long").alias("recall_den"),
        )
    )
    return (
        newcent.select("cid_out", "src_cid", "kind")
        .join(members, "cid_out", "left")
        .crossJoin(F.broadcast(recall))
        .select(
            "cid_out",
            "src_cid",
            "kind",
            F.coalesce("n_members", F.lit(0)).cast("long").alias("n_members"),
            "recall_pre_num",
            "recall_post_num",
            "recall_den",
            (F.col("recall_post_num") >= F.col("recall_pre_num")).alias("not_worse"),
        )
    )


# ---------------------------------------------------------------------------
# llm_ivf_forget — RTBF deletion applied to the SERVING index (the r13
# verdict's ask #3): the right-to-be-forgotten direction exists for the
# dedup signature store (llm_dedup_store_forget) but a 100 TB corpus
# under takedown obligations must forget from the VECTOR INDEX too, or
# deleted content keeps being served as a search result.  A deletion
# batch (vec_id % 13 = 5, the store-forget selector) is applied as a
# PURE PROJECTION of the stored index — drop the members, keep the
# centroids — because re-running Lloyd per takedown batch is exactly
# what a production store cannot afford.  The op emits the post-forget
# maintenance table the index owner acts on:
#
#   n_before / n_del / n_after   cell mass before / removed / surviving
#   disp_l1_*                    L1 displacement of the stored centroid
#                                vs the survivor-recomputed mean, in
#                                PURE INTEGER Q1.30 space (the
#                                llm_ivf_incremental arithmetic): per
#                                dim stored − survivor = (anum·n_after
#                                − snum·n_before)/(n_before·n_after)
#                                with anum/snum the Q1.30 coordinate
#                                sums; numerator bounded by
#                                64·n_before·n_after·2³⁰ — fine to
#                                ~10⁵ vectors/cell, the documented
#                                incremental-op bound (production
#                                rescales per cell)
#   action / merge_target        the rebalance plan's MERGE arm fed
#                                with the SHRUNKEN masses: 'drop' if
#                                the cell emptied, 'merge' into the
#                                nearest other centroid (cosine DESC,
#                                cid — the deterministic argmax over
#                                the KB-sized K×K centroid table) if
#                                4·n_after·K < N_after, else 'keep'
#
# Deletion-as-projection is PROVABLY equal to a from-scratch assignment
# of the survivors against the stored centroids (per-vector argmax is
# a pure function of the centroid table) — pinned by a props test; the
# oracle recomputes the full chain (Lloyd, forget filter, Q1.30 sums,
# merge rules) from scratch.  Rides the kmeans_cells_cached family
# chain.  At 100 TB: the projection is an anti-join on the partitioned
# assignment (touched cells only), the displacement is one
# map-side-combinable keyed agg, and the merge table is KB-sized.
# ---------------------------------------------------------------------------

_FORGET_MOD = 13
_FORGET_RES = 5
_FORGET_QMOD = 100  # the probe-query modulus (_ANNJ_QMOD, defined later in file)


def _ivf_forget_prefix() -> str:
    """Shared WITH-chain body through surv / cells / tot — consumed by
    llm_ivf_forget (which extends it with the displacement + nearest
    tables) and llm_ivf_forget_merge_apply (which extends it with the
    post-merge reassignment).  One definition, two oracles."""
    k = _KMEANS_ITERS
    return f"""{_sql_kmeans_ctes()},
surv AS (SELECT * FROM a{k} WHERE vec_id % {_FORGET_MOD} <> {_FORGET_RES}),
cb AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_before FROM a{k} GROUP BY cid),
ca AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_after FROM surv GROUP BY cid),
cells AS (
  SELECT cb.cid, cb.n_before,
         CAST(coalesce(ca.n_after, 0) AS BIGINT) AS n_after
  FROM cb LEFT JOIN ca ON ca.cid = cb.cid
),
tot AS (
  SELECT CAST(sum(n_after) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k
  FROM cells
)"""


def _ivf_forget_oracle() -> str:
    from maxscale_cdc_spark.operators.llm import _Q30

    flat = (
        f"SELECT cid, i.i AS dim, CAST(floor(v[i.i] * {_Q30}) AS BIGINT) AS q "
        "FROM {src}, (SELECT unnest(generate_series(1, 64)) AS i) i"
    )
    k = _KMEANS_ITERS
    return f"""
WITH {_ivf_forget_prefix()},
all_flat AS ({flat.format(src=f'a{k}')}),
surv_flat AS ({flat.format(src='surv')}),
all_dim AS (
  SELECT cid, dim, CAST(sum(q) AS BIGINT) AS anum,
         CAST(count(*) AS BIGINT) AS nb
  FROM all_flat GROUP BY cid, dim
),
surv_dim AS (
  SELECT cid, dim, CAST(sum(q) AS BIGINT) AS snum,
         CAST(count(*) AS BIGINT) AS na
  FROM surv_flat GROUP BY cid, dim
),
disp AS (
  SELECT a.cid,
         CAST(sum(abs(a.anum * s.na - s.snum * a.nb)) AS BIGINT)
           AS disp_l1_num,
         CAST(max(a.nb * s.na) AS BIGINT) AS disp_den
  FROM all_dim a JOIN surv_dim s USING (cid, dim)
  GROUP BY a.cid
),
cpair AS (
  SELECT a.cid, b.cid AS other,
         row_number() OVER (PARTITION BY a.cid
                            ORDER BY {sql_cosine('a.cv', 'b.cv')} DESC, b.cid) AS rn
  FROM cent{k} a JOIN cent{k} b ON a.cid <> b.cid
),
nearest AS (SELECT cid, CAST(other AS BIGINT) AS other FROM cpair WHERE rn = 1)
SELECT c.cid, c.n_before,
       CAST(c.n_before - c.n_after AS BIGINT) AS n_del,
       c.n_after,
       d.disp_l1_num, d.disp_den,
       CASE WHEN d.disp_den IS NOT NULL
            THEN CAST(d.disp_l1_num AS DOUBLE) / d.disp_den END AS disp_l1_q30,
       CASE WHEN c.n_after = 0 THEN 'drop'
            WHEN 4 * c.n_after * t.k < t.n THEN 'merge'
            ELSE 'keep' END AS action,
       CASE WHEN c.n_after > 0 AND 4 * c.n_after * t.k < t.n THEN nr.other END
         AS merge_target
FROM cells c CROSS JOIN tot t
LEFT JOIN disp d ON d.cid = c.cid
LEFT JOIN nearest nr ON nr.cid = c.cid
"""


@register("llm_ivf_forget", _ivf_forget_oracle())
def llm_ivf_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply an RTBF deletion batch to the IVF index by projection
    (members dropped, centroids kept) and emit the per-cell
    maintenance table: shrunken masses, Q1.30 centroid displacement,
    and the merge-arm plan (see block comment)."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached

    cents, assigned = kmeans_cells_cached(spark, sf_dir)
    surv = assigned.filter(F.col("vec_id") % _FORGET_MOD != _FORGET_RES)

    def flat(df: DataFrame) -> DataFrame:
        return df.select("cid", F.posexplode("v").alias("dim0", "val")).select(
            "cid",
            (F.col("dim0") + 1).alias("dim"),
            F.floor(F.col("val") * 1073741824.0).cast("long").alias("q"),
        )

    all_dim = flat(assigned).groupBy("cid", "dim").agg(
        F.sum("q").cast("long").alias("anum"),
        F.count("*").cast("long").alias("nb"),
    )
    surv_dim = flat(surv).groupBy("cid", "dim").agg(
        F.sum("q").cast("long").alias("snum"),
        F.count("*").cast("long").alias("na"),
    )
    disp = (
        all_dim.join(surv_dim, ["cid", "dim"])
        .groupBy("cid")
        .agg(
            F.sum(F.abs(F.col("anum") * F.col("na") - F.col("snum") * F.col("nb")))
            .cast("long")
            .alias("disp_l1_num"),
            F.max(F.col("nb") * F.col("na")).cast("long").alias("disp_den"),
        )
    )
    cb = assigned.groupBy("cid").agg(F.count("*").cast("long").alias("n_before"))
    ca = surv.groupBy("cid").agg(F.count("*").cast("long").alias("n_after"))
    cells = cb.join(ca, "cid", "left").select(
        "cid",
        "n_before",
        F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
    )
    tot = cells.agg(
        F.sum("n_after").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    a = cents.select("cid", "cv")
    b = cents.select(F.col("cid").alias("other"), F.col("cv").alias("cv_b"))
    pair = a.join(F.broadcast(b), F.col("cid") != F.col("other")).select(
        "cid", "other", cosine(F.col("cv"), F.col("cv_b")).alias("sim")
    )
    wn = W.partitionBy("cid").orderBy(F.col("sim").desc(), "other")
    nearest = (
        pair.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("other").cast("long").alias("other"))
    )
    merge_pred = 4 * F.col("n_after") * F.col("k") < F.col("n")
    return (
        cells.crossJoin(F.broadcast(tot))
        .join(disp, "cid", "left")
        .join(F.broadcast(nearest), "cid", "left")
        .select(
            "cid",
            "n_before",
            (F.col("n_before") - F.col("n_after")).cast("long").alias("n_del"),
            "n_after",
            "disp_l1_num",
            "disp_den",
            F.when(
                F.col("disp_den").isNotNull(),
                F.col("disp_l1_num").cast("double") / F.col("disp_den"),
            ).alias("disp_l1_q30"),
            F.when(F.col("n_after") == 0, F.lit("drop"))
            .when(merge_pred, F.lit("merge"))
            .otherwise(F.lit("keep"))
            .alias("action"),
            F.when((F.col("n_after") > 0) & merge_pred, F.col("other")).alias(
                "merge_target"
            ),
        )
    )


# ---------------------------------------------------------------------------
# llm_ivf_forget_merge_apply — EXECUTE the forget plan's merge arm:
# the detect→plan→apply closure for the RTBF direction (the family
# convention: llm_ivf_rebalance_plan→apply for growth, this pair for
# shrinkage).  After the deletion projection, cells below ¼ of the
# mean are uneconomic to probe (same integer rule as the plan);
# following llm_ivf_rebalance_apply's discipline the apply RETIRES
# the merge cells' centroids (and the emptied 'drop' cells'), keeps
# the 'keep' centroids verbatim, and FULLY REASSIGNS the survivors
# over the post-merge centroid set — so absorbed members land at
# their nearest surviving centroid by the same argmax rule that
# built the index (no per-cell special-casing to go wrong).
#
# Output: one row per post-merge centroid (member count + how many
# members it ABSORBED from retired cells) with constant audit
# columns: retired-cell counts and the recall@5 containment audit on
# the survivor query sample (vec_id % 100) — the fraction of each
# query's brute-force top-5 living in the query's own cell, before
# vs after the merge (`not_worse` exported, the rebalance_apply
# convention: merging small cells into their argmax-nearest homes
# typically RAISES 1-probe containment).
#
# Scale: the reassignment is one broadcast argmax over the KB-sized
# post centroid table — only retired cells' members actually move
# (kept cells' argmax is unchanged only if their centroid still wins;
# the full reassignment proves it rather than assuming it); the
# brute-force audit is oracle-scale, not the serving path.
# ---------------------------------------------------------------------------


def _ivf_forget_apply_oracle() -> str:
    k = _KMEANS_ITERS
    cos = sql_cosine("s.v", "q.qv")
    return f"""
WITH {_ivf_forget_prefix()},
keepc AS (
  SELECT c.cid FROM cells c CROSS JOIN tot t
  WHERE c.n_after > 0 AND NOT (4 * c.n_after * t.k < t.n)
),
kcent AS (SELECT c.cid, c.cv FROM cent{k} c JOIN keepc ON keepc.cid = c.cid),
reass AS (
  SELECT vec_id, v, cid, pre_cid FROM (
    SELECT s.vec_id, s.v, kc.cid, s.cid AS pre_cid,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY {sql_cosine('s.v', 'kc.cv')} DESC, kc.cid) AS rn
    FROM surv s CROSS JOIN kcent kc
  ) WHERE rn = 1
),
post AS (
  SELECT cid,
         CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum(CASE WHEN pre_cid <> cid THEN 1 ELSE 0 END) AS BIGINT)
           AS n_absorbed
  FROM reass GROUP BY cid
),
retired AS (
  SELECT
    CAST(sum(CASE WHEN c.n_after = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_dropped_cells,
    CAST(sum(CASE WHEN c.n_after > 0 AND 4 * c.n_after * t.k < t.n
             THEN 1 ELSE 0 END) AS BIGINT) AS n_merged_cells
  FROM cells c CROSS JOIN tot t
),
qs AS (SELECT vec_id AS qid, v AS qv FROM surv WHERE vec_id % {_FORGET_QMOD} = 0),
b5 AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, s.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {cos} DESC, s.vec_id) AS rn
    FROM surv s JOIN qs q ON s.vec_id <> q.qid
  ) WHERE rn <= {_RECALL_K}
),
qpre AS (SELECT vec_id AS qid, cid AS q_pre FROM surv WHERE vec_id % {_FORGET_QMOD} = 0),
qpost AS (SELECT vec_id AS qid, cid AS q_post FROM reass WHERE vec_id % {_FORGET_QMOD} = 0),
epre AS (SELECT vec_id, cid AS e_pre FROM surv),
epost AS (SELECT vec_id, cid AS e_post FROM reass),
recall AS (
  SELECT
    CAST(sum(CASE WHEN ep.e_pre = qp.q_pre THEN 1 ELSE 0 END) AS BIGINT)
      AS recall_pre_num,
    CAST(sum(CASE WHEN eo.e_post = qo.q_post THEN 1 ELSE 0 END) AS BIGINT)
      AS recall_post_num,
    CAST(count(*) AS BIGINT) AS recall_den
  FROM b5 b
  JOIN qpre qp ON qp.qid = b.qid
  JOIN qpost qo ON qo.qid = b.qid
  JOIN epre ep ON ep.vec_id = b.vec_id
  JOIN epost eo ON eo.vec_id = b.vec_id
)
SELECT p.cid, p.n_members, p.n_absorbed,
       rt.n_dropped_cells, rt.n_merged_cells,
       r.recall_pre_num, r.recall_post_num, r.recall_den,
       (r.recall_post_num >= r.recall_pre_num) AS not_worse
FROM post p CROSS JOIN retired rt CROSS JOIN recall r
"""


@register("llm_ivf_forget_merge_apply", _ivf_forget_apply_oracle())
def llm_ivf_forget_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the forget plan's merge arm: retire merge/drop cells,
    reassign survivors over the post-merge centroid set, audit 1-probe
    recall containment before/after (see block comment)."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached

    cents, assigned = kmeans_cells_cached(spark, sf_dir)
    surv = assigned.filter(
        F.col("vec_id") % _FORGET_MOD != _FORGET_RES
    ).localCheckpoint(eager=True)
    cb = assigned.groupBy("cid").agg(F.count("*").cast("long").alias("n_before"))
    ca = surv.groupBy("cid").agg(F.count("*").cast("long").alias("n_after"))
    cells = cb.join(ca, "cid", "left").select(
        "cid",
        "n_before",
        F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
    )
    tot = cells.agg(
        F.sum("n_after").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    ct = cells.crossJoin(F.broadcast(tot))
    merge_pred = 4 * F.col("n_after") * F.col("k") < F.col("n")
    keepc = ct.filter(
        (F.col("n_after") > 0) & ~merge_pred
    ).select("cid")
    kcent = cents.join(F.broadcast(keepc), "cid").select("cid", "cv")
    scored = surv.select(
        "vec_id", "v", F.col("cid").alias("pre_cid")
    ).crossJoin(F.broadcast(kcent)).select(
        "vec_id",
        "pre_cid",
        "cid",
        cosine(F.col("v"), F.col("cv")).alias("sim"),
    )
    wr = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
    reass = (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("vec_id", "pre_cid", "cid")
        .localCheckpoint(eager=True)
    )
    post = reass.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum(F.when(F.col("pre_cid") != F.col("cid"), 1).otherwise(0))
        .cast("long")
        .alias("n_absorbed"),
    )
    retired = ct.agg(
        F.sum(F.when(F.col("n_after") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_dropped_cells"),
        F.sum(F.when((F.col("n_after") > 0) & merge_pred, 1).otherwise(0))
        .cast("long")
        .alias("n_merged_cells"),
    )
    qs = surv.filter(F.col("vec_id") % _FORGET_QMOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    brute = (
        surv.select("vec_id", "v")
        .join(F.broadcast(qs), F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", cosine(F.col("v"), F.col("qv")).alias("sim")
        )
    )
    wb = W.partitionBy("qid").orderBy(F.col("sim").desc(), "vec_id")
    b5 = (
        brute.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= _RECALL_K)
        .select("qid", "vec_id")
    )
    qpre = surv.filter(F.col("vec_id") % _FORGET_QMOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("cid").alias("q_pre")
    )
    qpost = reass.filter(F.col("vec_id") % _FORGET_QMOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("cid").alias("q_post")
    )
    epre = surv.select("vec_id", F.col("cid").alias("e_pre"))
    epost = reass.select("vec_id", F.col("cid").alias("e_post"))
    recall = (
        b5.join(F.broadcast(qpre), "qid")
        .join(F.broadcast(qpost), "qid")
        .join(epre, "vec_id")
        .join(epost, "vec_id")
        .agg(
            F.sum(F.when(F.col("e_pre") == F.col("q_pre"), 1).otherwise(0))
            .cast("long")
            .alias("recall_pre_num"),
            F.sum(F.when(F.col("e_post") == F.col("q_post"), 1).otherwise(0))
            .cast("long")
            .alias("recall_post_num"),
            F.count("*").cast("long").alias("recall_den"),
        )
    )
    return (
        post.crossJoin(F.broadcast(retired))
        .crossJoin(F.broadcast(recall))
        .select(
            "cid",
            "n_members",
            "n_absorbed",
            "n_dropped_cells",
            "n_merged_cells",
            "recall_pre_num",
            "recall_post_num",
            "recall_den",
            (F.col("recall_post_num") >= F.col("recall_pre_num")).alias(
                "not_worse"
            ),
        )
    )


# ---------------------------------------------------------------------------
# llm_ivf_pq_search — the COMPOSITE production ANN stack: IVF cell
# restriction (nprobe=2) → PQ/ADC approximate scoring of the probed
# cells' members → exact-cosine re-rank of the ADC top-R.  The three
# pieces exist separately (llm_sim_ivf_probe, llm_sim_pq,
# llm_sim_cosine); real vector stores run them COMPOSED — coarse
# quantizer prunes the scan, product codes make the candidate pass
# d-independent, a small exact re-rank repairs ADC error — and the
# composition is where the engineering risk lives (two quantizers'
# tie-breaks, two score scales, one final order).
#
# Determinism: ADC distances and cosines both round to 6 dp; the ADC
# top-R cut and the final top-k order tie-break on vec_id; PQ code
# assignment is the lexicographic (distance, cid) struct-min — every
# order is total in both engines.
#
# Scale: probed-cell members ≈ nprobe·N/K rows read (partition
# pruning on the cell column at 100 TB); the candidate pass is M
# equi-join lookups into broadcast K-row ADC tables; the exact pass
# touches R = 20 vectors.  Codes are per-vector independent, so
# encode-after-restrict here ≡ the offline-encoded index restricted
# to probed partitions.
# ---------------------------------------------------------------------------

_IVFPQ_NPROBE = 2
_IVFPQ_RERANK = 20
_IVFPQ_TOPK = 5


def _ivf_pq_oracle() -> str:
    from maxscale_cdc_spark.operators.llm import _QV_SQL

    k = _KMEANS_ITERS
    subs = []
    for m in range(_PQ_M):
        lo = m * _PQ_SUB + 1
        hi = (m + 1) * _PQ_SUB
        subs.append(
            f"pcent{m} AS (SELECT vec_id AS cid, v[{lo}:{hi}] AS cv FROM vecs "
            f"WHERE vec_id < {_PQ_K})"
        )
        subs.append(
            f"pcode{m} AS (SELECT vec_id, "
            f"min(struct_pack(d := {_sql_l2sq('s.s', 'c.cv', _PQ_SUB)}, cid := c.cid)) AS mc "
            f"FROM (SELECT vec_id, v[{lo}:{hi}] AS s FROM cand) s "
            f"CROSS JOIN pcent{m} c GROUP BY vec_id)"
        )
        subs.append(
            f"pqd{m} AS (SELECT c.cid, {_sql_l2sq('qs.qs', 'c.cv', _PQ_SUB)} AS d "
            f"FROM pcent{m} c CROSS JOIN "
            f"(SELECT qv[{lo}:{hi}] AS qs FROM q) qs)"
        )
    adc = " + ".join(f"pqd{m}.d" for m in range(_PQ_M))
    joins = " ".join(
        f"JOIN pcode{m} ON pcode{m}.vec_id = c.vec_id "
        f"JOIN pqd{m} ON pqd{m}.cid = pcode{m}.mc.cid"
        for m in range(_PQ_M)
    )
    return f"""
WITH {_sql_kmeans_ctes()},
q AS {_QV_SQL},
qcells AS (
  SELECT cid FROM (
    SELECT c.cid,
           row_number() OVER (ORDER BY {sql_cosine("q.qv", "c.cv")} DESC, c.cid) AS rn
    FROM cent{k} c CROSS JOIN q
  ) WHERE rn <= {_IVFPQ_NPROBE}
),
cand AS MATERIALIZED (
  SELECT a.vec_id, a.v FROM a{k} a JOIN qcells USING (cid)
  WHERE a.vec_id <> 0
),
{', '.join(subs)},
scored AS (
  SELECT c.vec_id, round(CAST({adc} AS DOUBLE), 6) AS adc_dist
  FROM cand c {joins}
),
topr AS (
  SELECT vec_id, adc_dist FROM (
    SELECT vec_id, adc_dist,
           row_number() OVER (ORDER BY adc_dist, vec_id) AS rn
    FROM scored
  ) WHERE rn <= {_IVFPQ_RERANK}
)
SELECT t.vec_id, t.adc_dist,
       {sql_cosine("v.v", "q.qv")} AS cos_sim,
       CAST(row_number() OVER (
         ORDER BY {sql_cosine("v.v", "q.qv")} DESC, t.vec_id) AS BIGINT) AS rk
FROM topr t JOIN vecs v ON v.vec_id = t.vec_id CROSS JOIN q
QUALIFY rk <= {_IVFPQ_TOPK}
"""


@register("llm_ivf_pq_search", _ivf_pq_oracle())
def llm_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(nprobe=2) → PQ/ADC → exact re-rank for query vector 0 (see
    block comment)."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached

    e = wide_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", as_double("embedding").alias("v")).localCheckpoint(
        eager=False
    )
    # stage the Lloyd-iterated centroids once and re-derive the cell
    # assignment as a single broadcast pass over the staged vectors
    # (bit-identical to _kmeans_cells' returned assignment — it IS
    # assign(final cents); CLAUDE.md rule 5: the chain was otherwise
    # re-run by qcells and cand separately)
    cents, _ = kmeans_cells_cached(spark, sf_dir)  # staged by the cache
    scored0 = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "cid", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    w0 = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
    assigned = (
        scored0.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )
    q = vecs.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    qcells = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", cosine(F.col("cv"), F.col("qv")).alias("sim"))
        .withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("sim").desc(), "cid")),
        )
        .filter(F.col("rn") <= _IVFPQ_NPROBE)
        .select("cid")
    )
    cand = (
        assigned.join(F.broadcast(qcells), "cid")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "v")
        .localCheckpoint(eager=True)
    )

    def l2sq(a, b):
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    out = cand.select("vec_id")
    adc_cols = []
    for m in range(_PQ_M):
        lo = m * _PQ_SUB + 1
        sub = cand.select("vec_id", F.slice("v", lo, _PQ_SUB).alias("s"))
        cent = vecs.filter(F.col("vec_id") < _PQ_K).select(
            F.col("vec_id").alias("cid"), F.slice("v", lo, _PQ_SUB).alias("cv")
        )
        code = (
            sub.crossJoin(F.broadcast(cent))
            .groupBy("vec_id")
            .agg(
                F.min(
                    F.struct(
                        l2sq(F.col("s"), F.col("cv")).alias("d"),
                        F.col("cid").alias("cid"),
                    )
                ).alias("mc")
            )
            .select("vec_id", F.col("mc.cid").alias(f"code{m}"))
        )
        qsub = q.select(F.slice("qv", lo, _PQ_SUB).alias("qs"))
        qd = cent.crossJoin(F.broadcast(qsub)).select(
            F.col("cid").alias(f"qcid{m}"),
            l2sq(F.col("qs"), F.col("cv")).alias(f"qd{m}"),
        )
        out = out.join(code, "vec_id").join(
            F.broadcast(qd), F.col(f"code{m}") == F.col(f"qcid{m}")
        )
        adc_cols.append(F.col(f"qd{m}"))
    adc = adc_cols[0]
    for c in adc_cols[1:]:
        adc = adc + c
    topr = (
        out.select("vec_id", F.round(adc, 6).alias("adc_dist"))
        .withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("adc_dist").asc(), "vec_id")),
        )
        .filter(F.col("rn") <= _IVFPQ_RERANK)
        .select("vec_id", "adc_dist")
    )
    return (
        topr.join(vecs, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "adc_dist", cosine(F.col("v"), F.col("qv")).alias("cos_sim")
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(W.orderBy(F.col("cos_sim").desc(), "vec_id"))
            .cast("long"),
        )
        .filter(F.col("rk") <= _IVFPQ_TOPK)
    )


# ---------------------------------------------------------------------------
# llm_embedding_drift_monitor — per-DIMENSION drift between the old
# corpus slice and the new ingest batch (the llm_ivf_incremental
# cutover convention: old = vec_id ≤ ⌊4·max/5⌋).  The monitor an
# embedding pipeline runs on every batch: a changed encoder version,
# a re-normalization bug, or a domain shift shows up as per-dim mean
# displacement long before index recall degrades.  Complements
# llm_embedding_coverage (norm mass) and llm_embed_outliers (points):
# this is the DISTRIBUTION check.
#
# Exactness: per dim, both slice means live in Q1.30 integer space
# (coordinate sums of floor(v·2³⁰)); the displacement is the
# cross-multiplied integer |snew·n_old − sold·n_new| over n_old·n_new
# — the llm_ivf_incremental discipline — and the 0.05-real-unit flag
# compares CAST(num AS DOUBLE)/den against 0.05·2³⁰ with the same
# expression tree in both engines.  No driver read: the cutover
# scalar joins in-plan.
#
# Scale: one posexplode scan + one 64-group aggregation (map-side
# combinable); output is exactly 64 rows.
# ---------------------------------------------------------------------------


def _embed_drift_oracle() -> str:
    from maxscale_cdc_spark.operators.llm import _Q30

    return f"""
WITH cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
flat AS (
  SELECT e.vec_id, i.i AS dim,
         CAST(floor(CAST(e.embedding AS DOUBLE[])[i.i] * {_Q30}) AS BIGINT) AS q,
         (e.vec_id <= (SELECT c FROM cut)) AS is_old
  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i
),
agg AS (
  SELECT dim,
         CAST(coalesce(sum(CASE WHEN is_old THEN q END), 0) AS BIGINT) AS sold,
         CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         CAST(coalesce(sum(CASE WHEN NOT is_old THEN q END), 0) AS BIGINT) AS snew,
         CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM flat GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim, sold, n_old, snew, n_new,
       CAST(abs(snew * n_old - sold * n_new) AS BIGINT) AS drift_num,
       CAST(n_old * n_new AS BIGINT) AS drift_den,
       CAST(abs(snew * n_old - sold * n_new) AS DOUBLE) / (n_old * n_new)
         AS drift_q30,
       (CAST(abs(snew * n_old - sold * n_new) AS DOUBLE) / (n_old * n_new)
          > 0.05 * {_Q30}) AS drifted
FROM agg
"""


@register("llm_embedding_drift_monitor", _embed_drift_oracle())
def llm_embedding_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension old-vs-new drift table (see block comment): one
    scan, one 64-group aggregation, zero driver reads."""
    e = wide_table(spark, sf_dir, "embeddings")
    cut = e.agg(F.expr("div(max(vec_id) * 4, 5)").alias("c"))
    flat = (
        e.crossJoin(F.broadcast(cut))
        .select(
            "vec_id",
            (F.col("vec_id") <= F.col("c")).alias("is_old"),
            F.posexplode(as_double("embedding")).alias("dim0", "val"),
        )
        .select(
            "is_old",
            (F.col("dim0") + 1).alias("dim"),
            F.floor(F.col("val") * 1073741824.0).cast("long").alias("q"),
        )
    )
    agg = flat.groupBy("dim").agg(
        F.coalesce(F.sum(F.when(F.col("is_old"), F.col("q"))), F.lit(0))
        .cast("long")
        .alias("sold"),
        F.sum(F.when(F.col("is_old"), 1).otherwise(0)).cast("long").alias("n_old"),
        F.coalesce(F.sum(F.when(~F.col("is_old"), F.col("q"))), F.lit(0))
        .cast("long")
        .alias("snew"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).cast("long").alias("n_new"),
    )
    num = F.abs(F.col("snew") * F.col("n_old") - F.col("sold") * F.col("n_new"))
    den = F.col("n_old") * F.col("n_new")
    drift = num.cast("double") / den
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        "sold",
        "n_old",
        "snew",
        "n_new",
        num.cast("long").alias("drift_num"),
        den.cast("long").alias("drift_den"),
        drift.alias("drift_q30"),
        (drift > F.lit(0.05) * F.lit(1073741824.0)).alias("drifted"),
    )


# ---------------------------------------------------------------------------
# llm_ann_join_topk — the batched ANN JOIN: every IVF query so far is
# single-query (vec_id 0); production similarity search is a TABLE of
# queries joined to the index — dedup candidates, retrieval batches,
# hard-negative mining all reduce to "top-k neighbors per query row".
# Queries = every 100th vector (the deterministic sample convention);
# each query probes its nprobe=2 nearest cells and ranks ONLY those
# cells' members by exact cosine; top-3 exported per query.
#
# Plan shape (the part that matters at 100 TB): the query→cell
# routing table is |Q|·nprobe rows (KB — broadcast); the candidate
# pass is ONE equi-join on cid between the index (partitioned by
# cell) and the routed queries — per-cell work is |cell| × queries
# routed to that cell, never |corpus| × |Q|.  The per-query top-k is
# a window over candidate rows, partitioned by query — no global
# sort.  Compare llm_sim_topk_pergroup (brute-force per-label top-k):
# the IVF routing replaces the full N×Q cross product.
#
# Determinism: cosine 6 dp; cell routing tie-break (sim desc, cid);
# final rank tie-break (cos_sim desc, vec_id) — total orders in both
# engines.  Self-matches excluded (a query is its own nearest
# neighbor in its own cell).
# ---------------------------------------------------------------------------

_ANNJ_QMOD = 100
_ANNJ_NPROBE = 2
_ANNJ_TOPK = 3


def _ann_join_oracle() -> str:
    k = _KMEANS_ITERS
    return f"""
WITH {_sql_kmeans_ctes()},
qset AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id % {_ANNJ_QMOD} = 0),
route AS (
  SELECT qid, qv, cid FROM (
    SELECT q.qid, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {sql_cosine("q.qv", "c.cv")} DESC, c.cid) AS rn
    FROM qset q CROSS JOIN cent{k} c
  ) WHERE rn <= {_ANNJ_NPROBE}
),
cand AS (
  SELECT r.qid, a.vec_id, {sql_cosine("a.v", "r.qv")} AS cos_sim
  FROM a{k} a JOIN route r ON a.cid = r.cid
  WHERE a.vec_id <> r.qid
)
SELECT qid, vec_id, cos_sim, CAST(rk AS BIGINT) AS rk FROM (
  SELECT qid, vec_id, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, vec_id) AS rk
  FROM cand
) WHERE rk <= {_ANNJ_TOPK}
"""


@register("llm_ann_join_topk", _ann_join_oracle())
def llm_ann_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN join: top-3 neighbors per sampled query row via
    IVF cell routing (see block comment)."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached

    e = wide_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", as_double("embedding").alias("v")).localCheckpoint(
        eager=False
    )
    cents, _ = kmeans_cells_cached(spark, sf_dir)  # staged by the cache
    scored0 = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "cid", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    w0 = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
    assigned = (
        scored0.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )
    qset = vecs.filter(F.col("vec_id") % _ANNJ_QMOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    route = (
        qset.crossJoin(F.broadcast(cents))
        .select("qid", "qv", "cid", cosine(F.col("qv"), F.col("cv")).alias("sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")
            ),
        )
        .filter(F.col("rn") <= _ANNJ_NPROBE)
        .select("qid", "qv", "cid")
    )
    cand = (
        assigned.join(F.broadcast(route), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cos_sim")
        )
    )
    wk = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        cand.withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= _ANNJ_TOPK)
        .select("qid", "vec_id", "cos_sim", "rk")
    )


# ---------------------------------------------------------------------------
# llm_mmr_rerank — Maximal Marginal Relevance (Carbonell & Goldstein 1998)
# diversity re-ranking: after ANN candidate generation, select K results
# that balance relevance against redundancy — argmax over remaining of
# λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s).  The standard last stage of a
# retrieval pipeline (and of diverse few-shot/RAG example selection);
# without it, a duplicate-dense corpus returns K copies of one document
# (exactly what the dedup family measures upstream).
#
# Exactness: cosines cross the engine boundary 6-dp rounded (the repo
# contract), then everything is INTEGER micro-units — rel_u =
# round(cos·1e6) as BIGINT, λ = 0.7 applied as score_u = 7·rel_u −
# 3·max_sim_u (both engines build the same BIGINT tree; no float
# comparison anywhere).  Selection is a total order (score_u DESC,
# vec_id) per query.  The K−1 dependent stages are localCheckpoint-
# staged in Spark (iterated-plan rule) and MATERIALIZED CTEs in the
# oracle (DuckDB default-INLINES CTEs — 3^K scan copies otherwise).
#
# Scale: queries = every 125th vector (a query TABLE, the
# llm_ann_join_topk shape); candidates = top-20 exact-cosine per query
# (production would route via the IVF index — same contract).  All MMR
# work after candidate generation is per-query O(C²) with C = 20:
# the pairwise sim table is C·(C−1) rows per query, each iteration one
# keyed agg + one keyed window — never corpus-sized.
# ---------------------------------------------------------------------------

_MMR_C = 20  # candidate pool per query
_MMR_K = 5  # selections per query


def _mmr_oracle() -> str:
    cos_q = sql_cosine("CAST(e.embedding AS DOUBLE[])", "q.qv")
    cos_ab = sql_cosine("a.v", "b.v")
    stages = []
    prev_union = "sel1"
    for k in range(2, _MMR_K + 1):
        stages.append(f"""
  selu{k - 1} AS MATERIALIZED (
    {"SELECT * FROM sel1" if k == 2 else f"SELECT * FROM selu{k - 2} UNION ALL SELECT * FROM sel{k - 1}"}
  ),
  sel{k} AS MATERIALIZED (
    SELECT qid, vec_id, rel_u, score_u, CAST({k} AS BIGINT) AS rk FROM (
      SELECT c.qid, c.vec_id, c.rel_u,
             7 * c.rel_u - 3 * mp.mp AS score_u,
             row_number() OVER (PARTITION BY c.qid
                                ORDER BY 7 * c.rel_u - 3 * mp.mp DESC, c.vec_id) AS r
      FROM cand c
      JOIN (SELECT s.qid, s.va, max(s.sim_u) AS mp
            FROM sims s JOIN selu{k - 1} p ON p.qid = s.qid AND p.vec_id = s.vb
            GROUP BY s.qid, s.va) mp
        ON mp.qid = c.qid AND mp.va = c.vec_id
      WHERE NOT EXISTS (SELECT 1 FROM selu{k - 1} p2
                        WHERE p2.qid = c.qid AND p2.vec_id = c.vec_id)
    ) WHERE r = 1
  )""")
        prev_union = f"selu{k - 1}"
    unions = " UNION ALL ".join(f"SELECT * FROM sel{k}" for k in range(1, _MMR_K + 1))
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 125 = 0
),
  scored AS (
    SELECT q.qid, e.vec_id,
           CAST(round({cos_q} * 1000000) AS BIGINT) AS rel_u
    FROM embeddings e JOIN q ON e.vec_id <> q.qid
  ),
  cand AS MATERIALIZED (
    SELECT qid, vec_id, rel_u FROM (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel_u DESC, vec_id) AS r0
      FROM scored
    ) WHERE r0 <= {_MMR_C}
  ),
  candv AS (
    SELECT c.qid, c.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
    FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
  ),
  sims AS MATERIALIZED (
    SELECT a.qid, a.vec_id AS va, b.vec_id AS vb,
           CAST(round({cos_ab} * 1000000) AS BIGINT) AS sim_u
    FROM candv a JOIN candv b ON a.qid = b.qid AND a.vec_id <> b.vec_id
  ),
  sel1 AS MATERIALIZED (
    SELECT qid, vec_id, rel_u, 7 * rel_u AS score_u, CAST(1 AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel_u DESC, vec_id) AS r
      FROM cand
    ) WHERE r = 1
  ),{",".join(stages)}
SELECT qid, rk, vec_id, rel_u, score_u FROM ({unions})
"""


@register("llm_mmr_rerank", _mmr_oracle())
def llm_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking (λ = 0.7, K = 5 over top-20 candidates
    per query) in pure BIGINT micro-unit arithmetic — see block comment
    for the exactness and scale story."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 125 == 0).select(
        F.col("vec_id").alias("qid"), as_double("embedding").alias("qv")
    )
    rel_u = (
        F.round(cosine(as_double("embedding"), F.col("qv")) * 1000000.0)
        .cast("long")
        .alias("rel_u")
    )
    scored = (
        e.join(F.broadcast(q), e.vec_id != q.qid)
        .select("qid", "vec_id", rel_u)
    )
    w0 = W.partitionBy("qid").orderBy(F.col("rel_u").desc(), "vec_id")
    cand = (
        scored.withColumn("r0", F.row_number().over(w0))
        .filter(F.col("r0") <= _MMR_C)
        .select("qid", "vec_id", "rel_u")
        .localCheckpoint(eager=True)
    )
    candv = cand.join(
        e.select("vec_id", as_double("embedding").alias("v")), "vec_id"
    ).select("qid", "vec_id", "v")
    a, b = candv.alias("a"), candv.alias("b")
    sims = (
        a.join(
            b,
            (F.col("a.qid") == F.col("b.qid"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.qid").alias("qid"),
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.round(cosine(F.col("a.v"), F.col("b.v")) * 1000000.0)
            .cast("long")
            .alias("sim_u"),
        )
        .localCheckpoint(eager=True)
    )
    w = W.partitionBy("qid").orderBy(F.col("rel_u").desc(), "vec_id")
    selected = (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "qid",
            "vec_id",
            "rel_u",
            (7 * F.col("rel_u")).alias("score_u"),
            F.lit(1).cast("long").alias("rk"),
        )
        .localCheckpoint(eager=True)
    )
    out = selected
    for k in range(2, _MMR_K + 1):
        pens = sims.join(
            selected.select("qid", F.col("vec_id").alias("vb")), ["qid", "vb"]
        )
        maxpen = pens.groupBy("qid", "va").agg(F.max("sim_u").alias("mp"))
        rem = cand.join(selected.select("qid", "vec_id"), ["qid", "vec_id"], "left_anti")
        score_u = (7 * F.col("rel_u") - 3 * F.col("mp")).alias("score_u")
        wk = W.partitionBy("qid").orderBy(
            (7 * F.col("rel_u") - 3 * F.col("mp")).desc(), "vec_id"
        )
        pick = (
            rem.join(maxpen, (rem.qid == maxpen.qid) & (rem.vec_id == maxpen.va))
            .select(rem.qid, rem.vec_id, rem.rel_u, F.col("mp"))
            .withColumn("r", F.row_number().over(wk))
            .filter(F.col("r") == 1)
            .select(
                "qid",
                "vec_id",
                "rel_u",
                score_u,
                F.lit(k).cast("long").alias("rk"),
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
        out = selected
    return out.select("qid", "rk", "vec_id", "rel_u", "score_u")


# ---------------------------------------------------------------------------
# llm_ann_mmr_e2e — the COMPOSED production retrieval path: IVF cell
# routing → batched candidate equi-join → MMR diversity re-rank, as
# ONE plan.  `llm_ann_join_topk` certifies the index half and
# `llm_mmr_rerank` the diversity half; this is the shape a RAG /
# contrastive-mining consumer actually runs at 100 TB (the reference's
# consumers materialize CDC state to QUERY it — client.go:144-162's
# channel exists to feed exactly this kind of downstream), and until
# now the two halves were only certified apart.
#
# Candidate generation is the llm_ann_join_topk plan: query table =
# every 125th vector (the llm_mmr_rerank sample, so the two MMR ops
# are directly comparable), each query routed to its nprobe=2 nearest
# cells (broadcast KB-sized routing table), candidates = ONE equi-join
# on cid against the cell-partitioned index — never |corpus| × |Q|.
# Top-C (C = 20) per query by exact cosine feeds the same integer MMR
# machinery as llm_mmr_rerank (λ = 0.7 as 7·rel_u − 3·max_sim_u in
# BIGINT micro-units, K = 5 staged selections, total-order
# tie-breaks).  The plan gate (tests/test_plans.py) pins the
# no-full-embedding-scan property: every nested-loop join in the
# unstaged plan broadcasts the K-row centroid table (k-means assign /
# route); candidate scoring joins on cid only.
#
# Exactness: identical expression trees both engines — cosine 6 dp at
# the boundary, then BIGINT micro-units throughout; MMR stage CTEs
# MATERIALIZED in the oracle (DuckDB default-INLINES CTEs) and
# localCheckpoint-staged in Spark (iterated-plan rule).  A query whose
# routed cells hold < K non-self members simply yields fewer rows —
# both engines agree (row_number over an empty remainder emits none).
# ---------------------------------------------------------------------------

_ANNMMR_QMOD = 125  # the llm_mmr_rerank query sample
_ANNMMR_NPROBE = 2
_ANNMMR_C = 20  # candidate pool per query (ANN-routed, not full-scan)


def _ann_mmr_oracle(n_cells: int | None = None) -> str:
    """n_cells=None emits the byte-identical llm_ann_mmr_e2e oracle
    (default index, no k_cells column) — the CLAUDE.md rule-1 contract
    that keeps the base op's driver certification valid.  A concrete
    n_cells rebuilds the same CTE chain on the raised-K index and
    exports the knob as a constant k_cells column (the
    llm_ann_join_topk_scaled convention)."""
    k = _KMEANS_ITERS
    cos_ab = sql_cosine("a.v", "b.v")
    stages = []
    for s in range(2, _MMR_K + 1):
        stages.append(f"""
  selu{s - 1} AS MATERIALIZED (
    {"SELECT * FROM sel1" if s == 2 else f"SELECT * FROM selu{s - 2} UNION ALL SELECT * FROM sel{s - 1}"}
  ),
  sel{s} AS MATERIALIZED (
    SELECT qid, vec_id, rel_u, score_u, CAST({s} AS BIGINT) AS rk FROM (
      SELECT c.qid, c.vec_id, c.rel_u,
             7 * c.rel_u - 3 * mp.mp AS score_u,
             row_number() OVER (PARTITION BY c.qid
                                ORDER BY 7 * c.rel_u - 3 * mp.mp DESC, c.vec_id) AS r
      FROM cand c
      JOIN (SELECT s.qid, s.va, max(s.sim_u) AS mp
            FROM sims s JOIN selu{s - 1} p ON p.qid = s.qid AND p.vec_id = s.vb
            GROUP BY s.qid, s.va) mp
        ON mp.qid = c.qid AND mp.va = c.vec_id
      WHERE NOT EXISTS (SELECT 1 FROM selu{s - 1} p2
                        WHERE p2.qid = c.qid AND p2.vec_id = c.vec_id)
    ) WHERE r = 1
  )""")
    unions = " UNION ALL ".join(f"SELECT * FROM sel{s}" for s in range(1, _MMR_K + 1))
    ctes = _sql_kmeans_ctes() if n_cells is None else _sql_kmeans_ctes(n_cells=n_cells)
    kcol = "" if n_cells is None else f", CAST({n_cells} AS BIGINT) AS k_cells"
    return f"""
WITH {ctes},
  qset AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id % {_ANNMMR_QMOD} = 0),
  route AS (
    SELECT qid, qv, cid FROM (
      SELECT q.qid, q.qv, c.cid,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY {sql_cosine("q.qv", "c.cv")} DESC, c.cid) AS rn
      FROM qset q CROSS JOIN cent{k} c
    ) WHERE rn <= {_ANNMMR_NPROBE}
  ),
  scored AS (
    SELECT r.qid, a.vec_id,
           CAST(round({sql_cosine("a.v", "r.qv")} * 1000000) AS BIGINT) AS rel_u
    FROM a{k} a JOIN route r ON a.cid = r.cid
    WHERE a.vec_id <> r.qid
  ),
  cand AS MATERIALIZED (
    SELECT qid, vec_id, rel_u FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY rel_u DESC, vec_id) AS r0
      FROM scored
    ) WHERE r0 <= {_ANNMMR_C}
  ),
  candv AS (
    SELECT c.qid, c.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
    FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
  ),
  sims AS MATERIALIZED (
    SELECT a.qid, a.vec_id AS va, b.vec_id AS vb,
           CAST(round({cos_ab} * 1000000) AS BIGINT) AS sim_u
    FROM candv a JOIN candv b ON a.qid = b.qid AND a.vec_id <> b.vec_id
  ),
  sel1 AS MATERIALIZED (
    SELECT qid, vec_id, rel_u, 7 * rel_u AS score_u, CAST(1 AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel_u DESC, vec_id) AS r
      FROM cand
    ) WHERE r = 1
  ),{",".join(stages)}
SELECT qid, rk, vec_id, rel_u, score_u{kcol} FROM ({unions})
"""


def _ann_mmr_candidates(
    spark: SparkSession, sf_dir: str, stage: bool = True, n_cells: int | None = None
) -> DataFrame:
    """The ANN candidate stage of llm_ann_mmr_e2e: IVF routing + the
    cid equi-join + per-query top-C.  Split out so tests/test_plans.py
    can gate THIS plan with `stage=False` (the full K-stage MMR
    lineage duplicates subplans thousands of times when unstaged; the
    no-full-embedding-scan property lives entirely in this stage)."""
    from maxscale_cdc_spark.operators.llm import (
        _N_CELLS,
        _kmeans_cells,
        kmeans_cells_cached,
    )

    def st(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if stage else df  # eager: anti-convoy (r15)

    e = wide_table(spark, sf_dir, "embeddings")
    if stage:
        # production path rides the family centroid cache (already
        # staged); stage=False keeps the RAW chain visible so the
        # no-full-embedding-scan plan gate never goes vacuous
        cents, assigned = kmeans_cells_cached(
            spark, sf_dir, _N_CELLS if n_cells is None else n_cells
        )
    else:
        cents, assigned = (
            _kmeans_cells(e)
            if n_cells is None
            else _kmeans_cells(e, n_cells=n_cells)
        )
    cents = st(cents)
    assigned = st(assigned.select("vec_id", "v", "cid"))
    qset = (
        e.filter(F.col("vec_id") % _ANNMMR_QMOD == 0)
        .select(F.col("vec_id").alias("qid"), as_double("embedding").alias("qv"))
    )
    route = (
        qset.crossJoin(F.broadcast(cents))
        .select("qid", "qv", "cid", cosine(F.col("qv"), F.col("cv")).alias("sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")
            ),
        )
        .filter(F.col("rn") <= _ANNMMR_NPROBE)
        .select("qid", "qv", "cid")
    )
    scored = (
        assigned.join(F.broadcast(route), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")) * 1000000.0)
            .cast("long")
            .alias("rel_u"),
        )
    )
    w0 = W.partitionBy("qid").orderBy(F.col("rel_u").desc(), "vec_id")
    return st(
        scored.withColumn("r0", F.row_number().over(w0))
        .filter(F.col("r0") <= _ANNMMR_C)
        .select("qid", "vec_id", "rel_u")
    )


def _ann_mmr_frame(
    spark: SparkSession, sf_dir: str, stage: bool = True, n_cells: int | None = None
) -> DataFrame:
    """Plan builder for llm_ann_mmr_e2e (n_cells=None, byte-identical
    plan) and llm_ann_mmr_e2e_scaled (raised-K index); `stage=False`
    skips the localCheckpoints so tests can inspect lineage."""

    def st(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if stage else df  # eager: anti-convoy (r15)

    e = wide_table(spark, sf_dir, "embeddings")
    cand = _ann_mmr_candidates(spark, sf_dir, stage=stage, n_cells=n_cells)
    candv = cand.join(
        e.select("vec_id", as_double("embedding").alias("v")), "vec_id"
    ).select("qid", "vec_id", "v")
    a, b = candv.alias("a"), candv.alias("b")
    sims = st(
        a.join(
            b,
            (F.col("a.qid") == F.col("b.qid"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        ).select(
            F.col("a.qid").alias("qid"),
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.round(cosine(F.col("a.v"), F.col("b.v")) * 1000000.0)
            .cast("long")
            .alias("sim_u"),
        )
    )
    w1 = W.partitionBy("qid").orderBy(F.col("rel_u").desc(), "vec_id")
    selected = st(
        cand.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") == 1)
        .select(
            "qid",
            "vec_id",
            "rel_u",
            (7 * F.col("rel_u")).alias("score_u"),
            F.lit(1).cast("long").alias("rk"),
        )
    )
    out = selected
    for k in range(2, _MMR_K + 1):
        pens = sims.join(
            selected.select("qid", F.col("vec_id").alias("vb")), ["qid", "vb"]
        )
        maxpen = pens.groupBy("qid", "va").agg(F.max("sim_u").alias("mp"))
        rem = cand.join(
            selected.select("qid", "vec_id"), ["qid", "vec_id"], "left_anti"
        )
        wk = W.partitionBy("qid").orderBy(
            (7 * F.col("rel_u") - 3 * F.col("mp")).desc(), "vec_id"
        )
        pick = (
            rem.join(maxpen, (rem.qid == maxpen.qid) & (rem.vec_id == maxpen.va))
            .select(rem.qid, rem.vec_id, rem.rel_u, F.col("mp"))
            .withColumn("r", F.row_number().over(wk))
            .filter(F.col("r") == 1)
            .select(
                "qid",
                "vec_id",
                "rel_u",
                (7 * F.col("rel_u") - 3 * F.col("mp")).alias("score_u"),
                F.lit(k).cast("long").alias("rk"),
            )
        )
        selected = st(selected.unionByName(pick))
        out = selected
    if n_cells is not None:
        return out.select(
            "qid", "rk", "vec_id", "rel_u", "score_u",
            F.lit(n_cells).cast("long").alias("k_cells"),
        )
    return out.select("qid", "rk", "vec_id", "rel_u", "score_u")


@register("llm_ann_mmr_e2e", _ann_mmr_oracle())
def llm_ann_mmr_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production retrieval end-to-end: IVF-routed ANN candidates →
    integer-MMR diversity selection, one composed plan (see block
    comment)."""
    return _ann_mmr_frame(spark, sf_dir, stage=True)


# ---------------------------------------------------------------------------
# llm_drift_reindex_apply — the drift DETECT→PLAN→APPLY closure (r9
# verdict ask #4): llm_embedding_drift_monitor detects per-dimension
# distribution drift but nothing consumed it.  This op joins the
# monitor's per-dim verdicts (same Q1.30 cross-multiplied expression
# tree, same old/new cutover) with llm_ivf_incremental's per-cell
# growth/displacement signals and EXECUTES the per-cell decision:
#
#   recluster   cell grew past the ingest rule (5·n_new > n_seed) OR
#               its combined centroid displaced > 0.01 real units —
#               centroid RECOMPUTED as the Q1.30 mean over seed+new
#               members (the displacement metric's own target point).
#   requantize  corpus-level drift (≥ _DRIFT_DIMS_MIN dims moved past
#               the planner sensitivity) but the cell itself is
#               stable — centroid unchanged; the exported kind is the
#               work list a PQ index feeds its code re-encoder
#               (llm_ivf_pq_search's codebooks are trained on the
#               corpus distribution, so corpus drift invalidates
#               CODES before it moves any single cell's centroid).
#   keep        no signal — centroid unchanged, certified untouched.
#
# Planner sensitivity is 0.02 real units with a ≥4-dim floor —
# deliberately EARLIER than the monitor's 0.05 alarm (a reindex
# planner schedules maintenance before the pager fires); both engines
# build the same integer tree, only the constant differs.
#
# The audit half is llm_ivf_rebalance_apply's: full reassignment of
# the corpus to the post-action centroid set, per-cell member counts,
# and recall@{_RECALL_K} vs brute force on the deterministic
# {_APPLY_NQ}-query sample BEFORE and AFTER (`not_worse` exports ≥).
# Scale: broadcast-assignment passes + cell-bounded aggs; the brute
# side is sample-bounded (|Q|·N).  Keep/requantize cells' centroids
# are byte-identical inputs to the reassignment, so their members move
# only if a reclustered neighbor's centroid claims them — exactly the
# production semantics of partial index surgery.
# ---------------------------------------------------------------------------

_DRIFT_SENS = 0.02  # planner sensitivity, real units (monitor alarms at 0.05)
_DRIFT_DIMS_MIN = 4


def _drift_reindex_oracle() -> str:
    from maxscale_cdc_spark.operators.llm import _Q30

    k = _KMEANS_ITERS
    return f"""{_ivf_incr_prefix()},
dflat AS (
  SELECT i.i AS dim,
         CAST(floor(CAST(e.embedding AS DOUBLE[])[i.i] * {_Q30}) AS BIGINT) AS q,
         (e.vec_id <= (SELECT c FROM cut)) AS is_old
  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i
),
dagg AS (
  SELECT dim,
         CAST(coalesce(sum(CASE WHEN is_old THEN q END), 0) AS BIGINT) AS sold,
         CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         CAST(coalesce(sum(CASE WHEN NOT is_old THEN q END), 0) AS BIGINT) AS snew,
         CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM dflat GROUP BY dim
),
dd AS (
  SELECT CAST(coalesce(sum(CASE WHEN CAST(abs(snew * n_old - sold * n_new) AS DOUBLE)
                                     / (n_old * n_new) > {_DRIFT_SENS} * {_Q30}
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS dims_drifted
  FROM dagg
),
decis AS (
  SELECT c.cid,
         (5 * c.n_new > c.n_seed) AS grown,
         coalesce(CAST(d.disp_l1_num AS DOUBLE) / d.disp_den
                  > 0.01 * {_Q30}, false) AS displaced
  FROM cells c LEFT JOIN disp d ON d.cid = c.cid
),
plan AS (
  SELECT cid,
         CASE WHEN grown OR displaced THEN 'recluster'
              WHEN (SELECT dims_drifted FROM dd) >= {_DRIFT_DIMS_MIN}
                THEN 'requantize'
              ELSE 'keep' END AS action
  FROM decis
),
allv AS MATERIALIZED (
  SELECT vec_id, v, cid FROM a{k}
  UNION ALL
  SELECT vec_id, v, cid FROM nassign
),
rm AS (
  SELECT a.vec_id, a.v, a.cid FROM allv a
  JOIN plan p ON p.cid = a.cid AND p.action = 'recluster'
),
rcent AS (
  SELECT cid, list(m ORDER BY dim) AS cv FROM (
    SELECT cid, i.i AS dim,
           CAST(SUM(CAST(floor(v[i.i] * {_Q30}) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * {_Q30}) AS m
    FROM rm, (SELECT unnest(generate_series(1, 64)) AS i) i
    GROUP BY cid, i.i
  ) GROUP BY cid
),
newcent AS MATERIALIZED (
  SELECT CAST(c.cid AS BIGINT) AS cid, p.action, c.cv
  FROM cent{k} c JOIN plan p ON p.cid = c.cid AND p.action <> 'recluster'
  UNION ALL
  SELECT CAST(r.cid AS BIGINT), 'recluster', r.cv FROM rcent r
),
post AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT a.vec_id, n.cid,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {sql_cosine('a.v', 'n.cv')} DESC,
                                       n.cid) AS rn
    FROM allv a CROSS JOIN newcent n
  ) WHERE rn = 1
),
members AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_members FROM post GROUP BY cid
),
qs AS (
  SELECT vec_id AS qid, v AS qv, cid AS q_pre FROM allv
  WHERE vec_id > (SELECT c FROM cut)
    AND vec_id <= (SELECT c FROM cut) + {_APPLY_NQ}
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {sql_cosine('e.v', 'q.qv')} DESC,
                                       e.vec_id) AS rn
    FROM allv e JOIN qs q ON e.vec_id <> q.qid
  ) WHERE rn <= {_RECALL_K}
),
recall AS (
  SELECT CAST(coalesce(sum(CASE WHEN ep.cid = q.q_pre THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS recall_pre_num,
         CAST(coalesce(sum(CASE WHEN pp.cid = qp.cid THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS recall_post_num,
         CAST(count(*) AS BIGINT) AS recall_den
  FROM brute b
  JOIN qs q ON q.qid = b.qid
  JOIN allv ep ON ep.vec_id = b.vec_id
  JOIN post pp ON pp.vec_id = b.vec_id
  JOIN post qp ON qp.vec_id = b.qid
)
SELECT n.cid, n.action,
       CAST(coalesce(m.n_members, 0) AS BIGINT) AS n_members,
       (SELECT dims_drifted FROM dd) AS dims_drifted,
       r.recall_pre_num, r.recall_post_num, r.recall_den,
       (r.recall_post_num >= r.recall_pre_num) AS not_worse
FROM newcent n
LEFT JOIN members m ON m.cid = n.cid
CROSS JOIN recall r
"""


@register("llm_drift_reindex_apply", _drift_reindex_oracle())
def llm_drift_reindex_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the drift-driven reindex decision per IVF cell
    (recluster / requantize / keep — see block comment) and audit the
    post-action index: one row per cell with its action, post-action
    member count, the corpus drift verdict, and the before/after
    recall@5 sample audit."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached_cut

    e = wide_table(spark, sf_dir, "embeddings")
    # the family cut-chain cache stages cents once for the whole
    # incremental/drift tier (CLAUDE.md rule 5, family level)
    cents, _, cut = kmeans_cells_cached_cut(spark, sf_dir)
    vecs = e.select("vec_id", as_double("embedding").alias("v"))

    def bassign(df: DataFrame) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cid", cosine(F.col("v"), F.col("cv")).alias("sim")
        )
        w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", "cid")
        )

    # eager: assigned/nassign feed the displacement aggs, allv's four
    # consumers (rm / post / qs / brute) and the recall joins — lazy,
    # those AQE stages raced to materialize the same parent (the r15
    # anti-convoy rule, see autotune.trigram_classes16)
    assigned = bassign(vecs.filter(F.col("vec_id") <= cut)).localCheckpoint(
        eager=True
    )
    nassign = bassign(vecs.filter(F.col("vec_id") > cut)).localCheckpoint(
        eager=True
    )

    # per-cell displacement (the llm_ivf_incremental integers)
    def flat(df: DataFrame) -> DataFrame:
        return df.select("cid", F.posexplode("v").alias("dim0", "val")).select(
            "cid",
            (F.col("dim0") + 1).alias("dim"),
            F.floor(F.col("val") * 1073741824.0).cast("long").alias("q"),
        )

    seed_flat = flat(assigned)
    seed_dim = seed_flat.groupBy("cid", "dim").agg(
        F.sum("q").cast("long").alias("snum"),
        F.count("*").cast("long").alias("n_old"),
    )
    all_dim = seed_flat.unionByName(flat(nassign)).groupBy("cid", "dim").agg(
        F.sum("q").cast("long").alias("cnum"),
        F.count("*").cast("long").alias("n_all"),
    )
    disp = (
        seed_dim.join(all_dim, ["cid", "dim"])
        .groupBy("cid")
        .agg(
            F.sum(
                F.abs(F.col("snum") * F.col("n_all") - F.col("cnum") * F.col("n_old"))
            )
            .cast("long")
            .alias("disp_l1_num"),
            F.max(F.col("n_old") * F.col("n_all")).cast("long").alias("disp_den"),
        )
    )
    # corpus drift verdict (the monitor's tree at planner sensitivity)
    dflat = (
        e.select(
            (F.col("vec_id") <= cut).alias("is_old"),
            F.posexplode(as_double("embedding")).alias("dim0", "val"),
        )
        .select(
            "is_old",
            (F.col("dim0") + 1).alias("dim"),
            F.floor(F.col("val") * 1073741824.0).cast("long").alias("q"),
        )
    )
    dagg = dflat.groupBy("dim").agg(
        F.coalesce(F.sum(F.when(F.col("is_old"), F.col("q"))), F.lit(0))
        .cast("long")
        .alias("sold"),
        F.sum(F.when(F.col("is_old"), 1).otherwise(0)).cast("long").alias("n_old"),
        F.coalesce(F.sum(F.when(~F.col("is_old"), F.col("q"))), F.lit(0))
        .cast("long")
        .alias("snew"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).cast("long").alias("n_new"),
    )
    ddrift = (
        F.abs(F.col("snew") * F.col("n_old") - F.col("sold") * F.col("n_new"))
        .cast("double")
        / (F.col("n_old") * F.col("n_new"))
    )
    dd = dagg.agg(
        F.coalesce(
            F.sum(
                F.when(
                    ddrift > F.lit(_DRIFT_SENS) * F.lit(1073741824.0), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("dims_drifted")
    )
    cells = _ivf_cells(assigned, nassign)
    decis = cells.join(disp, "cid", "left").select(
        "cid",
        (5 * F.col("n_new") > F.col("n_seed")).alias("grown"),
        F.coalesce(
            F.col("disp_l1_num").cast("double") / F.col("disp_den")
            > F.lit(0.01) * F.lit(1073741824.0),
            F.lit(False),
        ).alias("displaced"),
    )
    plan = decis.crossJoin(F.broadcast(dd)).select(
        "cid",
        F.when(F.col("grown") | F.col("displaced"), F.lit("recluster"))
        .when(F.col("dims_drifted") >= _DRIFT_DIMS_MIN, F.lit("requantize"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )
    allv = assigned.unionByName(nassign)
    rm = allv.join(
        F.broadcast(plan.filter(F.col("action") == "recluster").select("cid")),
        "cid",
    ).select("vec_id", "v", "cid")
    rflat = rm.select("cid", F.posexplode("v").alias("dim0", "val")).select(
        "cid",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("val") * 1073741824.0).cast("long").alias("q30"),
    )
    rmean = rflat.groupBy("cid", "dim").agg(
        (F.sum("q30").cast("double") / (F.count("*") * F.lit(1073741824.0))).alias(
            "m"
        )
    )
    rcent = rmean.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("cv")
    )
    newcent = (
        cents.join(F.broadcast(plan.filter(F.col("action") != "recluster")), "cid")
        .select(F.col("cid").cast("long").alias("cid"), "action", "cv")
        .unionByName(
            rcent.select(
                F.col("cid").cast("long").alias("cid"),
                F.lit("recluster").alias("action"),
                "cv",
            )
        )
        # eager: consumed by the post-assignment broadcast AND the
        # final select (anti-convoy rule)
        .localCheckpoint(eager=True)
    )
    post = (
        allv.select("vec_id", "v")
        .crossJoin(F.broadcast(newcent.select("cid", "cv")))
        .select("vec_id", "cid", cosine(F.col("v"), F.col("cv")).alias("sim"))
    )
    wp = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cid")
    post = (
        post.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
        # eager: consumed by members + both recall joins (anti-convoy)
        .localCheckpoint(eager=True)
    )
    members = post.groupBy("cid").agg(F.count("*").cast("long").alias("n_members"))
    qs = allv.filter(
        (F.col("vec_id") > cut) & (F.col("vec_id") <= cut + _APPLY_NQ)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("cid").alias("q_pre"),
    )
    brute = (
        allv.select("vec_id", "v", F.col("cid").alias("e_pre"))
        .join(F.broadcast(qs), F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "q_pre", "vec_id", "e_pre",
            cosine(F.col("v"), F.col("qv")).alias("sim"),
        )
    )
    wb = W.partitionBy("qid").orderBy(F.col("sim").desc(), "vec_id")
    brute = (
        brute.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= _RECALL_K)
        .select("qid", "q_pre", "vec_id", "e_pre")
    )
    ppost = post.select(F.col("vec_id").alias("p_vid"), F.col("cid").alias("e_post"))
    qpost = post.select(F.col("vec_id").alias("pq_vid"), F.col("cid").alias("q_post"))
    recall = (
        brute.join(ppost, F.col("vec_id") == F.col("p_vid"))
        .join(qpost, F.col("qid") == F.col("pq_vid"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("e_pre") == F.col("q_pre"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("recall_pre_num"),
            F.coalesce(
                F.sum(F.when(F.col("e_post") == F.col("q_post"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("recall_post_num"),
            F.count("*").cast("long").alias("recall_den"),
        )
    )
    return (
        newcent.select("cid", "action")
        .join(members, "cid", "left")
        .crossJoin(F.broadcast(dd))
        .crossJoin(F.broadcast(recall))
        .select(
            "cid",
            "action",
            F.coalesce("n_members", F.lit(0)).cast("long").alias("n_members"),
            "dims_drifted",
            "recall_pre_num",
            "recall_post_num",
            "recall_den",
            (F.col("recall_post_num") >= F.col("recall_pre_num")).alias("not_worse"),
        )
    )


# ---------------------------------------------------------------------------
# llm_ann_join_topk_scaled — the batched ANN join at RAISED K (32
# coarse cells vs the family's 8): the production scale knob the
# docstrings promise ("raise K so cells stay 10⁴–10⁵ rows"),
# certified.  Same query table, routing rule, and top-k contract as
# llm_ann_join_topk; only the index granularity changes, so the two
# registered results are directly comparable and the r10 sf10
# measurement quantifies the knob (candidate scan per query drops
# ~4× with cells 4× smaller at equal nprobe — BASELINE.md).  K is a
# constant in both expression trees; seeds remain the first-K rule,
# so the oracle's CTE chain is the same builder at n_cells=32.
# ---------------------------------------------------------------------------

_ANNJ_K_SCALED = 32


def _ann_join_scaled_oracle() -> str:
    k = _KMEANS_ITERS
    return f"""
WITH {_sql_kmeans_ctes(n_cells=_ANNJ_K_SCALED)},
qset AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id % {_ANNJ_QMOD} = 0),
route AS (
  SELECT qid, qv, cid FROM (
    SELECT q.qid, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {sql_cosine("q.qv", "c.cv")} DESC, c.cid) AS rn
    FROM qset q CROSS JOIN cent{k} c
  ) WHERE rn <= {_ANNJ_NPROBE}
),
cand AS (
  SELECT r.qid, a.vec_id, {sql_cosine("a.v", "r.qv")} AS cos_sim
  FROM a{k} a JOIN route r ON a.cid = r.cid
  WHERE a.vec_id <> r.qid
)
SELECT qid, vec_id, cos_sim, CAST(rk AS BIGINT) AS rk,
       CAST({_ANNJ_K_SCALED} AS BIGINT) AS k_cells
FROM (
  SELECT qid, vec_id, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, vec_id) AS rk
  FROM cand
) WHERE rk <= {_ANNJ_TOPK}
"""


@register("llm_ann_join_topk_scaled", _ann_join_scaled_oracle())
def llm_ann_join_topk_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched ANN join on the K=32 index (see block comment)."""
    from maxscale_cdc_spark.operators.llm import kmeans_cells_cached

    e = wide_table(spark, sf_dir, "embeddings")
    cents, assigned = kmeans_cells_cached(spark, sf_dir, _ANNJ_K_SCALED)
    assigned = assigned.select("vec_id", "v", "cid").localCheckpoint(eager=True)
    qset = (
        e.filter(F.col("vec_id") % _ANNJ_QMOD == 0)
        .select(F.col("vec_id").alias("qid"), as_double("embedding").alias("qv"))
    )
    route = (
        qset.crossJoin(F.broadcast(cents))
        .select("qid", "qv", "cid", cosine(F.col("qv"), F.col("cv")).alias("sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")
            ),
        )
        .filter(F.col("rn") <= _ANNJ_NPROBE)
        .select("qid", "qv", "cid")
    )
    cand = (
        assigned.join(F.broadcast(route), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cos_sim")
        )
    )
    wk = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        cand.withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= _ANNJ_TOPK)
        .select(
            "qid",
            "vec_id",
            "cos_sim",
            "rk",
            F.lit(_ANNJ_K_SCALED).cast("long").alias("k_cells"),
        )
    )


# ---------------------------------------------------------------------------
# llm_ann_mmr_e2e_scaled — the composed retrieval path on the RAISED-K
# index (r10 verdict ask #1): llm_ann_mmr_e2e rides the family default
# K=8 coarse cells, and its own sf10 measurement (BASELINE.md r10,
# 167.6 s dominated by the candidate equi-join) is 2.6x the cost of the
# IDENTICAL join at K=32 (llm_ann_join_topk_scaled, 172.5 -> 64.1 s) —
# the production RAG path should ride the production knob.  Same query
# sample, routing rule (nprobe=2 of the broadcast centroid table),
# top-C candidate pool, and integer-MMR selection as the base op; only
# the index granularity changes, exported as the constant k_cells
# column so the two registered results are directly comparable.
# Registered as a VARIANT (not a rewrite) so the freshly-green base op
# keeps its certification — the llm_ann_join_topk_scaled precedent.
#
# Scale: candidate scan per query is proportional to nprobe * N/K —
# 4x less work per query at K=32 with cells 4x smaller; at 100 TB the
# knob follows the docstring rule "raise K so cells stay 10^4-10^5
# rows".  The MMR stage cost is unchanged (C^2-bounded per query after
# candidates), so the whole e2e saving is the candidate-join saving.
# ---------------------------------------------------------------------------

_ANNMMR_K_SCALED = _ANNJ_K_SCALED  # ride the SAME raised-K production index


@register("llm_ann_mmr_e2e_scaled", _ann_mmr_oracle(n_cells=_ANNMMR_K_SCALED))
def llm_ann_mmr_e2e_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_ann_mmr_e2e on the K=32 raised-K index (see block
    comment)."""
    return _ann_mmr_frame(spark, sf_dir, stage=True, n_cells=_ANNMMR_K_SCALED)


# ---------------------------------------------------------------------------
# llm_knn_graph_search — GRAPH-based ANN (the r13 verdict's ask #5):
# greedy BEAM SEARCH over the existing k-NN graph (llm_knn_graph's
# registered edge set — the HNSW-layer-0 / NSG serving pattern), the
# one modern vector-index shape the engine lacked next to IVF, PQ and
# LSH.  Per probe query (vec_id % 100 = 0, the _ANNJ_QMOD set):
#
#   hop 0     the beam starts at the corpus's deterministic entry
#             point (min vec_id), scored against the query
#   hop 1..3  expand the beam along graph edges (ONE equi-join
#             frontier⋈edges per hop — the rel_graph_khop frontier
#             discipline, each hop's scored set staged), keep the
#             beam-width-3 best by (cosine DESC, vec_id)
#   result    top-5 of the whole VISITED POOL (every node scored on
#             any hop), self excluded; in_exact_topk audits each hit
#             against the brute-force top-5 (the IVF-recall pattern)
#
# Everything is a total order (rounded cosine ties break by vec_id),
# so the walk — hence the visited pool — is deterministic in both
# engines; the oracle unrolls the 3 hops as MATERIALIZED CTEs over
# the SAME knn-edge SQL (DuckDB default-inlines CTEs — the khop
# lesson).  Beam search trades the IVF family's cell scans for
# O(hops·beam·k) edge lookups per query — the shape that wins when
# the graph is prebuilt and queries are point-shaped.
#
# Scale: the graph build is llm_knn_graph's banded-LSH join (never
# all-pairs), staged once and consumed by all hops; each hop is an
# equi-join keyed on the node id with the frontier bounded by
# beam·k·|queries| rows (no cartesian anywhere — plan-gated); the
# brute-force audit is oracle-scale only, not the serving path.  At
# 100 TB the edge table is bucketed by src and each hop is a
# co-located join; beam state is |queries|·beam rows — trivially
# broadcastable.
# ---------------------------------------------------------------------------

_GS_BEAM = 3
_GS_HOPS = 3
_GS_TOPK = 5


def _knn_graph_search_oracle() -> str:
    from maxscale_cdc_spark.operators.llm import _KNN_ORACLE

    cos = sql_cosine("v.v", "q.qv")
    hops = []
    for h in range(1, _GS_HOPS + 1):
        hops.append(f"""c{h} AS (
  SELECT b.qid, k.dst AS node FROM b{h - 1} b JOIN knn k ON k.src = b.node
  UNION
  SELECT qid, node FROM b{h - 1}
),
s{h} AS MATERIALIZED (
  SELECT c.qid, c.node, {cos} AS cs
  FROM c{h} c
  JOIN vecs2 v ON v.vec_id = c.node
  JOIN qs q ON q.qid = c.qid
),
b{h} AS MATERIALIZED (
  SELECT qid, node, cs FROM (
    SELECT qid, node, cs,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cs DESC, node) AS rn
    FROM s{h}) WHERE rn <= {_GS_BEAM}
)""")
    hop_sql = ",\n".join(hops)
    pool_union = "\n    UNION ALL ".join(
        [f"SELECT qid, node, cs FROM s{h}" for h in range(1, _GS_HOPS + 1)]
    )
    return f"""
WITH knn AS MATERIALIZED ({_KNN_ORACLE}),
vecs2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qs AS MATERIALIZED (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id % {_ANNJ_QMOD} = 0
),
entry AS (SELECT min(vec_id) AS node FROM embeddings),
b0 AS MATERIALIZED (
  SELECT q.qid, en.node, {cos} AS cs
  FROM qs q CROSS JOIN entry en JOIN vecs2 v ON v.vec_id = en.node
),
{hop_sql},
pool AS (
  SELECT DISTINCT qid, node, cs FROM (
    SELECT qid, node, cs FROM b0
    UNION ALL {pool_union})
),
res AS (
  SELECT qid, node, cs,
         CAST(row_number() OVER (PARTITION BY qid
                                 ORDER BY cs DESC, node) AS BIGINT) AS rk
  FROM pool WHERE node <> qid
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, v.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {cos} DESC, v.vec_id) AS erk
    FROM vecs2 v JOIN qs q ON v.vec_id <> q.qid
  ) WHERE erk <= {_GS_TOPK}
)
SELECT r.qid, r.node AS vec_id, r.cs AS cos_sim, r.rk,
       (e.vec_id IS NOT NULL) AS in_exact_topk
FROM res r LEFT JOIN exact e ON e.qid = r.qid AND e.vec_id = r.node
WHERE r.rk <= {_GS_TOPK}
"""


def _knn_graph_search_plan(
    spark: SparkSession, sf_dir: str, stage: bool = True
) -> DataFrame:
    """Builder for llm_knn_graph_search; `stage=False` skips the
    localCheckpoint staging so the plan gate can see the whole raw
    lineage (CLAUDE.md rule 5)."""
    from maxscale_cdc_spark.operators.llm import llm_knn_graph

    def st(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if stage else df  # eager: anti-convoy (r15)

    e = table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", as_double("embedding").alias("v"))
    vn = vecs.select(F.col("vec_id").alias("node"), "v")
    qs = vecs.filter(F.col("vec_id") % _ANNJ_QMOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    # the graph, staged once: all hops consume it (iterated lineage)
    edges = st(llm_knn_graph(spark, sf_dir).select("src", "dst"))
    entry = vecs.agg(F.min("vec_id").alias("node"))
    beam = (
        qs.crossJoin(F.broadcast(entry))
        .join(vn, "node")
        .select("qid", "node", cosine(F.col("v"), F.col("qv")).alias("cs"))
    )
    pool_parts = [beam.select("qid", "node", "cs")]
    wb = W.partitionBy("qid").orderBy(F.col("cs").desc(), "node")
    for _ in range(_GS_HOPS):
        cand = (
            beam.join(edges, beam["node"] == edges["src"])
            .select("qid", F.col("dst").alias("node"))
            .unionByName(beam.select("qid", "node"))
            .distinct()
        )
        scored = st(
            cand.join(vn, "node")
            .join(F.broadcast(qs), "qid")
            .select("qid", "node", cosine(F.col("v"), F.col("qv")).alias("cs"))
        )
        pool_parts.append(scored)
        beam = (
            scored.withColumn("rn", F.row_number().over(wb))
            .filter(F.col("rn") <= _GS_BEAM)
            .select("qid", "node", "cs")
        )
    pool = pool_parts[0]
    for p in pool_parts[1:]:
        pool = pool.unionByName(p)
    pool = pool.distinct().filter(F.col("node") != F.col("qid"))
    res = (
        pool.withColumn("rk", F.row_number().over(wb).cast("long"))
        .filter(F.col("rk") <= _GS_TOPK)
    )
    exact = (
        vecs.join(F.broadcast(qs), F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", cosine(F.col("v"), F.col("qv")).alias("ecos")
        )
        .withColumn(
            "erk",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("ecos").desc(), "vec_id")
            ),
        )
        .filter(F.col("erk") <= _GS_TOPK)
        .select("qid", F.col("vec_id").alias("node"), F.lit(True).alias("hit"))
    )
    return res.join(exact, ["qid", "node"], "left").select(
        "qid",
        F.col("node").alias("vec_id"),
        F.col("cs").alias("cos_sim"),
        "rk",
        F.coalesce("hit", F.lit(False)).alias("in_exact_topk"),
    )


@register("llm_knn_graph_search", _knn_graph_search_oracle())
def llm_knn_graph_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beam search (width 3, 3 hops) over the k-NN graph from the
    deterministic entry point, visited-pool top-5 per probe query with
    the brute-force recall audit (see block comment)."""
    return _knn_graph_search_plan(spark, sf_dir)


# ---------------------------------------------------------------------------
# llm_ann_binary_hamming — BINARY-QUANTIZED retrieval: the 32×
# compression storage knob (sign-bit binarization, Jégou-family
# baseline; what production vector stores ship as "binary quantization
# + rescore").  Each 64-dim float vector becomes TWO packed BIGINTs
# (sign bits of dims 1–32 / 33–64; two words because bit 63 of a
# single 64-bit pack would overflow signed BIGINT arithmetic in the
# Σ2^(i−1) formulation both engines share).  Candidate generation
# ranks by Hamming distance (bit_count(xor)) — integer, exact, and at
# scale a popcount over packed words at ~1/32 the scan bytes of the
# float index — then the top-20 candidates are RESCORED with exact
# cosine and the top-5 audited against brute-force float top-5
# (recall@5), per probe.
#
# Determinism: Hamming is integer with (hd, vec_id) tie-break; cosines
# cross the boundary 6-dp rounded; recall is an integer ratio /5.
#
# Scale: probes = every 100th vector (bounded probe TABLE, broadcast);
# the Hamming pass is probe×corpus over TWO BIGINT columns (the whole
# point: the float corpus is never scanned for candidates); rescoring
# touches 20 floats-vectors per probe; the brute-force arm exists ONLY
# as the audit (sampled probes), exactly like llm_ivf_recall.
# ---------------------------------------------------------------------------

_BH_QMOD = 100
_BH_CAND = 20
_BH_K = 5


def _bh_oracle() -> str:
    cos = sql_cosine("c.v", "q.qv")
    return f"""
WITH v0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_sum(list_transform(generate_series(1, 32),
           i -> CASE WHEN embedding[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
                     ELSE CAST(0 AS BIGINT) END)) AS lo,
         list_sum(list_transform(generate_series(33, 64),
           i -> CASE WHEN embedding[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 33))
                     ELSE CAST(0 AS BIGINT) END)) AS hi
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, v AS qv, lo AS qlo, hi AS qhi
  FROM v0 WHERE vec_id % {_BH_QMOD} = 0
), cand AS (
  SELECT q.qid, c.vec_id, q.qv, c.v,
         row_number() OVER (PARTITION BY q.qid
             ORDER BY bit_count(xor(q.qlo, c.lo)) + bit_count(xor(q.qhi, c.hi)),
                      c.vec_id) AS hrk
  FROM q JOIN v0 c ON c.vec_id <> q.qid
), rr AS (
  SELECT qid, vec_id, cos_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rk
  FROM (
    SELECT c.qid, c.vec_id, {sql_cosine("c.v", "c.qv")} AS cos_sim
    FROM cand c WHERE c.hrk <= {_BH_CAND}
  ) c
), exact AS (
  SELECT q.qid, c.vec_id,
         row_number() OVER (PARTITION BY q.qid
             ORDER BY {cos} DESC, c.vec_id) AS erk
  FROM q JOIN v0 c ON c.vec_id <> q.qid
)
SELECT r.qid,
       max(CASE WHEN r.rk = 1 THEN r.cos_sim END) AS best_cos,
       CAST(count(e.vec_id) AS BIGINT) AS n_hit,
       CAST(count(e.vec_id) AS DOUBLE) / {_BH_K}.0 AS recall
FROM rr r
LEFT JOIN exact e
  ON r.qid = e.qid AND r.vec_id = e.vec_id AND e.erk <= {_BH_K}
WHERE r.rk <= {_BH_K}
GROUP BY r.qid
"""


@register("llm_ann_binary_hamming", _bh_oracle())
def llm_ann_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit binary quantization: Hamming candidates → exact-cosine
    rescore → recall@5 audit vs brute force (see block comment)."""
    e = wide_table(spark, sf_dir, "embeddings")
    pack = lambda a, b, off: F.expr(
        f"aggregate(sequence({a}, {b}), 0L, (acc, i) -> acc + "
        f"CASE WHEN element_at(embedding, i) > 0D THEN shiftleft(1L, i - {off}) "
        f"ELSE 0L END)"
    )
    v0 = e.select(
        "vec_id",
        as_double("embedding").alias("v"),
        pack(1, 32, 1).alias("lo"),
        pack(33, 64, 33).alias("hi"),
    ).localCheckpoint(eager=True)  # packed+float lineage consumed 3×
    q = v0.filter(F.col("vec_id") % _BH_QMOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    # The candidate pass carries ONLY (qid, vec_id, hd) — 24 bytes/row
    # — through the per-probe top-20 window; the float vectors are
    # re-joined for the <=20 survivors.  Carrying both 64-dim arrays
    # through the window sort spills |probes|x|corpus| KB-rows (the
    # sf10 probe filled 50+ GB of spill before this split).
    ham = (
        v0.select("vec_id", "lo", "hi")
        .crossJoin(F.broadcast(q.select("qid", "qlo", "qhi")))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (
                F.bit_count(F.expr("qlo ^ lo")) + F.bit_count(F.expr("qhi ^ hi"))
            ).alias("hd"),
        )
    )
    wh = W.partitionBy("qid").orderBy("hd", "vec_id")
    cand = (
        ham.withColumn("hrk", F.row_number().over(wh))
        .filter(F.col("hrk") <= _BH_CAND)
        .select("qid", "vec_id")
    )
    rr = (
        cand.join(v0.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(q.select("qid", "qv")), "qid")
        .select("qid", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cos_sim"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
            ),
        )
        .filter(F.col("rk") <= _BH_K)
    )
    exact = (
        v0.crossJoin(F.broadcast(q.select("qid", "qv")))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine(F.col("v"), F.col("qv")).alias("ecos"))
        .withColumn(
            "erk",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("ecos").desc(), "vec_id")
            ),
        )
        .filter(F.col("erk") <= _BH_K)
        .select("qid", "vec_id")
    )
    return (
        rr.join(exact.withColumn("hit", F.lit(1)), ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("cos_sim"))).alias("best_cos"),
            F.count("hit").cast("long").alias("n_hit"),
            (F.count("hit").cast("double") / float(_BH_K)).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# llm_centroid_classifier — nearest-centroid EVALUATION (Rocchio
# classification): label prototypes are fit on the TRAIN split
# (vec_id % 5 ≠ 0, the deterministic split convention) with the Q1.30
# exact elementwise mean, held-out vectors (vec_id % 5 = 0) are
# assigned to their max-cosine prototype, and the export is the
# CONFUSION MATRIX plus per-true-label recall share — the quality
# gate a pipeline runs on embedding+label integrity before using
# labels for mixture/curriculum decisions (the eval-side complement
# of llm_embed_outliers, which scores only the own-label similarity).
#
# Exactness: centroids are integer-Q1.30 rationals; cosines cross the
# boundary 6-dp rounded; argmax is the (cos DESC, pred) total order;
# share is one integer-ratio division.
#
# Scale: the train pass is one (label, dim) combinable aggregation;
# prototypes are |labels| rows — BROADCAST; the test pass is a
# map-side cross with |labels| rows per vector then a per-vector
# argmax window — scan-speed, no corpus shuffle; the confusion
# rollup is |labels|² rows.
# ---------------------------------------------------------------------------


def _centroid_cls_oracle() -> str:
    cos = sql_cosine("t.v", "c.cv")
    return f"""
WITH flat AS (
  SELECT label, i.i AS dim,
         CAST(floor(CAST(embedding AS DOUBLE[])[i.i] * {_Q30F}) AS BIGINT) AS q30
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) i
  WHERE vec_id % 5 <> 0
), m AS (
  SELECT label, dim,
         CAST(sum(q30) AS DOUBLE) / (count(*) * {_Q30F}) AS m
  FROM flat GROUP BY label, dim
), cent AS (
  SELECT label, list(m ORDER BY dim) AS cv FROM m GROUP BY label
), test AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 5 = 0
), best AS (
  SELECT vec_id, label, pred FROM (
    SELECT t.vec_id, t.label, c.label AS pred,
           row_number() OVER (PARTITION BY t.vec_id
                              ORDER BY {cos} DESC, c.label) AS rn
    FROM test t CROSS JOIN cent c
  ) WHERE rn = 1
), tot AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM best GROUP BY label
)
SELECT CAST(b.label AS BIGINT) AS label,
       CAST(b.pred AS BIGINT) AS pred,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE) / min(t.n_label) AS share
FROM best b JOIN tot t ON b.label = t.label
GROUP BY b.label, b.pred
"""


@register("llm_centroid_classifier", _centroid_cls_oracle())
def llm_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-split Rocchio prototypes → held-out argmax assignment →
    confusion matrix + per-label recall share (see block comment)."""
    e = table(spark, sf_dir, "embeddings")
    train = e.filter(F.col("vec_id") % 5 != 0).select(
        "label", as_double("embedding").alias("v")
    )
    cent = q30_mean_arrays(train, "label")
    test = e.filter(F.col("vec_id") % 5 == 0).select(
        "vec_id", F.col("label").alias("tlabel"), as_double("embedding").alias("v")
    )
    cos = F.round(
        dot(F.col("v"), F.col("cv"))
        / F.sqrt(norm_sq(F.col("v")) * norm_sq(F.col("cv"))),
        6,
    )
    scored = test.crossJoin(F.broadcast(cent)).select(
        "vec_id", "tlabel", F.col("label").alias("pred"), cos.alias("cos")
    )
    best = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "pred")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "tlabel", "pred")
    )
    tot = best.groupBy("tlabel").agg(F.count("*").cast("long").alias("n_label"))
    return (
        best.join(tot, "tlabel")
        .groupBy(
            F.col("tlabel").cast("long").alias("label"),
            F.col("pred").cast("long").alias("pred"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.count("*").cast("double") / F.min("n_label")).alias("share"),
        )
    )
