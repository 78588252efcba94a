"""Shared MinHash/LSH banding constants + oracle-SQL builders.

LEAF module (imports nothing from the operator family) so that BOTH
`operators/llm.py` (the production dedup family) and
`operators/autotune.py` (the recall-governed chooser) can build their
oracle SQL from ONE source of truth — the round-9 propagation (r8
verdict ask #1) makes every member of the dedup family band at the
MEASURED config, so the chooser's CTE chain must be embeddable in
every family oracle without import cycles.

The measured problem this governs (llm_lsh_recall_audit, BASELINE.md):
a FIXED banding's recall against the exact set-similarity join decays
as the corpus grows — 0.980 (sf0.1) → 0.830 (sf1.0) for the old
hard-coded 2×4 — because the reference's at-least-once replay
(client.go:253-287) grows near-dup mass with corpus size.  SCALING.md
rule: recall is a knob to MEASURE per corpus, never a constant to
hard-code.

Exactness discipline (CLAUDE.md rule 3): the recall floor and the
verify-cost budget are pure BIGINT cross-multiplies, the chooser is a
total order over integers, and both engines (Spark via
`autotune.chosen_banding`, DuckDB via `chosen_cte`) evaluate the SAME
expression tree over the SAME sampled curve.
"""

from __future__ import annotations

from maxscale_cdc_spark.functions.sample import (
    sql_hash_sample,
    sql_hash_sample_expr,
)

K16 = 16                 # signature width: every config splits a prefix of 16
SAMPLE_PCT = 40          # tuning-stage hash sample, max percentage
# Corpus-size cap on the tuning sample (round-9 sf10 stress finding):
# at a fixed 40% the sampled exact-truth prefix join grew super-linear
# on a permutation-dense derived corpus (500k docs, trigram vocabulary
# saturated → "rare" prefix tokens no longer rare → >200 GB shuffle
# spill).  An ESTIMATOR's cost must be corpus-size-flat: the effective
# percentage is least(40, ceil(100·CAP_DOCS / n_docs)) — byte-identical
# to the old fixed 40% at every oracle-checked scale (n ≤ 50k docs ⇒
# pct = 40) and a fixed ~20k-doc sample beyond.  Both engines compute
# the pct from the SAME count, so the sampled doc set stays identical.
CAP_DOCS = 20_000
# (bands, rows_per_band).  P(candidate | J=0.5): 2×4 0.12 / 2×8 0.008 /
# 3×4 0.18 / 4×3 0.44 / 4×4 0.23 / 5×3 0.51 / 8×2 0.90 — the mid-curve
# points (r8 verdict ask #4) exist to meet the recall floor below 8×2's
# candidate mass.
CONFIGS = ((2, 4), (2, 8), (3, 4), (4, 3), (4, 4), (5, 3), (8, 2))
FLOOR_NUM, FLOOR_DEN = 19, 20   # recall floor 0.95 = 19/20, pure ints
# Verify-cost ceiling, priced in PRODUCTION (bigram) space (round-9
# sf10 finding — see sampled_curve_ctes): within budget ⟺ the
# config's sampled bigram-class candidate-pair count stays at or under
# CAND_BUDGET_PER_DOC verify checks per sampled document.  Absolute
# and per-doc (the verify bill a run actually pays is linear in docs),
# not relative to trigram-space true pairs — the two spaces' pair
# counts differ by orders of magnitude.
CAND_BUDGET_PER_DOC = 50
COST_CEIL_MULT = 8  # retained for curve context (legacy trigram ratio)
JACCARD_MIN = 0.5

# Trigram shingle sets over a pre-split `docw(doc_id, w)` CTE — the
# chooser's shingle space (matches llm.trigram_sets).
TRIGRAM_SQL = """
  tset AS (
    SELECT doc_id, list_sort(list_distinct(list_transform(generate_series(1, len(w) - 2),
                   i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shs
    FROM docw WHERE len(w) >= 3
  )"""

# K=16 minhash over a set-array column (one row per class)…
MH16_SET_SQL = ", ".join(
    f"list_min(list_transform(shs, s -> md5('{j}:' || s))) AS m{j}"
    for j in range(K16)
)
# …and over exploded (doc_id, sh) rows (doc-level GROUP BY) — identical
# values (min over the same md5 multiset).
MH16_GROUP_SQL = ", ".join(
    f"min(md5('{j}:' || sh)) AS m{j}" for j in range(K16)
)


def bands_sql(
    src: str, ident: str, nb: int, rpb: int, ord_col: str = "rep",
    extra_sel: str = "",
) -> str:
    """UNION ALL of one SELECT per band over `src` (which must expose
    `ident`, `ord_col`, m0..m{nb*rpb-1})."""
    sel_ord = "" if ord_col == ident else f", {ord_col}"
    parts = []
    for b in range(nb):
        key = " || ".join(f"m{j}" for j in range(b * rpb, (b + 1) * rpb))
        parts.append(
            f"SELECT {ident}{sel_ord}{extra_sel}, {b} AS band, {key} AS key"
            f" FROM {src}"
        )
    return "\nUNION ALL\n".join(parts)


def cand_sql(
    src: str,
    ident: str,
    out_a: str,
    out_b: str,
    nb: int,
    rpb: int,
    ord_col: str = "rep",
    extra_sel: str = "",
    extra_pred: str = "",
) -> str:
    """bands_{src}_{tag} + cand_{src}_{tag} CTE pair: distinct colliding
    (`out_a`, `out_b`) pairs (a.ord < b.ord) under an nb×rpb banding."""
    tag = f"{nb}x{rpb}"
    return f"""  bands_{src}_{tag} AS (
{bands_sql(src, ident, nb, rpb, ord_col=ord_col, extra_sel=extra_sel)}
  ),
  cand_{src}_{tag} AS (
    SELECT DISTINCT a.{ident} AS {out_a}, b.{ident} AS {out_b}
    FROM bands_{src}_{tag} a JOIN bands_{src}_{tag} b
      ON a.key = b.key AND a.band = b.band AND a.{ord_col} < b.{ord_col}{extra_pred}
  )"""


def sampled_curve_ctes(doc_src: str, bg_src: str) -> str:
    """CTE chain from a keyed doc table through the per-config sampled
    curve: `sclasses/smh/truth/bands_smh_*/cand_smh_*/scand/bgset/
    bgclasses/bgmh/bands_bgmh_*/cand_bgmh_*/bcand/nd/curve0/cfgs/nt/
    curve`.  `doc_src` must expose (doc_id, shs, ckey) — the TRIGRAM
    class space where exact recall is measurable (prefix joins stay
    selective).  `bg_src` must expose (doc_id, w) for the SAME sampled
    docs — the BIGRAM production space where each config's candidate
    COST is counted (round-9 sf10 finding: trigram-space candidate
    counts under-represented the production bigram banding's verify
    bill by 1000× at 8×2 — cost must be priced in the space the dedup
    family actually bands)."""
    cand_ctes = ",\n".join(
        cand_sql("smh", "ckey", "ckey_a", "ckey_b", nb, rpb)
        for nb, rpb in CONFIGS
    )
    scand_union = "\nUNION ALL\n".join(
        f"SELECT {nb} AS bands, {rpb} AS rows_per_band, ckey_a, ckey_b "
        f"FROM cand_smh_{nb}x{rpb}"
        for nb, rpb in CONFIGS
    )
    bcand_ctes = ",\n".join(
        cand_sql("bgmh", "ckey", "ckey_a", "ckey_b", nb, rpb)
        for nb, rpb in CONFIGS
    )
    bcand_union = "\nUNION ALL\n".join(
        f"SELECT {nb} AS bands, {rpb} AS rows_per_band, "
        f"CAST(count(*) AS BIGINT) AS n_cand_prod FROM cand_bgmh_{nb}x{rpb}"
        for nb, rpb in CONFIGS
    )
    cfg_values = ", ".join(
        f"({nb}, {rpb}, {nb * rpb})" for nb, rpb in CONFIGS
    )
    return f"""  sclasses AS (
    SELECT ckey, min(doc_id) AS rep, arg_min(shs, doc_id) AS shs
    FROM {doc_src} GROUP BY ckey
  ),
  smh AS MATERIALIZED (
    SELECT ckey, rep, shs, CAST(len(shs) AS BIGINT) AS sz, {MH16_SET_SQL}
    FROM sclasses
  ),
  truth AS MATERIALIZED (
    SELECT a.ckey AS ckey_a, b.ckey AS ckey_b
    FROM smh a JOIN smh b ON a.rep < b.rep
    WHERE CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
          / (a.sz + b.sz - len(list_intersect(a.shs, b.shs))) >= {JACCARD_MIN}
  ),
{cand_ctes},
  scand AS (
{scand_union}
  ),
  bgset AS (
    SELECT doc_id, list_sort(list_distinct(list_transform(generate_series(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i + 1]))) AS shs
    FROM {bg_src} WHERE len(w) >= 2
  ),
  bgclasses AS (
    SELECT md5(array_to_string(shs, chr(31))) AS ckey,
           min(doc_id) AS rep, arg_min(shs, doc_id) AS shs
    FROM bgset GROUP BY 1
  ),
  bgmh AS MATERIALIZED (
    SELECT ckey, rep, {MH16_SET_SQL} FROM bgclasses
  ),
{bcand_ctes},
  bcand AS (
{bcand_union}
  ),
  nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM bgset),
  curve0 AS (
    SELECT bands, rows_per_band,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(coalesce(sum(CASE WHEN t.ckey_a IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_caught
    FROM scand c LEFT JOIN truth t USING (ckey_a, ckey_b)
    GROUP BY bands, rows_per_band
  ),
  cfgs AS (SELECT * FROM (VALUES {cfg_values}) v(bands, rows_per_band, k_hashes)),
  nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
  curve AS MATERIALIZED (
    SELECT CAST(c.bands AS BIGINT) AS bands,
           CAST(c.rows_per_band AS BIGINT) AS rows_per_band,
           CAST(c.k_hashes AS BIGINT) AS k_hashes,
           CAST(coalesce(k.n_caught, 0) AS BIGINT) AS n_caught,
           CAST(coalesce(k.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(b.n_cand_prod, 0) AS BIGINT) AS n_cand_prod,
           (SELECT n_docs FROM nd) AS n_docs
    FROM cfgs c LEFT JOIN curve0 k
      ON k.bands = c.bands AND k.rows_per_band = c.rows_per_band
    LEFT JOIN bcand b
      ON b.bands = c.bands AND b.rows_per_band = c.rows_per_band
  )"""


def chosen_cte() -> str:
    """The `chosen(bands, rows_per_band)` CTE — the bi-criteria total
    order shared verbatim by every oracle embedding the chooser.
    Assumes CTEs `curve` and `nt` are in scope.

    Degradation ladder (round-9 sf10 finding): (1) meets floor AND
    budget → cheapest candidates; (2) nothing meets both → MAX RECALL
    among WITHIN-BUDGET configs; (3) nothing within budget → cheapest
    candidates.  The old ladder preferred the floor over the budget —
    on a duplicate-dense corpus where no config meets both, it picked
    8×2 and the full-corpus verify cost exploded (disk exhaustion at
    sf10).  An unpayable dedup is worse than a lower-recall one:
    recall degrades gracefully, verify cost stays bounded whenever it
    can be."""
    floor = f"{FLOOR_DEN} * n_caught >= {FLOOR_NUM} * n_true"
    budget = f"n_cand_prod <= {CAND_BUDGET_PER_DOC} * n_docs"
    return f"""  chosen AS MATERIALIZED (
    SELECT bands, rows_per_band FROM curve CROSS JOIN nt
    ORDER BY ({floor} AND {budget}) DESC,
             ({budget}) DESC,
             CASE WHEN {floor} AND {budget} THEN n_cand_prod
                  WHEN {budget} THEN -n_caught
                  ELSE n_cand_prod END,
             bands, rows_per_band
    LIMIT 1
  )"""


def sample_pct_ctes(prefix: str) -> str:
    """`{prefix}_n` / `{prefix}_pct` CTE pair computing the
    corpus-size-capped tuning-sample percentage (see CAP_DOCS)."""
    return f"""  {prefix}_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
  {prefix}_pct AS (
    SELECT least({SAMPLE_PCT}, greatest(1, (100 * {CAP_DOCS} + n - 1) // n)) AS pct
    FROM {prefix}_n
  )"""


def chooser_prefix_sql() -> str:
    """Self-contained CTE chain (no leading WITH, no trailing comma)
    from the raw `documents` table through `chosen(bands,
    rows_per_band)` — the block every recall-governed family oracle
    prepends so DuckDB reproduces the measured choice exactly.  CTE
    names (at_docw/at_tset/at_keyed + the sampled_curve_ctes names +
    chosen) are disjoint from the family oracles' own CTEs."""
    tri = TRIGRAM_SQL.replace("FROM docw", "FROM at_docw").replace(
        "  tset AS (", "  at_tset AS ("
    )
    return f"""{sample_pct_ctes('at')},
  at_docw AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
    WHERE {sql_hash_sample_expr('doc_id', 'SELECT pct FROM at_pct')}
  ),
{tri},
  at_keyed AS (
    SELECT doc_id, shs, md5(array_to_string(shs, chr(31))) AS ckey FROM at_tset
  ),
{sampled_curve_ctes('at_keyed', 'at_docw')},
{chosen_cte()}"""


def pair_sampled_prefix_sql(key_expr: str = "doc_id") -> str:
    """Sample → trigram classes → per-config class band candidates
    (`scand`), WITHOUT the chooser chain (no bigram cost CTEs, no
    `chosen`): the prefix for catch-rate tables that stratify the
    tuning sample by a PAIR/CLUSTER key instead of the doc endpoint
    (VERDICT r11 ask #4 — an endpoint sample keeps a cross-doc pair
    only when BOTH endpoints survive, so in-sample pair counts fall
    as pct²; sampling by the key that makes the pair a pair keeps
    them together and the denominator falls as pct).  CTE names
    reuse the chooser's `at_*` plus `sclasses/smh/cand_smh_*/scand`
    so family oracles read identically."""
    tri = TRIGRAM_SQL.replace("FROM docw", "FROM at_docw").replace(
        "  tset AS (", "  at_tset AS ("
    )
    cand_ctes = ",\n".join(
        cand_sql("smh", "ckey", "ckey_a", "ckey_b", nb, rpb)
        for nb, rpb in CONFIGS
    )
    scand_union = "\nUNION ALL\n".join(
        f"SELECT {nb} AS bands, {rpb} AS rows_per_band, ckey_a, ckey_b "
        f"FROM cand_smh_{nb}x{rpb}"
        for nb, rpb in CONFIGS
    )
    return f"""{sample_pct_ctes('at')},
  at_docw AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
    WHERE {sql_hash_sample_expr(key_expr, 'SELECT pct FROM at_pct')}
  ),
{tri},
  at_keyed AS (
    SELECT doc_id, shs, md5(array_to_string(shs, chr(31))) AS ckey FROM at_tset
  ),
  sclasses AS (
    SELECT ckey, min(doc_id) AS rep, arg_min(shs, doc_id) AS shs
    FROM at_keyed GROUP BY ckey
  ),
  smh AS MATERIALIZED (
    SELECT ckey, rep, shs, CAST(len(shs) AS BIGINT) AS sz, {MH16_SET_SQL}
    FROM sclasses
  ),
{cand_ctes},
  scand AS MATERIALIZED (
{scand_union}
  )"""


def chosen_doc_cand_ctes(
    mh_src: str,
    ident: str = "doc_id",
    out_a: str = "doc_a",
    out_b: str = "doc_b",
    ord_col: str = "doc_id",
    extra_sel: str = "",
    extra_pred: str = "",
    out_name: str = "cand",
) -> str:
    """Per-config band/cand CTEs over `mh_src` (which must expose
    `ident`, `ord_col` and m0..m15) + the final `{out_name}` CTE
    selecting the CHOSEN config's pairs.  Requires `chosen` in scope
    (chooser_prefix_sql)."""
    ctes = ",\n".join(
        cand_sql(
            mh_src, ident, out_a, out_b, nb, rpb,
            ord_col=ord_col, extra_sel=extra_sel, extra_pred=extra_pred,
        )
        for nb, rpb in CONFIGS
    )
    union = "\nUNION ALL\n".join(
        f"SELECT {nb} AS bands, {rpb} AS rows_per_band, {out_a}, {out_b} "
        f"FROM cand_{mh_src}_{nb}x{rpb}"
        for nb, rpb in CONFIGS
    )
    # MATERIALIZED: the chosen-config pair set is consumed by verify
    # joins AND (in the cluster family) a recursive reachability CTE —
    # DuckDB default-INLINES CTEs, which would recompute the whole
    # 7-config band join per recursion round (measured: 4 s → 230 s on
    # the capped-cluster oracle before this mark; CLAUDE.md rule 4).
    return f"""{ctes},
  cand_all_{mh_src} AS (
{union}
  ),
  {out_name} AS MATERIALIZED (
    SELECT c.{out_a}, c.{out_b} FROM cand_all_{mh_src} c
    JOIN chosen ch
      ON c.bands = ch.bands AND c.rows_per_band = ch.rows_per_band
  )"""
