"""Property-based tests (hypothesis) for the CDC semantics that must
hold on ANY stream, not just the fixtures: GTID total ordering,
resume-filter correctness, dedup idempotence, latest-state determinism
under shuffled delivery order, and schema-decode totality."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from maxscale_cdc_spark.sources.schema_registry import decode_field

gtids = st.tuples(
    st.integers(0, 3), st.integers(1000, 1002), st.integers(0, 50)
)


@given(st.lists(gtids, min_size=1, max_size=30), gtids)
def test_resume_filter_is_tuple_order(events, start):
    """The GTID struct comparison must equal Python tuple comparison —
    the reference's resume contract (client.go:122-126)."""
    kept = [e for e in events if e >= start]
    # mirror of resume_filter's predicate, evaluated symbolically
    kept2 = [
        e
        for e in events
        if e[0] > start[0]
        or (e[0] == start[0] and (e[1] > start[1] or (e[1] == start[1] and e[2] >= start[2])))
    ]
    assert kept == kept2


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "name": st.text(min_size=1, max_size=8),
                "type": st.one_of(
                    st.sampled_from(["int", "string", "double", "long", "boolean"]),
                    st.lists(
                        st.sampled_from(["null", "int", "string", "long"]),
                        min_size=1,
                        max_size=3,
                    ),
                    st.fixed_dictionaries(
                        {
                            "type": st.just("enum"),
                            "symbols": st.lists(st.text(max_size=4), max_size=4),
                        }
                    ),
                ),
            }
        ),
        max_size=10,
    )
)
def test_decode_field_total(fields):
    """Every well-formed polymorphic descriptor decodes (event.go:58-137
    handles all three encodings without panic)."""
    for f in fields:
        fd = decode_field(f)
        assert fd.spark_type() is not None
        json.dumps(fd.name)  # name survives


@settings(deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=8)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),        # pk
            st.integers(0, 100),      # sequence
            st.sampled_from(["insert", "update_after", "update_before", "delete"]),
            st.integers(-1000, 1000), # value (int → exact)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    ),
    st.randoms(),
)
def test_latest_state_order_invariant(spark, events, rnd):
    """CDC-apply must produce identical state for ANY delivery order of
    the same events (at-least-once redelivery + shuffling must not
    change the materialized table)."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.operators.cdc import latest_state

    def run(evs):
        rows = [
            (0, 3000, seq, 1, pk, t, float(v), seq) for (pk, seq, t, v) in evs
        ]
        df = spark.createDataFrame(
            rows,
            "domain int, server_id int, sequence long, event_number int, "
            "pk long, dml_type string, value double, ts_unix long",
        )
        return sorted(map(tuple, latest_state(df).collect()))

    shuffled = list(events)
    rnd.shuffle(shuffled)
    assert run(events) == run(shuffled + events)  # shuffled + duplicated


@settings(deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=6)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=50))
def test_dedup_idempotent(spark, keys):
    """dropDuplicates on the event key is idempotent and multiplicity-
    insensitive (exactly-once materialization from at-least-once
    delivery)."""
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    doubled = df.unionAll(df).unionAll(df)
    assert sorted(
        r["k"] for r in doubled.dropDuplicates(["k"]).collect()
    ) == sorted(set(keys))


def test_min_label_closure_collapses_chains(spark):
    """A 3-chain (1-2, 2-3) and a 5-chain must collapse to ONE keeper
    each under the fixed-point propagation — the 1-hop shortcut would
    leave 3 thinking its rep is 2."""
    from pyspark.sql import functions as F

    from maxscale_cdc_spark.operators.llm import min_label_closure

    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (13, 14), (20, 21)]
    cand = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    neighbors = cand.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("nb")
    ).unionByName(
        cand.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("nb"))
    )
    reps = {r["doc_id"]: r["cluster_rep"] for r in min_label_closure(spark, neighbors).collect()}
    assert reps == {1: 1, 2: 1, 3: 1,
                    10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                    20: 20, 21: 20}


@settings(deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=6)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),            # pk
            st.sampled_from(["insert", "update_after", "delete"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_changelog_compact_net_semantics(spark, ops):
    """Replaying a compacted (pk, batch) net operation against a sink
    must produce the same final presence as replaying every original
    event: present iff the last DML is not a delete; and the compacted
    image must be the LAST image."""
    from pyspark.sql import functions as F

    rows = [
        (pk, seq, dml, float(seq))  # value tracks sequence so image == last
        for seq, (pk, dml) in enumerate(ops)
    ]
    df = spark.createDataFrame(rows, "pk long, sequence long, dml_type string, value double")
    agg = df.groupBy("pk").agg(
        F.min_by("dml_type", "sequence").alias("first_dml"),
        F.max_by("dml_type", "sequence").alias("last_dml"),
        F.max_by("value", "sequence").alias("last_value"),
    )
    net = (
        F.when((F.col("first_dml") == "insert") & (F.col("last_dml") == "delete"), "none")
        .when(F.col("first_dml") == "insert", "insert")
        .when(F.col("last_dml") == "delete", "delete")
        .otherwise("update")
    )
    out = {r["pk"]: (r["net"], r["last_value"]) for r in agg.select("pk", net.alias("net"), "last_value").collect()}
    # reference semantics replayed in Python
    state: dict[int, float] = {}
    last: dict[int, tuple[str, float]] = {}
    for seq, (pk, dml) in enumerate(ops):
        last[pk] = (dml, float(seq))
        if dml == "delete":
            state.pop(pk, None)
        else:
            state[pk] = float(seq)
    for pk, (net_op, lv) in out.items():
        present_after_replay = pk in state
        if net_op in ("none", "delete"):
            assert not present_after_replay, (pk, net_op)
        else:
            assert present_after_replay and state[pk] == lv, (pk, net_op, lv)


@settings(deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=6)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.booleans()),  # (bucket, acked)
        min_size=1,
        max_size=40,
    )
)
def test_safe_resume_replay_covers_unacked(spark, events):
    """The WithGTID invariant: resuming each consumer partition at
    safe_resume_seq + 1 must replay EVERY unacked event exactly once
    and never replay an acked event that precedes the first unacked."""
    from pyspark.sql import functions as F

    rows = [(b, seq, acked) for seq, (b, acked) in enumerate(events)]
    df = spark.createDataFrame(rows, "bucket int, sequence long, acked boolean")
    firsts = df.groupBy("bucket").agg(
        F.min(F.when(~F.col("acked"), F.col("sequence"))).alias("first_unacked")
    )
    joined = df.join(firsts, "bucket")
    safe = (
        joined.groupBy("bucket")
        .agg(
            F.max(
                F.when(
                    F.col("acked")
                    & (
                        F.col("first_unacked").isNull()
                        | (F.col("sequence") < F.col("first_unacked"))
                    ),
                    F.col("sequence"),
                )
            ).alias("safe")
        )
        .collect()
    )
    safe_by_bucket = {r["bucket"]: r["safe"] for r in safe}
    by_bucket: dict[int, list[tuple[int, bool]]] = {}
    for b, seq, acked in rows:
        by_bucket.setdefault(b, []).append((seq, acked))
    for b, evs in by_bucket.items():
        resume_from = (safe_by_bucket[b] if safe_by_bucket[b] is not None else -1) + 1
        replayed = {seq for seq, _ in evs if seq >= resume_from}
        unacked = {seq for seq, acked in evs if not acked}
        # every unacked event is replayed
        assert unacked <= replayed, (b, resume_from, unacked, replayed)
        # nothing before the first unacked is replayed
        first_un = min(unacked) if unacked else None
        if first_un is not None:
            assert all(seq >= resume_from for seq in unacked)
            assert resume_from <= first_un


@settings(deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=6)
@given(st.lists(st.integers(0, 15), min_size=1, max_size=60))
def test_countmin_one_sided_error(spark, items):
    """The CMS guarantee: for ANY stream, the sketch estimate of every
    item is >= its exact count (hash collisions only ever inflate)."""
    from collections import Counter

    from pyspark.sql import functions as F

    d, w = 3, 8
    df = spark.createDataFrame([(str(x),) for x in items], "tok string")
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row_id")

    def bucket(row_col, tok_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(row_col.cast("string"), F.lit(":"), tok_col)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % w
        )

    cells = (
        df.select("tok", rows)
        .select("row_id", bucket(F.col("row_id"), F.col("tok")).alias("bucket"))
        .groupBy("row_id", "bucket")
        .agg(F.count("*").alias("n"))
    )
    probes = (
        df.select("tok").distinct().select("tok", rows)
        .select("tok", "row_id", bucket(F.col("row_id"), F.col("tok")).alias("bucket"))
    )
    est = {
        r["tok"]: r["est"]
        for r in probes.join(cells, ["row_id", "bucket"])
        .groupBy("tok")
        .agg(F.min("n").alias("est"))
        .collect()
    }
    exact = Counter(str(x) for x in items)
    for tok, n in exact.items():
        assert est[tok] >= n, (tok, est[tok], n)


# ---------------------------------------------------------------------------
# BPE greedy matcher: the Python kernel must agree with an independent
# replay of the spec (longest vocab match at each position, else one
# char) — and with the DuckDB recursive-CTE oracle formulation, on
# arbitrary words, not just corpus words.
# ---------------------------------------------------------------------------

_word = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122), max_size=24
)


@settings(deadline=None)  # DuckDB per-example cost is host-load-sensitive
@given(st.lists(_word, min_size=1, max_size=20))
def test_bpe_token_count_matches_recursive_oracle(words_):
    import duckdb

    from maxscale_cdc_spark.operators.bpe import (
        _VOCAB_BY_LEN,
        _VOCAB_VALUES,
        _token_count,
    )

    for wd in words_:
        n = _token_count(wd)
        if wd:
            assert 1 <= n <= len(wd), (wd, n)
            # ceil(len / longest-merge) lower bound
            assert n >= -(-len(wd) // len(_VOCAB_BY_LEN[0])), (wd, n)
        else:
            assert n == 0
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in set(words_) if w)
    if not vals:
        return
    rows = con.execute(
        f"""
        WITH RECURSIVE vocab(v, vl) AS (VALUES {_VOCAB_VALUES}),
        uw(wd) AS (VALUES {vals}),
        steps(wd, pos, ntok) AS (
          SELECT wd, 1, 0 FROM uw
          UNION ALL
          SELECT wd,
                 pos + coalesce((SELECT max(vl) FROM vocab
                                 WHERE substr(wd, pos, vl) = v), 1),
                 ntok + 1
          FROM steps WHERE pos <= len(wd)
        )
        SELECT wd, max(ntok) FROM steps GROUP BY wd
        """
    ).fetchall()
    for wd, n_oracle in rows:
        assert _token_count(wd) == n_oracle, (wd, _token_count(wd), n_oracle)


# ---------------------------------------------------------------------------
# Z-order key: interleaving is a bijection on the low 16 bits per
# dimension — the Spark integer-expression pipeline must decode back
# to its inputs (otherwise file min/max boxes lie and pruning is
# silently wrong).
# ---------------------------------------------------------------------------

@settings(deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=6)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**31 - 1), st.integers(0, 2**20)),
        min_size=1,
        max_size=12,
    )
)
def test_zorder_key_bijective_on_low_bits(spark, pairs):
    from maxscale_cdc_spark.operators.sources import _Z_BITS, _zkey
    from pyspark.sql import functions as F

    def py_z(u, h):
        z = 0
        for i in range(_Z_BITS):
            z += ((u >> i) & 1) << (2 * i)
            z += ((h >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "u long, h long")
    got = {
        (r["u"], r["h"]): r["z"]
        for r in df.withColumn("z", _zkey(F.col("u"), F.col("h"))).collect()
    }
    for u, h in pairs:
        z = got[(u, h)]
        assert z == py_z(u, h), (u, h, z)
        # decode: even bits → u low 16, odd bits → h low 16
        ud = sum(((z >> (2 * i)) & 1) << i for i in range(_Z_BITS))
        hd = sum(((z >> (2 * i + 1)) & 1) << i for i in range(_Z_BITS))
        assert ud == u % (1 << _Z_BITS) and hd == h % (1 << _Z_BITS)


# ---------------------------------------------------------------------------
# BPE merge application: the left-to-right FOLD both engines run
# (replace the accumulator's last symbol when (last, next) == (a, b))
# must equal the reference greedy SCAN (Sennrich et al.'s merge_word:
# walk left to right, pair (a, b) on sight, skip past the merge) on
# arbitrary symbol sequences — including runs of the merged pair,
# where a naive string replace provably diverges.
# ---------------------------------------------------------------------------

_sym = st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=99), min_size=1, max_size=2)


def _merge_scan(seq, a, b):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _merge_fold_py(seq, a, b):
    acc = []
    for x in seq:
        if acc and acc[-1] == a and x == b:
            acc[-1] = a + b
        else:
            acc.append(x)
    return acc


@given(st.lists(_sym, min_size=1, max_size=12), _sym, _sym)
def test_bpe_merge_fold_equals_greedy_scan(seq, a, b):
    assert _merge_fold_py(seq, a, b) == _merge_scan(seq, a, b), (seq, a, b)


# ---------------------------------------------------------------------------
# cdc_lww_conflicts' packed LWW key must be ORDER-ISOMORPHIC to the
# lexicographic (ts, origin, sequence) order within the documented
# bounds (ts < 2^31, origin in {0,1}, sequence < 2^31) — a packing
# that inverts any pair silently crowns the wrong winner.
# ---------------------------------------------------------------------------

_ts = st.integers(min_value=0, max_value=2**31 - 1)
_seqno = st.integers(min_value=0, max_value=2**31 - 1)
_origin = st.integers(min_value=0, max_value=1)


def _pack(ts, origin, seq):
    return (ts * 2 + origin) * 2**31 + seq


@given(_ts, _origin, _seqno, _ts, _origin, _seqno)
def test_lww_pack_order_isomorphic(t1, o1, s1, t2, o2, s2):
    lex = (t1, o1, s1) < (t2, o2, s2)
    packed = _pack(t1, o1, s1) < _pack(t2, o2, s2)
    assert lex == packed
    assert _pack(t1, o1, s1) < 2**63  # stays in BIGINT


# ---------------------------------------------------------------------------
# Systematic weighted sampling picks EXACTLY K per group when every
# weight is positive: the number of stride boundaries crossed over the
# whole walk is div(total*K, total) = K.  (llm_importance_resample's
# ~K claim is actually exact; pin it.)
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=500))
def test_systematic_sampling_picks_exactly_k(weights, k):
    total = sum(weights)
    cum = 0
    picked = 0
    for w in weights:
        cum += w
        if (cum * k) // total > ((cum - w) * k) // total:
            picked += 1
    # every boundary multiple of total/k is crossed exactly once, and
    # a single doc can absorb several boundaries but counts once —
    # picks = distinct docs under boundaries <= k, == k only when no
    # doc spans multiple boundaries; in general 1 <= picks <= min(k, n)
    assert 1 <= picked <= min(k, len(weights))
    if max(weights) * k < total:  # no doc spans a full stride
        assert picked == k
