"""Generate a 10x scale-up of the sf0.1 test tables for scale-stress
sweeps (the r5 verdict's ask #3: "divergence appears at scale first").

The driver provides sf{0.001,0.01,0.1} (TESTDATA.md, read-only).  This
tool derives an sf1.0-shaped dataset from sf0.1 — NOT a replacement
for driver data (correctness gates still run on the driver's files):
its only job is to feed the same Spark-vs-DuckDB oracle comparison 10x
more rows so scale-dependent divergence (decimal overflow, tie-break
instability, state blowup, quadratic candidate sets) has somewhere to
appear.

Construction (copy k = 0..9, all deterministic):
- region/nation: unchanged (fixed dims).
- customer/supplier/part/orders/lineitem/events: k copies with every
  id column shifted by k*10^8 (one rule for all key families keeps
  FK joins — o_custkey->c_custkey, l_orderkey->o_orderkey,
  events.user_id->c_custkey — consistent within a copy).  Non-key
  columns unchanged: 10x density in the same value/time domain.
- documents: copy 0 verbatim; copy 1 drops one word (a ~0.99-Jaccard
  NEAR-DUP of the original — stresses the near-dup family with real
  duplicate classes); copy 2 is a VERBATIM SNIPPET (first 12 words of
  the original, for docs >= 24 words — containment ~1.0 against copy
  0 but J ~= 11/(len-1), the asymmetric jacc_missed=true shape the
  r10 honesty note found structurally absent from the derived
  corpora; shorter docs fall back to the stride shuffle); copies 3..9
  stride-shuffle the words (same word multiset — token stats scale
  cleanly — but bigram shingles are destroyed, so they are NOT
  near-dups and the candidate set stays sane).
- embeddings: copy 0 verbatim; copies k>0 rotate the vector by k
  (distinct directions, same norm distribution).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf1.0"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFF = 100_000_000  # id shift per copy; all sf0.1 id spaces are < 10^8


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )

    shifted = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for t, keys in shifted.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + k.k * {OFF} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"""COPY (
              SELECT {sel}
              FROM '{SRC}/{t}.parquet', (SELECT unnest(generate_series(0, {K - 1})) AS k) k
              ORDER BY k.k
            ) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"""
        )

    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    out = []
    for k in range(K):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * OFF
        if k == 1:
            def drop_one(row_text, did):
                w = row_text.split(" ")
                if len(w) > 3:
                    del w[did % len(w)]
                return " ".join(w)

            d["text"] = [
                drop_one(t, int(i)) for t, i in zip(docs["text"], docs["doc_id"])
            ]
        elif k >= 2:
            def stride(row_text, s=k):
                w = row_text.split(" ")
                return " ".join(
                    w[i] for r in range(s) for i in range(r, len(w), s)
                )

            if k == 2:
                # containment copy: verbatim 12-word prefix snippet
                # (jacc_missed=true vs copy 0 once the original has
                # >2x the snippet's shingles, i.e. >= 24 words)
                def snippet(row_text):
                    w = row_text.split(" ")
                    if len(w) >= 24:
                        return " ".join(w[:12])
                    return stride(row_text)

                d["text"] = [snippet(t) for t in docs["text"]]
            else:
                d["text"] = [stride(t) for t in docs["text"]]
        d["n_chars"] = d["text"].str.len().astype("int64")
        out.append(d)
    pd.concat(out, ignore_index=True).to_parquet(
        f"{DST}/documents.parquet", index=False
    )

    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    eout = []
    for k in range(K):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + k * OFF
        if k > 0:
            e["embedding"] = [
                np.roll(np.asarray(v, dtype=np.float32), k) for v in emb["embedding"]
            ]
        eout.append(e)
    pd.concat(eout, ignore_index=True).to_parquet(
        f"{DST}/embeddings.parquet", index=False
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
