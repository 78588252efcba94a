"""Capture `explain("formatted")` for registered queries (the judge's
plan evidence — plans/rNN/<query>_{before,after}.txt).

Usage: python tools/capture_plans.py <tag> <outdir> <id[,id...]> [repo_root]

`repo_root` (default: this file's parent's parent) lets the same script
run from a detached worktree at the round-start commit for the
"before" captures.  Building a lifecycle query's DataFrame executes its
fixture jobs — captures are therefore run per id in ONE session, after
the bench warmup, so the plan reflects the bench path.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    tag, outdir, ids_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    root = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.path.insert(0, root)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from maxscale_cdc_spark.session import get_spark

    spark = get_spark("plan-capture")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(outdir, exist_ok=True)
    for qid in ids_csv.split(","):
        df = qs[qid](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{qid}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"captured {qid}_{tag}", file=sys.stderr)


if __name__ == "__main__":
    main()
