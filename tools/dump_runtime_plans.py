"""Dump the AQE-FINAL executed plan for headline queries.

Usage: python tools/dump_runtime_plans.py r10 runtime [query ...]

Unlike tools/dump_plans.py (static .explain before execution), this
executes each query through the noop sink first and then prints
``queryExecution().executedPlan()`` — the post-execution adaptive plan
with every AQE decision (broadcast/shuffled-hash conversions,
AQEShuffleRead coalescing, reused exchanges) resolved. This is the
evidence the static dumps cannot show (r9 VERDICT: q9/q12/q13/q15 static
plans were byte-identical while the claimed wins were AQE-runtime).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    from bench import HEADLINE
    from databend_spark.session import get_spark
    from databend_spark.suite import queries

    spark = get_spark("dump_runtime_plans")
    qs = queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)
    names = [n for n in HEADLINE if not only or n in only]
    for name in names:
        df = qs[name](spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"runtime_plan:{name}")
        # drive df's OWN QueryExecution (a noop write wraps the plan in a
        # separate write command whose execution never finalizes df's
        # adaptive plan — it would dump isFinalPlan=false)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"sf_dir: {SF_DIR}\n\n{plan}")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
