"""Scale up the driver testdata by replicating fact tables with key
offsets (dims stay fixed), so bench.py can run at ~sf1 and show that the
per-query fixed overhead measured at sf0.1 amortizes with data size.

    python tools/gen_scale.py [factor] [src_dir] [out_dir]

Facts (orders, lineitem, events) replicate ``factor`` times with
surrogate-key offsets that keep joins consistent; dimensions and the LLM
corpus (documents/embeddings) copy through unchanged — duplicating
documents would quadratically inflate near-dup pair counts and distort
the dedup benchmarks rather than scale them.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(__file__), "..", "bench_data", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    passthrough = [
        "region", "nation", "customer", "supplier", "part",
        "documents", "embeddings",
    ]
    for t in passthrough:
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )

    o_max = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    e_max = con.execute(
        f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]

    reps = f"(SELECT unnest(range({factor})) AS __r)"
    con.execute(
        f"COPY (SELECT o_orderkey + __r * {o_max} AS o_orderkey, o_custkey, "
        f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        f"FROM '{src}/orders.parquet' CROSS JOIN {reps}) "
        f"TO '{out}/orders.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT l_orderkey + __r * {o_max} AS l_orderkey, l_partkey, "
        f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
        f"l_tax, l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{src}/lineitem.parquet' CROSS JOIN {reps}) "
        f"TO '{out}/lineitem.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT event_id + __r * {e_max} AS event_id, ts, user_id, "
        f"event_type, value, props "
        f"FROM '{src}/events.parquet' CROSS JOIN {reps}) "
        f"TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    for t in ["orders", "lineitem", "events"]:
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
