"""Sweep the reference's duckdb-ported sqllogictest suites and report
pass/fail per file. Usage: python tools/run_slt_sweep.py [glob...]"""

from __future__ import annotations

import glob
import sys

sys.path.insert(0, ".")

DEFAULT_GLOBS = [
    "duckdb/sql/**/*.test",
    "duckdb/join/**/*.test",
    "duckdb/subquery/**/*.test",
    "duckdb/common/**/*.test",
]
ROOT = "/root/reference/tests/sqllogictests/suites/"


def main() -> None:
    from databend_spark.session import get_spark
    from databend_spark.testkit import run_slt_file

    spark = get_spark("slt_sweep")
    globs = sys.argv[1:] or DEFAULT_GLOBS
    files: set[str] = set()
    for g in globs:
        files.update(glob.glob(ROOT + g, recursive=True))

    tp = tf = green = 0
    lines = []
    for f in sorted(files):
        try:
            r = run_slt_file(spark, f)
        except Exception as e:  # noqa: BLE001
            lines.append(f"ERR {f}: {e}")
            continue
        tp += r.passed
        tf += r.failed
        green += r.ok and r.passed > 0
        lines.append(
            f"{'OK ' if r.ok else 'BAD'} {f.split('suites/')[-1]}: "
            f"{r.passed}p {r.failed}f {r.skipped}s"
        )
    print("\n".join(lines))
    print(f"\nTOTAL: {tp} pass, {tf} fail; {green}/{len(files)} files fully green")


if __name__ == "__main__":
    main()
