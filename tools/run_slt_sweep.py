"""Sweep the reference's sqllogictest suites and report pass/fail per
file. Usage: python tools/run_slt_sweep.py [glob...]

Prints each file's result as it completes (so a hung query is
identifiable by the last-started file) and skips files already pinned
green in tests/slt_green_files.txt (pass --all to include them).
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, ".")

DEFAULT_GLOBS = [
    "duckdb/sql/**/*.test",
    "duckdb/join/**/*.test",
    "duckdb/subquery/**/*.test",
    "duckdb/common/**/*.test",
]
ROOT = "/root/reference/tests/sqllogictests/suites/"
GREEN = os.path.join(os.path.dirname(__file__), "..", "tests", "slt_green_files.txt")


def main() -> None:
    from databend_spark.session import get_spark
    from databend_spark.testkit import run_slt_file

    args = [a for a in sys.argv[1:] if a != "--all"]
    include_pinned = "--all" in sys.argv[1:]

    spark = get_spark("slt_sweep")
    globs = args or DEFAULT_GLOBS
    files: set[str] = set()
    for g in globs:
        files.update(glob.glob(ROOT + g, recursive=True))
    if not include_pinned and os.path.exists(GREEN):
        pinned = {
            "/root/reference/" + line.strip()
            for line in open(GREEN)
            if line.strip()
        }
        files -= pinned

    tp = tf = green = 0
    for f in sorted(files):
        rel = f.split("suites/")[-1]
        print(f"RUN {rel}", flush=True)
        try:
            r = run_slt_file(spark, f)
        except Exception as e:  # noqa: BLE001
            print(f"ERR {rel}: {str(e)[:200]}", flush=True)
            continue
        tp += r.passed
        tf += r.failed
        green += r.ok and r.passed > 0
        print(
            f"{'OK ' if r.ok else 'BAD'} {rel}: "
            f"{r.passed}p {r.failed}f {r.skipped}s",
            flush=True,
        )
    print(f"\nTOTAL: {tp} pass, {tf} fail; {green}/{len(files)} files fully green")


if __name__ == "__main__":
    main()
