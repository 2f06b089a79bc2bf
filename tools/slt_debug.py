"""Run one or more SLT files and print every failure in full.
Usage: python tools/slt_debug.py <suite-relative-path>...
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

ROOT = "/root/reference/tests/sqllogictests/suites/"


def main() -> None:
    from databend_spark.session import get_spark
    from databend_spark.testkit import run_slt_file

    spark = get_spark("slt_debug")
    for rel in sys.argv[1:]:
        r = run_slt_file(spark, ROOT + rel)
        print(f"{'OK ' if r.ok else 'BAD'} {rel}: {r.passed}p {r.failed}f {r.skipped}s")
        for f in r.failures:
            print("----")
            print(f[:2000])


if __name__ == "__main__":
    main()
