"""Judge helper: run a slice of the pinned SLT list and report failures.

Usage: python tools/judge_slt_check.py <start> <end>
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

if sys.argv[1] == "--files":
    rels = sys.argv[2:]
    start, end = 0, len(rels)
else:
    start, end = int(sys.argv[1]), int(sys.argv[2])
    rels = [
        line.strip()
        for line in open("tests/slt_green_files.txt")
        if line.strip()
    ][start:end]

from databend_spark.session import get_spark  # noqa: E402
from databend_spark.testkit import run_slt_file  # noqa: E402

spark = get_spark(f"judge_slt_{start}")
bad = []
tp = 0
for rel in rels:
    path = "/root/reference/" + rel
    try:
        rep = run_slt_file(spark, path)
    except Exception as e:  # noqa: BLE001
        bad.append((rel, f"EXC {e}"))
        print(f"BAD  {rel}  EXC {e}", flush=True)
        continue
    tp += rep.passed
    if rep.failed:
        bad.append((rel, rep.failures[:2]))
        print(f"BAD  {rel}  {rep.failed} failed: {rep.failures[:2]}", flush=True)
    else:
        print(f"ok   {rel} ({rep.passed})", flush=True)

print(f"SUMMARY slice {start}:{end} files={len(rels)} cases_passed={tp} bad={len(bad)}")
for rel, info in bad:
    print("FAILFILE", rel, str(info)[:300])
