"""Re-run every file pinned green in tests/slt_green_files.txt and
report any that regressed. Usage: python tools/sweep_pins.py [out_file]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

GREEN = os.path.join(os.path.dirname(__file__), "..", "tests", "slt_green_files.txt")


def main() -> None:
    from databend_spark.session import get_spark
    from databend_spark.testkit import run_slt_file

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pin_sweep.txt"
    spark = get_spark("pin_sweep")
    pins = [line.strip() for line in open(GREEN) if line.strip()]
    bad: list[str] = []
    tp = tf = 0
    with open(out_path, "w") as out:
        for i, rel in enumerate(pins):
            path = "/root/reference/" + rel
            try:
                r = run_slt_file(spark, path)
            except Exception as e:  # noqa: BLE001
                bad.append(rel)
                out.write(f"ERR {rel}: {str(e)[:200]}\n")
                out.flush()
                continue
            tp += r.passed
            tf += r.failed
            if not r.ok:
                bad.append(rel)
                out.write(
                    f"BAD {rel}: {r.passed}p {r.failed}f"
                    f" {[x[:160] for x in r.failures[:2]]}\n"
                )
                out.flush()
            if (i + 1) % 50 == 0:
                out.write(f"... {i + 1}/{len(pins)} done, {len(bad)} bad\n")
                out.flush()
        out.write(
            f"\nTOTAL: {tp} pass, {tf} fail; {len(bad)} regressed of"
            f" {len(pins)} pins\n"
        )
        for b in bad:
            out.write(f"REGRESSED {b}\n")
    print(f"{len(bad)} regressed of {len(pins)}; details in {out_path}")


if __name__ == "__main__":
    main()
