"""Round-close artifact: run the FULL catalog (every oracled entry,
not just the driver's 50-entry window) through the DuckDB value-hash
parity harness at the DRIVER'S gate scale (sf0.01 — the in-suite sweep
runs at sf0.001) and write one JSON file the judge can diff round over
round.

Usage: python tools/full_parity_artifact.py [sf_dir] [out_path]
Defaults: /root/testdata/sf0.01 → PARITY_sf0.01.json
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_path = args[1] if len(args) > 1 else "PARITY_sf0.01.json"

    from ariadne_cartograph_spark.plans.oracle_harness import run_catalog_parity
    from ariadne_cartograph_spark.session import get_spark

    spark = get_spark("full-parity")
    t0 = time.time()
    reports = run_catalog_parity(spark, sf_dir)
    wall = round(time.time() - t0, 1)
    entries = {
        r.name: {
            "ok": r.ok,
            "rows": r.spark_rows,
            "spark_sec": r.spark_sec,
            "oracle_sec": r.oracle_sec,
            **({"error": r.error} if r.error else {}),
        }
        for r in reports
    }
    n_fail = sum(1 for r in reports if not r.ok)
    out = {
        "sf_dir": sf_dir,
        "n_entries": len(reports),
        "n_fail": n_fail,
        "wall_sec": wall,
        "entries": entries,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{len(reports)} entries, {n_fail} failing, {wall}s -> {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
