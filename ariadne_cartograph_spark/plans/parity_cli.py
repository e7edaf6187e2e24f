"""Fast iteration loop: ``python -m ariadne_cartograph_spark.plans.parity_cli [sf_dir] [names...]``"""

from __future__ import annotations

import sys
import time

from ..session import get_spark
from .oracle_harness import run_catalog_parity


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or None
    spark = get_spark("parity")
    t0 = time.time()
    reports = run_catalog_parity(spark, sf_dir, names)
    n_fail = 0
    for r in reports:
        print(r.describe())
        n_fail += 0 if r.ok else 1
    print(f"-- {len(reports)} queries, {n_fail} failing, {time.time() - t0:.1f}s")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
