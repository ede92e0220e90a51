"""Dump .explain('formatted') for catalog entries to plans/$PLANS_ROUND/
(default r12).

Usage: python scripts/dump_plan.py SF_DIR SUFFIX entry [entry ...]

Writes plans/<round>/<entry>_<SUFFIX>.txt (SUFFIX = before|after). The
formatted plan is the JUDGE's evidence for plan-shape claims in
OPTIMIZATION_<round>.md — capture before and after every touched entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygr_spark.queries import QUERIES  # noqa: E402
from pygr_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plan")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
