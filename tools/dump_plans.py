"""Dump .explain("formatted") for registered queries to plans/<dir>/.

Usage: python tools/dump_plans.py --dir plans/r13 --suffix _after name...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakerulegeneration_spark import queries as Q
from datalakerulegeneration_spark.session import get_spark

_IMPLS = {name: impl for name, (impl, _) in Q.REGISTRY.items()}


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir, suffix = "plans/r13", "_after"
    if "--dir" in args:
        i = args.index("--dir")
        out_dir = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = args
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    for name in names:
        df = _IMPLS[name](spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(p)
        print(f"{path}: {len(p.splitlines())} lines")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
