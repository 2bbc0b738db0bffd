#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to a plans dir —
plan-text only, no execution (the r15 dump tool; solo_time.py times
AND dumps, this one is for before/after plan evidence where no timing
is needed).

Usage:
  SPARK_GRAFT_SF_DIR=... python benchmarks/dump_plans_r15.py \
      --plans plans/r15 --suffix after name [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    assert args[0] == "--plans"
    plans_dir = Path(args[1])
    plans_dir.mkdir(parents=True, exist_ok=True)
    assert args[2] == "--suffix"
    suffix = args[3]
    names = args[4:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from etl_geonames_spark.session import get_spark

    spark = get_spark("dump-plans-r15")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (plans_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(name, "->", plans_dir / f"{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
