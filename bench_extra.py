#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the frozen driver bench — ``bench.py`` stays the measured surface.
This file times a *subset* of declared queries with the same methodology
(content_hash consumption, min-of-N), optionally dumps
``.explain('formatted')`` plans to ``plans/r06/``, and can hash-compare a
query's output so a restructured query can be proven identical before the
oracle gate runs.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--plans SUBDIR] \
      [--hash] q1 q2 ...
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="dump explain('formatted') to plans/<SUBDIR>/<q>_<suffix>.txt")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--hash", action="store_true",
                    help="print (rows, content_hash) per query")
    args = ap.parse_args()

    from embulk_input_marketo_spark.functions.compare import content_hash
    from embulk_input_marketo_spark.plans.queries import QUERIES
    from embulk_input_marketo_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cores=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # warm

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = QUERIES[name]
        if args.plans:
            d = os.path.join(REPO_DIR, "plans", args.plans)
            os.makedirs(d, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(d, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        samples = []
        h = n = None
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            n, h = content_hash(df, df.columns)
            samples.append(round(time.perf_counter() - t0, 3))
        rec = {"min": min(samples), "samples": samples}
        if args.hash:
            rec["rows"] = n
            rec["hash"] = h
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"sf_dir": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
