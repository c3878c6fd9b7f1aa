#!/usr/bin/env python
"""Per-query isolation benchmarks for the optimization rounds (guide §1.4).

NOT part of the frozen measurement contract (bench.py is); this harness
exists so each optimization can be measured in isolation with the noop sink
and its physical plan captured, at any scale factor:

  python bench_extra.py --sf-dir /root/testdata/sf1.0 --queries minhash_lsh_neardups
  python bench_extra.py --plans-out plans/r06 --tag before

Prints one JSON line per run: {"queries": {name: sec}, "sf": ..., "total": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "events_hourly_rollup",
    "events_latest_per_user",
    "doc_token_stats",
    "join_semi_anti",
    "exact_dedup",
    "minhash_lsh_neardups",
    "simhash_neardup_pairs",
    "cosine_topk",
    "lsh_ann_neardups",
    "doc_quality",
    "doc_fingerprints",
    "ensemble_number_batch",
    "media_metadata",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans-out", default=None, help="directory to write <q>_<tag>.txt explain dumps")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    from ai_service_ocr_grading_handler_spark.plans import registry
    from ai_service_ocr_grading_handler_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cpus=args.cpus)
    qs = {**registry.library_queries(), **registry.queries()}
    names = args.queries or DEFAULT_QUERIES
    # warm the shuffle/codegen paths once, like bench.py does
    import pyspark.sql.functions as F

    spark.range(0, 1 << 16).groupBy((F.col("id") % 7).alias("k")).count().collect()

    times: dict[str, float] = {}
    for name in names:
        if args.plans_out:
            out = Path(args.plans_out)
            out.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            (out / f"{name}_{args.tag}.txt").write_text(plan)
        passes = []
        for _ in range(args.passes):
            spark.catalog.clearCache()
            df = qs[name](spark, args.sf_dir)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            passes.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        times[name] = round(min(passes), 3)
        print(f"#  {name}: {times[name]}  (passes: {[round(p,2) for p in passes]})", flush=True)
    print(json.dumps({"queries": times, "sf": args.sf_dir, "total": round(sum(times.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
