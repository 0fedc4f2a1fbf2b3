#!/usr/bin/env python
"""Round-7 optimization measurement harness (guide §1: measure first).

NOT the frozen driver bench — ``bench.py`` stays untouched.  This file
isolates the per-query costs with the noop sink (guide §1.4), labels jobs
(§1.5), and dumps ``explain("formatted")`` for each query so before/after
plan diffs land in ``plans/r07/``.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 [--queries a,b,...]
  python bench_extra.py --explain before   # dump plans/r07/<q>_before.txt
  python bench_extra.py --headline         # time the encode pipeline only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "e1_logtype_extract",
    "e1_logtype_dict",
    "e1_var_classes",
    "e1_encode_4byte",
    "e1_logtype_dense_dist",
    "e3_chunk_stats",
    "p6_level_histogram",
    "r1_route_counts",
    "s1_msgpack_decode",
    "t_quality",
    "d_minhash_sigs",
    "d_shingles",
    "a_ann_topk",
    "d_lsh_pairs",
    "h_pricing_summary",
]


def _min_time(fn, reps: int = 3) -> float:
    fn()  # JIT warmup, untimed
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def time_queries(sf_dir: str, names: list[str], reps: int = 3) -> dict:
    import __spark_entry__ as E
    from fluent_bit_clp_spark.session import get_spark

    spark = get_spark(app_name="bench-extra")
    qs = E.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        out[name] = _min_time(
            lambda: qs[name](spark, sf_dir)
            .write.mode("overwrite")
            .format("noop")
            .save(),
            reps,
        )
        print(f"{name}: {out[name]}s", flush=True)
    spark.stop()
    return out


def dump_plans(sf_dir: str, names: list[str], tag: str) -> None:
    import __spark_entry__ as E
    from fluent_bit_clp_spark.session import get_spark

    spark = get_spark(app_name="bench-extra-explain")
    qs = E.queries()
    os.makedirs("plans/r07", exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(f"plans/r07/{name}_{tag}.txt", flush=True)
    spark.stop()


def time_headline(sf_dir: str, reps: int = 3) -> dict:
    from fluent_bit_clp_spark.datagen import write_transcripts
    from fluent_bit_clp_spark.plans.pipeline import (
        encode_pipeline,
        write_block_offsets,
    )
    from fluent_bit_clp_spark.session import get_spark

    base = os.path.basename(sf_dir.rstrip("/"))
    sf = float(base.replace("sf", "") or 0.1)
    n_turns = max(50_000, int(10_000_000 * sf))
    spark = get_spark(app_name="bench-extra-headline")
    tmp = tempfile.mkdtemp(prefix="clpbenchx-")
    try:
        input_path = os.path.join(tmp, "transcripts")
        write_transcripts(spark, input_path, n_turns)
        df = spark.read.parquet(input_path)
        offs_path = os.path.join(tmp, "offsets")

        def compute_once():
            offs = write_block_offsets(spark, df, offs_path)
            enc = encode_pipeline(df, spark, offsets=offs)
            enc.write.mode("overwrite").format("noop").save()

        # split timings: offsets job alone, then full
        def offsets_only():
            write_block_offsets(spark, df, offs_path)

        spark.sparkContext.setJobDescription("bench_extra:headline-offsets")
        offs_sec = _min_time(offsets_only, reps)
        spark.sparkContext.setJobDescription("bench_extra:headline-compute")
        total_sec = _min_time(compute_once, reps)
        return {
            "turns": n_turns,
            "offsets_sec": offs_sec,
            "compute_noop_sec": total_sec,
        }
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None)
    ap.add_argument("--explain", default=None, metavar="TAG")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else BENCH_QUERIES
    if args.explain:
        dump_plans(args.sf_dir, names, args.explain)
        return
    if args.headline:
        res = time_headline(args.sf_dir, args.reps)
        print(json.dumps(res))
        return
    res = time_queries(args.sf_dir, names, args.reps)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
