#!/usr/bin/env python
"""spark-submit entry point for the offline archive-compaction pass.

The analogue of CLP's out-of-band archive building: reads a committed
run's sink table (written with ``--sink-layout archive``), template-
clusters it with ``compact_archive`` (operators/archive.py — identical
rows, ~33% fewer stored bytes, row groups prunable by logtype footer
stats), and writes the clustered copy to ``--output``.  The source run
is never modified; point consumers (``load_sinks`` reads the layout
from the data marker, so copy ``_lineage`` alongside, as this job does)
at the new root once the write commits.

    spark-submit --py-files fluent_bit_clp_spark.zip jobs/compact_sinks.py \
        --input <sink-root> --output <clustered-root> --run-id run-2026-08-16
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="committed run root")
    ap.add_argument("--output", required=True, help="clustered copy root")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--num-partitions", type=int, default=None)
    args = ap.parse_args()

    import os
    import shutil

    from pyspark.sql import SparkSession

    from fluent_bit_clp_spark.operators.archive import compact_archive
    from fluent_bit_clp_spark.plans import lineage

    marker = lineage.read_data_marker(args.input, args.run_id)
    if marker.get("sink_layout", "working") != "archive":
        raise ValueError(
            f"run '{args.run_id}' at {args.input!r} is not an archive-layout "
            "run; compaction clusters the archive template column"
        )

    spark = SparkSession.builder.appName("clp-archive-compaction").getOrCreate()
    sinks = spark.read.parquet(os.path.join(args.input, "sinks"))
    rows = sinks.count()
    (
        compact_archive(sinks, num_partitions=args.num_partitions)
        .write.mode("error")
        .partitionBy("sink")
        .parquet(os.path.join(args.output, "sinks"))
    )
    # verify FIRST, then commit the lineage sidecar: the copied data
    # marker is what makes the new root look committed to load_sinks, so
    # it must be the LAST artifact to appear (same tmp-last ordering as
    # plans/lineage.py's own commit protocol; review fix r5 — copying
    # before the check left a committed-looking root on a failed verify)
    out_rows = spark.read.parquet(os.path.join(args.output, "sinks")).count()
    if out_rows != rows:
        raise RuntimeError(
            f"row count changed during compaction: {rows} -> {out_rows}"
        )
    src_lin = os.path.join(args.input, "_lineage")
    if os.path.isdir(src_lin):
        # per-sink manifests carry absolute 'path' fields under the OLD
        # root — rewrite them to the new root during the copy (review
        # fix r5: a verbatim copy pointed consumers at the source run)
        for root, _, files in os.walk(src_lin):
            rel = os.path.relpath(root, src_lin)
            dst_dir = os.path.join(args.output, "_lineage", rel)
            os.makedirs(dst_dir, exist_ok=True)
            for f in files:
                src_f = os.path.join(root, f)
                if f.endswith(".json"):
                    with open(src_f) as fh:
                        payload = json.load(fh)
                    if isinstance(payload.get("path"), str):
                        payload["path"] = payload["path"].replace(
                            args.input.rstrip("/"), args.output.rstrip("/"), 1
                        )
                    with open(os.path.join(dst_dir, f), "w") as fh:
                        json.dump(payload, fh)
                else:
                    shutil.copy2(src_f, os.path.join(dst_dir, f))
    print(json.dumps({"rows": rows, "run_id": args.run_id, "compacted": True}))
    spark.stop()


if __name__ == "__main__":
    main()
