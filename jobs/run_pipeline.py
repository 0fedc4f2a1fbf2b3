#!/usr/bin/env python
"""spark-submit entry point for the transcript encode pipeline.

Cluster usage (the north_star deployment shape):

    zip -r fluent_bit_clp_spark.zip fluent_bit_clp_spark
    spark-submit --py-files fluent_bit_clp_spark.zip jobs/run_pipeline.py \
        --input <iceberg-table-or-parquet-path> \
        --output <sink-root> --run-id run-2026-08-16

Local smoke:

    spark-submit --master 'local[8]' --py-files fluent_bit_clp_spark.zip \
        jobs/run_pipeline.py --input /tmp/transcripts --output /tmp/out

Re-running with the same --run-id resumes: committed sinks are skipped
(per-sink atomic manifests, plans/lineage.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--upload-size-mb", type=int, default=16)
    ap.add_argument("--block-turns", type=int, default=8192)
    ap.add_argument(
        "--input-format",
        choices=["transcripts", "msgpack"],
        default="transcripts",
        help="'msgpack': a directory of Fluent Bit msgpack chunk files "
        "(decoded with FlbTime/uint64 timestamp semantics, single-key "
        "message extraction, routed as one stream per chunk file)",
    )
    ap.add_argument("--ts-mode", choices=["v1", "v2"], default="v2")
    ap.add_argument(
        "--encoding",
        choices=["i64", "4byte"],
        default="i64",
        help="'4byte': CLP FourByteEncoding parity (int32 ints, 32-bit "
        "float property words; out-of-range values become dictionary vars)",
    )
    ap.add_argument(
        "--timezone",
        default="America/Toronto",  # reference config default (config.go:35,62)
        help="IANA timezone serialized into IR-stream preambles",
    )
    ap.add_argument(
        "--sink-layout",
        choices=["working", "archive"],
        default="working",
        help="'archive': write sinks in the columnar archive layout "
        "(kind-typed placeholders, derivable columns dropped — 0.57x "
        "stored bytes; consumers reconstruct with from_archive)",
    )
    ap.add_argument(
        "--emit-ir-chunks",
        action="store_true",
        help="additionally materialize the reference's per-chunk compressed "
        "IR-stream blobs (<sink>_<chunk>_<time>_<id>.zst keys) under "
        "<output>/ir_chunks, derived from the committed columnar output",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fluent_bit_clp_spark.plans.pipeline import run_to_sinks
    from fluent_bit_clp_spark.sources.tables import JobConfig, load_transcripts

    cfg = JobConfig(
        input_path=args.input,
        output_dir=args.output,
        run_id=args.run_id,
        upload_size_mb=args.upload_size_mb,
        block_turns=args.block_turns,
        encoding_mode=args.encoding,
        timezone=args.timezone,
        sink_layout=args.sink_layout,
    ).validate()

    spark = SparkSession.builder.appName("clp-transcript-pipeline").getOrCreate()
    if args.input_format == "msgpack":
        from fluent_bit_clp_spark.sources.msgpack import (
            msgpack_to_transcripts,
            read_msgpack_files,
        )

        df = msgpack_to_transcripts(
            read_msgpack_files(spark, cfg.input_path, args.ts_mode),
            use_single_key=cfg.use_single_key,
            single_key=cfg.single_key,
            allow_missing_key=cfg.allow_missing_key,
        )
    else:
        df = load_transcripts(spark, cfg.input_path)
    result = run_to_sinks(
        spark, df, cfg.output_dir, cfg.run_id, cfg=cfg,
        emit_ir_chunks=args.emit_ir_chunks,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
