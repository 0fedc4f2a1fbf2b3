"""Materialize the deterministic transcripts(2000) table to a committed
parquet fixture so DuckDB can recompute pipeline aggregates over the SAME
rows the driver-contract queries use (VERDICT r3 #5: pipeline_sink_counts
was rows-only for lack of a DuckDB-visible copy of the generated table).

The generator is bit-identical at any parallelism/seed (datagen.py:
arithmetic-only, no RNG), so the fixture doubles as a regression pin: if
datagen ever changes, the spark-vs-fixture hash comparison fails loudly
instead of silently drifting.

Run from the repo root:  PYTHONPATH=. python tools/make_fixtures.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluent_bit_clp_spark.datagen import transcripts  # noqa: E402
from fluent_bit_clp_spark.session import get_spark  # noqa: E402

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "transcripts2000",
)


def main() -> None:
    spark = get_spark(cpus=8)
    # coalesce(1): one small part file in git, stable layout
    transcripts(spark, 2000).coalesce(1).write.mode("overwrite").parquet(
        FIXTURE_DIR
    )
    n = spark.read.parquet(FIXTURE_DIR).count()
    print(f"wrote {n} rows to {FIXTURE_DIR}")
    spark.stop()


if __name__ == "__main__":
    main()
