"""Corpus-curation operators for training-data pipelines (driver brief
§extras): benchmark decontamination, stratified sampling, and duplicate
connected components.

All deterministic and scale-shaped:

- **decontaminate**: docs sharing any word n-gram with a benchmark set
  are flagged.  The benchmark side is small by definition → its shingle
  hashes broadcast; the corpus side explodes shingles and semi-joins —
  one map-side pass over the corpus, no corpus shuffle.
- **stratified_sample**: exact deterministic per-stratum rates via the
  portable hash (``pmod(hash(id), 10000) < rate·10000``) — reproducible
  across runs/cluster sizes, no RNG, oracle-checkable.
- **dup_components**: connected components over near-dup pairs
  (min-label propagation, iterations bounded by the component diameter's
  log) so whole duplicate FAMILIES collapse to one canonical id — pair
  lists alone under-merge transitive groups (a~b, b~c but not a~c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_clp_spark.functions.hashing import portable_hash64
from fluent_bit_clp_spark.operators.dedup import exploded_shingles

SAMPLE_BUCKETS = 10_000


def benchmark_shingle_hashes(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct hashed word n-grams of the benchmark set (the contamination
    probes).  Small side — broadcast it."""
    sh = exploded_shingles(benchmark, [], text_col, n)
    return sh.select(portable_hash64(F.col("sh")).alias("probe")).distinct()


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    keep: bool = True,
) -> DataFrame:
    """Drop (or flag) corpus docs sharing any word ``n``-gram with the
    benchmark — the standard eval-set decontamination pass.

    ``keep=True`` returns the clean corpus (anti-join); ``keep=False``
    returns the contaminated doc ids with their matching probe count.
    """
    probes = F.broadcast(benchmark_shingle_hashes(benchmark, text_col, n))
    sh = exploded_shingles(corpus, [id_col], text_col, n)
    hits = (
        sh.select(id_col, portable_hash64(F.col("sh")).alias("probe"))
        .join(probes, "probe")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    if keep:
        return corpus.join(hits.select(id_col), id_col, "left_anti")
    return hits


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling at exact hash-bucket rates.

    A row survives iff ``pmod(hash(id), 10000) < rate(stratum)·10000`` —
    reproducible across runs and cluster sizes (no RNG, no sampling
    variance beyond the hash), and the rate literal map folds into the
    scan's filter.  The standard mixture-weight knob for training-data
    pipelines.
    """
    pairs = []
    for k, v in rates.items():
        pairs.extend([F.lit(k), F.lit(int(round(v * SAMPLE_BUCKETS)))])
    thresholds = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)),
        F.lit(int(round(default_rate * SAMPLE_BUCKETS))),
    )
    bucket = F.pmod(
        portable_hash64(F.col(id_col).cast("string"), seed),
        F.lit(SAMPLE_BUCKETS),
    )
    return df.where(bucket < thresholds)


def dup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over duplicate pairs → (member, canonical).

    Min-label propagation: every node repeatedly adopts the smallest
    label among itself and its neighbors.  Convergence is O(component
    diameter) rounds — near-dup families are cliques-ish (LSH surfaces
    most pairs directly), so diameters are small in practice; a
    pathological 50+-hop edit chain raises rather than silently
    under-merging (switch to large-star/small-star if that ever bites).
    Each round is one join + groupBy-min on uniform hash keys.

    Canonical member = the component's minimum id, matching
    ``minhash_dedup``'s keep-min policy.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        # materialize once: the loop re-reads edges every round, and the
        # upstream pairs plan (minhash → banding → Jaccard) must not
        # re-execute per iteration
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        # truncate lineage each round (iterative joins otherwise stack an
        # exponentially deepening plan); the convergence check is an
        # action anyway, so the checkpoint rides it
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            return labels.select(
                F.col("node").alias("member"), F.col("label").alias("canonical")
            )
    raise RuntimeError(
        f"dup_components did not converge in {max_iters} iterations"
    )
