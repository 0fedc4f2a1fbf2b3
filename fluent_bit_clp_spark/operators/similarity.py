"""Similarity search over embedding columns (driver brief §extras).

- :func:`cosine_topk`      — brute-force exact top-k, all native expressions
                             (``zip_with`` dot product + window rank).  The
                             correctness baseline; O(Q·N) — fine when the
                             query side broadcasts.
- :func:`lsh_topk`         — random-hyperplane LSH-bucketed approximate
                             variant: probes only same-bucket candidates,
                             the 100 TB scale path (bucket join instead of
                             cross join).
- :func:`ivf_assignments`  — IVF-style coarse quantization: assign each
                             vector to its nearest of C centroids (native),
                             so ANN probes only matching cells.
- :func:`ivf_topk`         — the full IVF search: corpus vectors live in
                             their nearest-centroid cell, each query probes
                             its ``nprobe`` nearest cells and ranks only
                             those candidates — the standard
                             inverted-file ANN shape at 100 TB (cell
                             equi-join instead of cross join).

Everything stays in ``array<float>`` columns with JVM higher-order
functions — no Python in the distance kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y), 0.0D, (s, v) -> s + v)"


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (queries side must be small —
    broadcast; the N side streams, no shuffle until the per-query rank)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    scored = (
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec"))
        .crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(cosine_expr("q_vec", "v_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplane(dim: int, seed: int) -> str:
    """Deterministic pseudo-random hyperplane as an inline array literal.

    Coefficients come from the driver-side portable hash
    (`functions.hashing.hyperplane_coeffs`) — computed once, embedded as
    constants in the plan (no per-row hashing), and reproduced verbatim in
    the DuckDB oracle SQL so bucket assignments match bit-for-bit."""
    from fluent_bit_clp_spark.functions.hashing import hyperplane_coeffs

    vals = ", ".join(f"{v!r}D" for v in hyperplane_coeffs(dim, seed))
    return f"array({vals})"


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 8, vec_col: str = "embedding", seed: int = 7
) -> DataFrame:
    """Random-hyperplane signature: bit b = sign(v · plane_b).  Native."""
    bits = [
        f"case when {_dot(vec_col, _hyperplane(dim, seed + b))} >= 0 "
        f"then shiftleft(1L, {b}) else 0L end"
        for b in range(n_planes)
    ]
    return df.withColumn("lsh_bucket", F.expr(" + ".join(bits)))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    The cross join of :func:`cosine_topk` becomes an equi-join on
    ``lsh_bucket`` — each query touches ~N/2^planes candidates.
    """
    v = with_lsh_bucket(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")),
        dim, n_planes, "v_vec",
    )
    q = F.broadcast(
        with_lsh_bucket(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
            dim, n_planes, "q_vec",
        )
    )
    scored = (
        v.join(q, "lsh_bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(cosine_expr("q_vec", "v_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def _dist2_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(cast(x as double) - y) * (cast(x as double) - y)), "
        f"0.0D, (s, v) -> s + v)"
    )


def ivf_topk(
    vectors: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN search: top-k cosine neighbors per query, searching only the
    query's ``nprobe`` nearest centroid cells.

    Scale shape: centroids broadcast twice (corpus cell assignment and
    query probes); the corpus side is ONE map pass (broadcast cross join ×
    C centroids, collapsed back to one row per vector by a map-side-
    combinable ``min_by`` — no sort, shuffle volume = N rows, not N×C);
    candidates then flow through an equi-join on ``centroid_id`` against
    the broadcast probe list — each query touches ~nprobe/C of the corpus
    instead of all of it.  Deterministic tie-breaks everywhere
    (``struct(dist2, centroid_id)`` / ``(cosine desc, neighbor_id)``), so
    the DuckDB oracle reproduces it exactly (query a_ivf_topk).
    """
    c = F.broadcast(
        centroids.select("centroid_id", F.col(vec_col).alias("c_vec"))
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")
    )
    cells = (
        v.crossJoin(c)
        .withColumn("dist2", F.expr(_dist2_expr("v_vec", "c_vec")))
        .groupBy("neighbor_id")
        .agg(
            F.min_by(
                "centroid_id", F.struct("dist2", "centroid_id")
            ).alias("centroid_id"),
            F.first("v_vec").alias("v_vec"),  # constant within the group
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("dist2"), F.col("centroid_id")
    )
    probes = F.broadcast(
        q.crossJoin(c)
        .withColumn("dist2", F.expr(_dist2_expr("q_vec", "c_vec")))
        .withColumn("prk", F.row_number().over(w_probe))
        .where(F.col("prk") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    scored = (
        cells.join(probes, "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(cosine_expr("q_vec", "v_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _kmeanspp_weighted(cands: list[tuple[list[float], int]], c: int) -> list[list[float]]:
    """Deterministic weighted k-means++ on the (tiny) k-means|| candidate
    set, driver-side: first seed = heaviest candidate (ties: input
    order), each next seed = the candidate maximizing weight × squared
    distance to the chosen set (the greedy farthest-point variant of the
    D² sampling step — deterministic where sampling would need RNG)."""
    chosen = [max(range(len(cands)), key=lambda i: (cands[i][1], -i))]
    while len(chosen) < c:
        best_i, best_score = -1, -1.0
        for i, (v, w) in enumerate(cands):
            if i in chosen:
                continue
            d2 = min(
                sum((a - b) * (a - b) for a, b in zip(v, cands[j][0]))
                for j in chosen
            )
            score = w * d2
            if score > best_score:
                best_i, best_score = i, score
        chosen.append(best_i)
    return [list(cands[i][0]) for i in chosen]


def kmeans_parallel_seeds(
    vectors: DataFrame,
    c: int,
    rounds: int = 3,
    oversample: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic k-means|| seeding (Bahmani et al., "Scalable
    k-means++", VLDB'12) — better seeds than hash-spread on adversarial
    clusterings, still only O(rounds) passes over the corpus and bounded
    driver state (≤ 1 + rounds × oversample candidate vectors).

    Per round: one aggregate for the total cost φ = Σ min-d², then a
    deterministic analogue of the paper's independent sampling — keep x
    with "probability" l·d²(x)/φ by comparing a per-(id, round) portable
    hash bucket against that threshold (reproducible at any parallelism,
    no RNG).  Candidates are then weighted by the size of their nearest-
    candidate cell (the same map-side ``min_by`` shape as
    :func:`ivf_assignments`) and reduced to ``c`` seeds driver-side by
    weighted farthest-point k-means++.
    """
    from fluent_bit_clp_spark.functions.hashing import portable_hash64

    spark = vectors.sparkSession
    l = oversample or 2 * c
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    first = (
        v.withColumn("_h", portable_hash64(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("empty corpus")
    cands: list[list[float]] = [list(first[0]["v"])]
    buckets = 1_000_000_000
    for r in range(rounds):
        cdf = F.broadcast(
            spark.createDataFrame(
                [(i, cand) for i, cand in enumerate(cands)],
                "cand_id int, c_vec array<double>",
            )
        )
        d2min = (
            v.crossJoin(cdf)
            .withColumn("d2", F.expr(_dist2_expr("v", "c_vec")))
            .groupBy("_id")
            .agg(F.min("d2").alias("d2"), F.first("v").alias("v"))
        )
        phi = d2min.agg(F.sum("d2").alias("s")).first()["s"]
        if not phi or phi <= 0.0:  # corpus ⊆ candidate set already
            break
        # keep x iff hash_bucket(x, round) < l·d²(x)/φ · buckets
        thresh = F.least(
            F.lit(float(buckets)), F.col("d2") * (l * buckets / phi)
        )
        bucket = F.pmod(
            portable_hash64(F.col("_id").cast("string"), 7000 + r),
            F.lit(buckets),
        ).cast("double")
        new = (
            d2min.where(bucket < thresh)
            .select("_id", "v")
            # expected ≤ l rows per round — bounded; ordered by _id so the
            # candidate LIST order is input-determined, not task-arrival
            # order (ADVICE r4: tie-breaks downstream — first-seed pick,
            # min_by(cand_id) weighting, farthest-point greedy — index on
            # this list, so an unordered collect() could flip them)
            .orderBy("_id")
            .collect()
        )
        cands.extend(list(row["v"]) for row in new)
    if len(cands) < c:
        raise ValueError(
            f"k-means|| produced {len(cands)} candidates < c={c}; "
            "raise oversample/rounds or use seeding='hash-spread'"
        )
    # weight candidates by nearest-candidate cell size (one min_by pass)
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, cand) for i, cand in enumerate(cands)],
            "cand_id int, c_vec array<double>",
        )
    )
    weights = {
        row["cand_id"]: row["w"]
        for row in (
            v.crossJoin(cdf)
            .withColumn("d2", F.expr(_dist2_expr("v", "c_vec")))
            .groupBy("_id")
            .agg(
                F.min_by("cand_id", F.struct("d2", "cand_id")).alias("cand_id")
            )
            .groupBy("cand_id")
            .agg(F.count("*").alias("w"))
            .collect()  # ≤ len(cands) rows
        )
    }
    weighted = [(cand, int(weights.get(i, 0))) for i, cand in enumerate(cands)]
    return _kmeanspp_weighted(weighted, c)


def train_centroids(
    vectors: DataFrame,
    c: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeding: str = "hash-spread",
) -> DataFrame:
    """Deterministic Lloyd's k-means for IVF coarse quantizers.

    Scale shape: the centroid set (C × dim doubles) is the ONLY
    driver-side state — each iteration broadcasts it, assigns every
    vector map-side (``min_by`` over the broadcast cross join, no sort),
    and reduces per-dimension sums via ``posexplode`` → groupBy partial
    aggregation (shuffle volume C × dim rows after map-side combine, not
    N × dim).  Collecting C × dim rows per round also keeps the plan
    flat — no iterative-lineage blowup.

    Deterministic by construction: ``seeding="hash-spread"`` (default)
    takes the ``c`` vectors with the smallest ``(portable_hash64(id),
    id)`` (a pseudo-random but reproducible spread);
    ``seeding="kmeans||"`` uses :func:`kmeans_parallel_seeds` (better on
    adversarial clusterings, +O(rounds) corpus passes).  Assignment ties
    break on ``centroid_id``, and empty cells retain their previous
    centroid.  (Mean arithmetic is floating-point, so cross-parallelism
    results agree to summation order — exact at the assignment level for
    separated clusters.)
    Returns ``(centroid_id int, embedding array<double>)`` — feed to
    :func:`ivf_topk` / :func:`ivf_assignments`.
    """
    from fluent_bit_clp_spark.functions.hashing import portable_hash64

    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if seeding == "kmeans||":
        cents = kmeans_parallel_seeds(
            vectors, c, id_col=id_col, vec_col=vec_col
        )
    elif seeding == "hash-spread":
        seeds = (
            v.withColumn("_h", portable_hash64(F.col("_id").cast("string")))
            .orderBy("_h", "_id")
            .limit(c)
            .select("v")
            .collect()
        )
        cents = [list(r["v"]) for r in seeds]
    else:
        raise ValueError(
            f"unknown seeding {seeding!r} (use 'hash-spread' or 'kmeans||')"
        )
    if len(cents) < c:
        raise ValueError(f"need at least c={c} vectors, got {len(cents)}")
    dims = {len(cent) for cent in cents}
    if len(dims) != 1:
        raise ValueError(f"ragged embedding dimensions in seed set: {dims}")
    for _ in range(iters):
        cdf = F.broadcast(
            spark.createDataFrame(
                [(i, cents[i]) for i in range(c)],
                "centroid_id int, c_vec array<double>",
            )
        )
        assigned = (
            v.crossJoin(cdf)
            .withColumn("d2", F.expr(_dist2_expr("v", "c_vec")))
            .groupBy("_id")
            .agg(
                F.min_by(
                    "centroid_id", F.struct("d2", "centroid_id")
                ).alias("cid"),
                F.first("v").alias("v"),
            )
        )
        stats = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()  # C × dim rows — bounded, independent of N
        )
        new = [list(cent) for cent in cents]  # empty cells keep position
        for r in stats:
            if r["cid"] is None:
                # zip_with pads ragged vectors with nulls → null d2 →
                # null cell id; surface it as a typed dimension error
                # instead of an opaque driver TypeError (ADVICE r3)
                raise ValueError(
                    "ragged embedding dimension in corpus: some vector's "
                    f"size differs from the seed dimension {len(cents[0])}"
                )
            new[r["cid"]][r["pos"]] = r["s"] / r["n"]
        cents = new
    return spark.createDataFrame(
        [(i, cents[i]) for i in range(c)],
        "centroid_id int, embedding array<double>",
    )


def ivf_assignments(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse cells).

    Same shape as :func:`ivf_topk`'s corpus pass (VERDICT r3 #3: the
    original ``row_number`` window shuffled N×C rows — windows have no
    map-side combine): broadcast cross join × C centroids, collapsed back
    to one row per vector by a map-side-combinable ``min_by`` over the
    deterministic ``struct(dist2, centroid_id)`` order — shuffle volume
    N rows, not N×C.  ``min(dist2)`` is the winning cell's distance by
    definition (it is the struct's leading sort key)."""
    c = F.broadcast(
        centroids.select(
            F.col("centroid_id"), F.col(vec_col).alias("c_vec")
        )
    )
    scored = vectors.crossJoin(c).withColumn(
        "dist2", F.expr(_dist2_expr(vec_col, "c_vec"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min_by(
                "centroid_id", F.struct("dist2", "centroid_id")
            ).alias("centroid_id"),
            F.round(F.min("dist2"), 6).alias("dist2"),
        )
        .select(id_col, "centroid_id", "dist2")
    )
