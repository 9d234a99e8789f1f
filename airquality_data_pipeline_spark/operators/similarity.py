"""Similarity search over embedding columns (array<float>).

North-star operator family (BASELINE.json): brute-force cosine top-k as
the exactness baseline, IVF bucketing as the scale path. All vector math
is JVM-side higher-order functions (zip_with + aggregate fold) — no
Python in the hot path.

Scale design: the query set is broadcast (it is the small side by
construction); candidate vectors stream through executors partition-local,
so the only shuffle is the final per-query top-k. IVF cuts the candidate
set per query by the centroid bucket before any pairwise math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    persist: bool = False,
) -> DataFrame:
    """Project to (id, v: array<double>, nrm: double).

    Fans the input out to full parallelism: embedding fixtures arrive as
    one parquet split, and everything downstream (pairwise folds) is
    CPU-bound — partition count must track cores, not input splits.

    Caching is opt-in (persist=True) and the CALLER owns the lifetime
    (must unpersist): the default used to persist unconditionally, which
    leaked one cached frame per similarity query into the shared session
    (r1 ADVICE). Catalog queries run each plan once, so recomputing the
    projection costs one extra scan of a frame the small side of which
    is broadcast anyway.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return _norm_projection(df, vec_col, id_col, persist)


def _norm_projection(
    df: DataFrame, vec_col: str, id_col: str, persist: bool = False
) -> DataFrame:
    """with_norm's projection without the fan-out exchange — for
    bounded side-inputs (centroid seeds) where a full-corpus
    repartition ahead of a pushed-down filter would be wasted.

    Zero-norm vectors are EXCLUDED: cosine is undefined for them, and
    under ANSI mode the norm division would throw DIVIDE_BY_ZERO (the
    r6 zero-vector sweep axis caught 12 queries). Same contract as the
    MinHashLSH zero-vector filter; the predicate (sqrt of an IEEE dot
    fold > 0) is computed identically by the DuckDB oracles' nested
    `WHERE nrm > 0`. cosine() additionally uses try_divide — see its
    docstring for why the filter alone is not a sound ANSI guard."""
    v = F.col(vec_col).cast("array<double>")
    out = df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.sqrt(_dot(v, v)).alias("nrm"),
    ).where(F.col("nrm") > 0)
    return out.persist() if persist else out


def cosine(a_v: Column, a_n: Column, b_v: Column, b_n: Column, scale: int = 6) -> Column:
    """Rounded cosine similarity — rounding makes ranking/thresholding
    deterministic across engines (fold-order ULP noise is ~1e-16,
    far below the 5e-7 grid).

    try_divide, not `/`: zero-norm rows are excluded upstream
    (_norm_projection), but Catalyst inlines this expression into
    Filter predicates via project-collapsing and does NOT guarantee
    the nrm > 0 conjunct evaluates first — under ANSI a speculative
    evaluation on a to-be-filtered row would throw DIVIDE_BY_ZERO
    (observed: q107's pushed-down window filter, r6 zero-vector
    sweep). NULL only ever appears on rows the norm filter drops."""
    return F.round(F.try_divide(_dot(a_v, b_v), a_n * b_n), scale)


def cosine_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k nearest (cosine) for each query vector (rows matching
    query_pred), excluding self. Ties broken by candidate id ascending."""
    n = with_norm(emb, vec_col, id_col)
    q = n.where(query_pred).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    pairs = n.crossJoin(F.broadcast(q)).where(F.col("id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("nrm")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def neardup_pairs(
    emb: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All (a < b) pairs with cosine >= threshold. Brute force — at scale
    gate the candidate set first (IVF bucket equi-join or LSH banding),
    then run this as the verification step."""
    n = with_norm(emb, vec_col, id_col)
    a = n.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = n.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


# Deterministic pseudo-random hyperplanes for sign-LSH: component i of
# plane j is ((A_j * i + B_j) mod P) / P - 0.5 — integer-derived, so any
# engine reproduces the exact same doubles. Same P as the minhash family.
LSH_P = 268435459
LSH_PARAMS: list[tuple[int, int]] = [
    (59770417, 13427546), (147655245, 131475314), (119835357, 74913853),
    (55026679, 46674928), (226517557, 17063198), (15997263, 50302251),
    (117380371, 124908867), (14246393, 106750149), (225227991, 118348156),
    (241167271, 149352498), (3488997, 85716440), (226889381, 182670606),
    (149181043, 83472422), (115595697, 180707823), (54873727, 49792546),
    (203971921, 51924210),
]


_PLANE_CACHE: dict[tuple[int, int, int], Column] = {}


def _plane_literal(a: int, b: int, dim: int) -> Column:
    """Hyperplane j as a FOLDED array literal: component i is
    ((a*i + b) mod P) / P - 0.5, computed driver-side in Python. The
    integer modulus is exact, and int/int true division plus the 0.5
    subtraction are the same correctly-rounded IEEE ops Spark and
    DuckDB perform on the same integers — bit-identical to evaluating
    the formula in either engine. The previous transform(sequence(...))
    form was NOT constant-folded by Catalyst (only the index array
    folded), so every row re-derived n_bits x dim plane components.

    Built as ONE parsed SQL literal (repr round-trips doubles exactly;
    Double.parseDouble is correctly rounded) instead of dim F.lit
    calls: per-element Column construction costs ~1 s of driver-side
    Py4J round-trips per 16-plane signature build. Cached per process —
    the planes are pure constants."""
    key = (a, b, dim)
    if key not in _PLANE_CACHE:
        vals = [((a * i + b) % LSH_P) / LSH_P - 0.5 for i in range(dim)]
        _PLANE_CACHE[key] = F.expr(
            "array(" + ",".join(f"{v!r}D" for v in vals) + ")"
        )
    return _PLANE_CACHE[key]


_SIG_CACHE: dict[tuple[int, int], Column] = {}


def _sig_from_normed(n: DataFrame, n_bits: int, dim: int) -> DataFrame:
    """(id, v, nrm) -> (id, sig): sign-LSH bit-string signature.

    The signature expression is a pure function of the plane constants
    and the column name `v`, so the whole Column (16 zip_with/aggregate
    folds = hundreds of Py4J round-trips to construct) is cached per
    process: measured 0.7 s -> ~0 of driver-side plan-build time per
    signature query."""
    key = (n_bits, dim)
    if key not in _SIG_CACHE:
        bit_cols = []
        for a, b in LSH_PARAMS[:n_bits]:
            proj = F.round(_dot(F.col("v"), _plane_literal(a, b, dim)), 6)
            bit_cols.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        _SIG_CACHE[key] = F.concat(*bit_cols)
    return n.select(F.col("id"), _SIG_CACHE[key].alias("sig"))


def hyperplane_lsh(
    emb: DataFrame,
    n_bits: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-LSH signature per vector: bit j = [cos-side of hyperplane j]
    = [round(v . h_j, 6) >= 0]. Vectors with equal signatures land in
    the same candidate bucket — the similarity analog of MinHash
    banding, and the scale path for near-dup mining (bucket equi-join
    instead of all-pairs). Output: (id, sig) with sig a bit-string."""
    return _sig_from_normed(with_norm(emb, vec_col, id_col), n_bits, dim)


def planted_neardup_corpus(
    emb: DataFrame,
    every: int = 5,
    id_offset: int = 100000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus with deterministic planted near-duplicates: every
    `every`-th vector gains a replica (id + id_offset) whose component i
    is jittered by ((id*31 + i*7) % 11 - 5) * 1e-3 — cosine vs the
    original ~0.9999 on unit-ish Gaussian vectors. Integer-derived and
    float->double widening only, so any engine reproduces the exact
    same doubles (the q45 oracle builds the identical corpus in SQL).
    Exists because the synthetic embeddings fixture is pure random
    Gaussian (max natural pairwise cosine ~0.51): without planting
    there is nothing in the >= 0.9 regime near-dup mining targets."""
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    )
    jittered = F.transform(
        F.col(vec_col),
        lambda x, i: x
        + (((F.col(id_col) * 31 + i * 7) % 11 - 5).cast("double") * 0.001),
    )
    # two-stage select: jittering and re-idding in ONE projection makes
    # the lambda's outer id reference resolve against the renamed output
    # column (jitter computed with id + id_offset) instead of the input
    planted = (
        base.where(F.col(id_col) % every == 0)
        .select(F.col(id_col), jittered.alias(vec_col))
        .select((F.col(id_col) + id_offset).alias(id_col), F.col(vec_col))
    )
    return base.unionByName(planted)


def lsh_gated_neardup(
    emb: DataFrame,
    threshold: float,
    n_bits: int = 16,
    band_bits: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-dup pairs at scale: sign-LSH banding generates candidates
    (pairs sharing ANY band of the signature — an equi-join on
    (band_idx, band_value)), then EXACT cosine verifies candidates
    against the threshold. No cross join anywhere: candidate volume is
    bounded by bucket sizes, and verification touches candidates only.

    This is the 100 TB form of `neardup_pairs` (which stays the
    brute-force ground-truth twin for recall measurement): all-pairs
    scoring is O(n²) and dead at scale, while banding keeps every stage
    an equi-join. band_bits trades recall for candidate volume (more,
    shorter bands -> higher recall, more candidates).

    Recall regime: sign banding is inherently weak at LOW thresholds —
    at 0.35 with 4-bit x 4 bands, measured recall vs brute force on the
    raw Gaussian fixture is 48% (1982/4137 at sf0.1) with candidates at
    24% of all pairs (p_bit = 1 - theta/pi ~= 0.61 at cos 0.35). In the
    REAL near-dup regime the operator targets (>= 0.9, p_bit >= 0.86;
    ~0.999 for the planted ~0.9999-cosine replicas), per-band match
    probability is p_bit^4 and stacking 4 bands drives recall to ~1
    while random 4-bit collisions stay at 1/16 per band. The registered
    q45 runs at 0.9 over `planted_neardup_corpus` (the fixture has no
    natural pairs above 0.51); test_operators pins 100% recall of the
    planted pairs vs the brute-force twin.

    Output: (id_a, id_b, cos_sim) with id_a < id_b, cos_sim >= threshold.
    """
    assert n_bits % band_bits == 0, "n_bits must split evenly into bands"
    n_bands = n_bits // band_bits
    # the normed corpus feeds THREE consumers (signature build + both
    # verify-join sides) and the signature frame feeds both sides of
    # the banded self-join: materialize each once instead of
    # re-evaluating the scan + 16 projection folds per consumer (guide
    # §3.3, the minhash_candidate_pairs pattern). Measured q45 at
    # sf0.1 (warm, alternating): ~4.6 -> ~3.3 s.
    n = with_norm(emb, vec_col, id_col).localCheckpoint()
    sigs = _sig_from_normed(n, n_bits, dim).localCheckpoint()
    bands = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.substring("sig", j * band_bits + 1, band_bits).alias("bv"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("id", F.col("b.band").alias("band"), F.col("b.bv").alias("bv"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("c"),
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.bv") == F.col("c.bv"))
            & (F.col("a.id") < F.col("c.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b"))
        .distinct()
    )
    # the verify stage is CPU-bound (64-dim fold per candidate), but its
    # input is BYTE-small (two ids/row) — AQE coalesces it to ~3
    # partitions and serializes the folds. Re-fan to cores (measured
    # 3.7 s -> ~1 s at sf0.1).
    cand = cand.repartition(emb.sparkSession.sparkContext.defaultParallelism)
    x = n.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    y = n.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def sqrt_k_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    floor_k: int = 8,
) -> DataFrame:
    """Centroid seed frame with k = max(floor_k, floor(sqrt(n))) derived
    INSIDE the plan (a 1-row count aggregate cross-joined into the seed
    filter) — no driver-side `corpus.count()` job at plan build (r7
    verdict item). floor(sqrt(CAST n AS DOUBLE)) is IEEE-identical on
    Spark and DuckDB for any n < 2^52, so oracles pin the same k with
    `greatest(floor_k, CAST(floor(sqrt(count(*))) AS BIGINT))`. Cost at
    execution: one extra count scan of `emb` inside the (broadcast)
    centroid subtree — at real scale k comes from table statistics or a
    parameter instead; this helper exists for oracle-replicable
    sqrt-scaled k."""
    kframe = emb.agg(
        F.greatest(
            F.lit(floor_k).cast("long"),
            F.floor(F.sqrt(F.count(F.lit(1)))).cast("long"),
        ).alias("_k")
    )
    return (
        _norm_projection(emb, vec_col, id_col)
        .crossJoin(F.broadcast(kframe))
        .where(F.col("id") < F.col("_k"))
        .select("id", "v", "nrm")
    )


def ivf_assign(
    emb: DataFrame,
    centroid_pred: Column | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantizer: centroid seed vectors are the rows matching
    centroid_pred (deterministic seed choice — one k-means round would
    refine them; the bucketing mechanics are identical), or an explicit
    `centroids` frame of (id, v, nrm) (e.g. sqrt_k_centroids). Assigns
    every vector to its max-cosine centroid ROW-LOCALLY: the k centroid
    rows fold into ONE sorted array<struct> row (the broadcast-model
    state of KMeansModel.transform, expressed as a lazy aggregate), the
    1-row frame broadcast-joins onto the corpus, and the argmax is
    computed per row as array_position(sims, array_max(sims)) over a
    transform() of k dot-product folds. r8: replaces the r5 shape that
    `.collect()`ed the centroids and inlined them as literals — building
    the plan now runs ZERO Spark jobs (r7 verdict: q130's plan-build
    count() plus the centroid collects made `QUERIES[name](...)` eager),
    and the HOF form scales past the ~1k-centroid expression-size limit
    of the unrolled fold. Still zero shuffles on the corpus side, which
    q46/q104/q107/q115 inherit. Arithmetic is expression-identical to
    the literal form (same zip_with/aggregate fold order, same
    round(try_divide, 6) grid). Ties break to the lowest cent_id
    (sort_array orders the struct array by id; array_position returns
    the first occurrence), matching ORDER BY c_sim DESC, cent_id ASC.
    An empty centroid set yields ZERO rows — the same shape as the
    oracle's `FROM n, cents` cross join against an empty cents CTE
    (r8 ADVICE: the earlier NULL-bucket-for-every-row behavior would
    leak a NULL-bucket group into consumers like kmeans_step's groupBy
    that the oracle never produces); the `size(_cents) > 0` guard
    encodes exactly that without touching nonempty-set semantics,
    pinned by test_ivf_assign_empty_centroids_yields_zero_rows."""
    if centroids is None:
        if centroid_pred is None:
            raise ValueError("ivf_assign: pass centroid_pred or centroids")
        centroids = _norm_projection(emb, vec_col, id_col).where(centroid_pred)
    cents_row = centroids.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("id"), F.col("v"), F.col("nrm")))
        ).alias("_cents")
    )
    n = with_norm(emb, vec_col, id_col)
    sims = F.transform(
        F.col("_cents"),
        lambda c: F.round(
            F.try_divide(_dot(F.col("v"), c["v"]), F.col("nrm") * c["nrm"]),
            6,
        ),
    )
    # bind the k-fold sims array once (CollapseProject keeps non-cheap
    # expressions unduplicated); the argmax reads it three times
    scored = (
        n.crossJoin(F.broadcast(cents_row))
        # empty centroid set -> zero rows, like the oracle's cross join
        .where(F.size(F.col("_cents")) > 0)
        .select(
            "id",
            "v",
            "nrm",
            F.transform(F.col("_cents"), lambda c: c["id"]).alias("_cids"),
            sims.alias("sims"),
        )
    )
    return scored.select(
        "id",
        "v",
        "nrm",
        F.element_at(
            F.col("_cids"),
            F.array_position(F.col("sims"), F.array_max("sims")).cast("int"),
        ).alias("bucket"),
        F.array_max("sims").alias("cent_sim"),
    )


def kmeans_step(
    emb: DataFrame,
    centroid_pred: Column,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Lloyd iteration over the IVF assignment: per cluster, the
    member count, the mean member-to-centroid cosine (the inertia
    proxy), and the L2 norm of the NEW centroid (the element-wise mean
    vector) — the refinement loop that turns the deterministic IVF seeds
    into real k-means centroids; iterate by feeding the new centroids
    back in.

    Scale shape: assignment is a broadcast join (centroid set is tiny by
    construction); the mean vector is computed via posexplode ->
    groupBy(bucket, dim) with map-side partial decimal sums — one
    shuffle of (bucket, dim, partial) rows, independent of corpus size
    per reducer key. Cross-engine exactness: per-element values quantize
    to DECIMAL(18,6) before the order-dependent sum; the mean rounds to
    6 decimals and re-enters DECIMAL so its square and the 64-term
    norm-squared sum are exact decimal arithmetic on both engines
    (doubles only at the final sqrt, which IEEE 754 rounds correctly).
    """
    assigned = ivf_assign(emb, centroid_pred, vec_col, id_col)
    # single pass over the assignment: referencing `assigned` from two
    # aggregation branches re-runs the (expensive) assignment subtree —
    # per-branch column pruning makes the exchanges non-identical, so
    # ReuseExchange cannot deduplicate them. Instead the per-member
    # stats ride along the exploded dims (cent_sim repeats per dim;
    # map-side combine collapses the fan-out before the exchange) and
    # the bucket-level stats read the dim-0 rows of the same aggregate.
    dims = assigned.select(
        "bucket", F.posexplode("v").alias("dim", "val"), "cent_sim"
    )
    per_dim = dims.groupBy("bucket", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_val"),
        F.sum(F.col("cent_sim").cast("decimal(18,6)")).alias("sum_sim"),
        F.count(F.lit(1)).alias("n"),
    )
    # shared floor(x*1e6 + 0.5) grid, NOT round(): mean_val and the
    # mean cosine are CONTINUOUS double ratios, and Spark's
    # BigDecimal-exact round vs DuckDB's scaled-float round diverge by
    # one quantum when x*1e6 sits within ~1 ULP of a .5 boundary
    # (minimal-scale sweep catch: new_centroid_norm 7.799393 vs
    # 7.799392 — the common.decq tie class). The grid is the same
    # three IEEE ops on both engines by construction.
    m = F.floor(F.col("mean_val") * F.lit(1e6) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    at0 = lambda c: F.max(F.when(F.col("dim") == 0, c))  # noqa: E731
    return per_dim.groupBy("bucket").agg(
        at0(F.col("n")).alias("n_vectors"),
        (
            F.floor(
                at0(F.col("sum_sim")).cast("double")
                / at0(F.col("n"))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("double")
            / F.lit(1e6)
        ).alias("mean_cent_sim"),
        F.round(
            F.sqrt(F.sum(m * m).cast("double") / F.lit(1e12)), 6
        ).alias("new_centroid_norm"),
    ).select(
        F.col("bucket").alias("cluster"),
        "n_vectors",
        "mean_cent_sim",
        "new_centroid_norm",
    )


def ivf_topk(
    emb: DataFrame,
    query_pred: Column,
    centroid_pred: Column,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: search only the query's IVF bucket (nprobe=1).
    The pairwise join is an equi-join on bucket — candidate work per
    query drops by ~n_centroids vs brute force."""
    assigned = ivf_assign(emb, centroid_pred, vec_col, id_col)
    q = assigned.where(query_pred).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    pairs = assigned.join(F.broadcast(q), "bucket").where(
        F.col("id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("nrm")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk_multiprobe(
    emb: DataFrame,
    query_pred: Column,
    centroid_pred: Column,
    k: int = 3,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF top-k with nprobe > 1: each query searches its `nprobe`
    nearest centroid buckets instead of only the closest — the standard
    recall/cost dial of IVF indexes (missed neighbors usually sit just
    across the closest Voronoi boundary).

    Scale shape: the corpus-side assignment (the expensive part) runs
    ONCE via ivf_assign; the probe-bucket list is computed only for the
    query rows (tiny by construction, filtered BEFORE the centroid
    cross join), so nprobe multiplies the candidate volume of the final
    bucket equi-join, not the assignment cost. Each data vector lives in
    exactly one bucket, so no candidate dedup is needed.
    """
    n = with_norm(emb, vec_col, id_col)
    cents = n.where(centroid_pred).select(
        F.col("id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    assigned = ivf_assign(emb, centroid_pred, vec_col, id_col)
    q_scored = (
        n.where(query_pred)
        .crossJoin(F.broadcast(cents))
        .select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            "cent_id",
            cosine(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cn")).alias("c_sim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("cent_id"))
    probes = (
        q_scored.withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= nprobe)
        .select("query_id", "qv", "qn", F.col("cent_id").alias("bucket"))
    )
    pairs = assigned.join(F.broadcast(probes), "bucket").where(
        F.col("id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("nrm")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def product_quantize(
    emb: DataFrame,
    centroid_pred: Column,
    n_sub: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization: the 100 TB embedding-compression step of an
    IVF-PQ index. The vector splits into n_sub contiguous subvectors;
    each subspace has its own small codebook (here: the subvectors of
    the rows matching centroid_pred — deterministic seeds, exactly the
    ivf_assign convention; k-means rounds would refine them with the
    q104 machinery), and every subvector stores only the id of its
    nearest (L2) codeword.

    Scale shape: explode to (vector, subspace) rows — an n_sub-times
    narrow fanout, each row carrying dim/n_sub doubles — equi-join the
    broadcast (subspace, codeword) table, min-struct argmin per row
    group computed as a map-side partial aggregate, then ONE groupBy(id)
    reassembles codes and sums quantization error. 64 doubles become
    n_sub single-byte-ish codes: a 64x storage cut with bounded error,
    which is what makes billion-scale ANN shippable.

    Distances fold as dot(diff, diff) sequentially (bit-exact across
    engines, like the cosine fold); per-subspace errors quantize to
    DECIMAL(18,6) before the cross-subspace sum so the total is
    order-independent. Output: (id, pq_code 'c0:...:c{n_sub-1}',
    recon_err)."""
    sub = dim // n_sub
    n = with_norm(emb, vec_col, id_col)
    subvecs = n.select(
        "id",
        F.posexplode(
            F.array(
                *[F.slice(F.col("v"), j * sub + 1, sub) for j in range(n_sub)]
            )
        ).alias("subspace", "sv"),
    )
    cents = n.where(centroid_pred).select(
        F.col("id").alias("cent_id"),
        F.posexplode(
            F.array(
                *[F.slice(F.col("v"), j * sub + 1, sub) for j in range(n_sub)]
            )
        ).alias("subspace", "cv"),
    )
    diff = F.zip_with(F.col("sv"), F.col("cv"), lambda a, b: a - b)
    d2 = F.round(_dot(diff, diff), 6)
    scored = subvecs.join(F.broadcast(cents), "subspace").select(
        "id",
        "subspace",
        F.col("cent_id"),
        d2.alias("d2"),
    )
    best = F.min(F.struct(F.col("d2"), F.col("cent_id"))).alias("b")
    per_sub = scored.groupBy("id", "subspace").agg(best)
    return (
        per_sub.select(
            "id",
            "subspace",
            F.col("b.cent_id").alias("code"),
            F.col("b.d2").cast("decimal(18,6)").alias("d2"),
        )
        .groupBy("id")
        .agg(
            F.concat_ws(
                ":",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("subspace", "code"))
                    ),
                    lambda s: s["code"].cast("string"),
                ),
            ).alias("pq_code"),
            F.round(F.sqrt(F.sum("d2").cast("double")), 6).alias("recon_err"),
        )
    )


def ivf_assign_matmul(
    emb: DataFrame,
    centroid_pred: Column,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Large-k IVF coarse quantizer: ivf_assign's contract (bucket =
    max-cosine centroid, ties to the lowest cent_id) computed as an
    Arrow-batched BLOCKED MATMUL instead of k inlined fold expressions.

    ivf_assign's generated code grows linearly with k — fine to a few
    hundred centroids (the registered queries' regime), uncompilable at
    the k ~ sqrt(n) of a 100 TB corpus (10^4-10^5 centroids, the
    SemDeDup/IVF regime PLANS.md flags). Here the prenormalized
    centroid matrix ships once per executor as an explicit Spark
    broadcast, and each Arrow batch does one (batch x d) @ (d x k)
    BLAS call — the KMeansModel.transform shape: zero shuffles, work
    linear in rows, centroid count bounded only by executor memory
    (10^5 x 64 doubles = 51 MB).

    Two deliberate differences from ivf_assign: sims are argmaxed
    UNROUNDED (the fold path rounds to 6 decimals for DuckDB oracle
    exactness; this scale path has no oracle — cent_sim is rounded on
    output only, on the SAME half-up 1e-6 grid as the fold path's
    F.round), and all arithmetic is float64 end-to-end (the q219
    float32-product lesson). Exact ties still break to the lowest
    cent_id: centroid columns are laid out in id order and np.argmax
    returns the first maximum.
    """
    import numpy as np

    cents = (
        _norm_projection(emb, vec_col, id_col).where(centroid_pred).collect()
    )
    cents.sort(key=lambda r: r.id)
    if not cents:
        raise ValueError("ivf_assign_matmul: centroid_pred matched no rows")
    ct = (
        np.asarray([list(r.v) for r in cents], dtype=np.float64)
        / np.asarray([r.nrm for r in cents], dtype=np.float64)[:, None]
    ).T  # d x k, prenormalized so the matmul yields cosine directly
    cids = np.asarray([r.id for r in cents], dtype=np.int64)
    bc = emb.sparkSession.sparkContext.broadcast((ct, cids))

    def assign(batches):
        import numpy as _np
        import pandas as _pd

        ct_, cids_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = _np.stack(pdf["v"].to_numpy()).astype(_np.float64)
            s = (x @ ct_) / pdf["nrm"].to_numpy()[:, None]
            j = _np.argmax(s, axis=1)
            top = s[_np.arange(len(j)), j]
            # HALF_UP (away from zero) on the 1e-6 grid — the same
            # convention as the fold path's F.round; np.round's
            # half-to-even differed by one quantum at exact halves
            # (r6 ADVICE item)
            yield _pd.DataFrame(
                {
                    "id": pdf["id"],
                    "v": pdf["v"],
                    "nrm": pdf["nrm"],
                    "bucket": cids_[j],
                    "cent_sim": _np.trunc(
                        top * 1e6 + _np.copysign(0.5, top)
                    )
                    / 1e6,
                }
            )

    return with_norm(emb, vec_col, id_col).mapInPandas(
        assign,
        schema="id long, v array<double>, nrm double, "
        "bucket long, cent_sim double",
    )
