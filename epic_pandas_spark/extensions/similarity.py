"""Similarity search over embedding columns (extension layer).

- `knn_bruteforce`: exact top-k cosine neighbors for a (small) query set.
  Plan: broadcast the queries, one pass over the corpus computing the
  cosine as a higher-order expression, per-query top-k window. At scale
  this is the always-correct baseline: O(corpus × queries) FLOPs but a
  single corpus scan, no shuffle of the corpus (the window partitions by
  query id over corpus×queries rows — rows are (qid, vec_id, score)
  triples, tiny relative to the vectors).
- `knn_bruteforce_pandas`: same semantics through one vectorized numpy
  matmul per Arrow batch — the throughput path when Python+BLAS beats
  per-element codegen.
- `lsh_bucketed_knn`: approximate scale path — random-hyperplane signs
  bucket the corpus; candidates searched only within the query's bucket
  (and optionally neighboring buckets via multi-probe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from epic_pandas_spark.functions.vectors import cosine_similarity_expr


def _as_double(col):
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Output: (query_id, vec_id, cosine) — k rows per query, ties broken by
    ascending corpus id for determinism.
    """
    from epic_pandas_spark.functions.vectors import dot_expr, norm_expr

    # norms are hoisted to per-row projections: computing them inside the
    # pair expression would redo |queries| norm folds per corpus row
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    ).withColumn("__qn", norm_expr(F.col("__qv")))
    c = corpus.select(F.col(id_col).alias(id_col), _as_double(vec_col).alias("__cv")).withColumn(
        "__cn", norm_expr(F.col("__cv"))
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", dot_expr(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", id_col, "cosine")
    )


def knn_bruteforce_pandas(
    corpus: DataFrame,
    query_vectors: dict[int, list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """BLAS variant: queries are a driver-side dict (id -> vector),
    broadcast into a mapInPandas that does one normalized matmul per Arrow
    batch, emitting per-batch local top-k; a final global top-k window
    reduces batch candidates to exact answers. Executors never exchange
    vectors — only (query_id, vec_id, cosine) candidates."""
    qids = sorted(query_vectors)
    qm = np.asarray([query_vectors[i] for i in qids], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:  # Arrow can hand over empty batches
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qm.T  # (batch, n_queries)
            for j, qid in enumerate(qids):
                col = sims[:, j].copy()
                col[ids == qid] = -np.inf  # exclude self before local top-k
                # sort by (-cosine, id): batch-local pruning must use the
                # SAME tie-break as the global window, or a tie at the k
                # boundary could drop the smaller-id candidate here.
                order = np.lexsort((ids, -col))
                order = order[np.isfinite(col[order])][:k]
                yield pd.DataFrame(
                    {"query_id": qid, id_col: ids[order], "cosine": col[order]}
                )

    candidates = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id long, {id_col} long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        candidates.filter(F.col("query_id") != F.col(id_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", id_col, "cosine")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 11) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id of a vector under random hyperplanes —
    sum of 2^i over planes with positive dot product. Pure expressions."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_probe_buckets_expr(vec_col, planes: list[list[float]], n_probes: int):
    """Multi-probe bucket array (Lv et al., "Multi-Probe LSH", VLDB'07,
    single-bit perturbations): the vector's own sign bucket plus the
    ``n_probes - 1`` buckets reached by flipping the hyperplane bits
    with the smallest |margin| — the bits most likely to have landed on
    the wrong side for a true neighbor. Pure expressions: margins sort
    in a (|dot|, mask) struct array; each flip XORs its bit mask."""
    margins = F.array(
        *[
            F.struct(
                F.abs(
                    F.aggregate(
                        F.zip_with(
                            vec_col,
                            F.array(*[F.lit(float(x)) for x in plane]),
                            lambda a, b: a * b,
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                ).alias("m"),
                F.lit(1 << i).cast("long").alias("mask"),
            )
            for i, plane in enumerate(planes)
        ]
    )
    base = lsh_bucket_expr(vec_col, planes)
    flips = F.slice(F.sort_array(margins), 1, n_probes - 1)
    return F.concat(
        F.array(base),
        F.transform(
            flips,
            lambda s: base.bitwiseXOR(s["mask"]),
        ),
    )


def lsh_bucketed_knn(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 11,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: hash corpus and queries into sign buckets, search
    only same-bucket candidates. 2^n_planes buckets shrink the scanned
    fraction to ~1/2^n_planes at some recall cost — the IVF-style scale
    path. Same output schema as knn_bruteforce.

    ``n_probes > 1`` enables query-directed multi-probe (Lv et al.
    VLDB'07): each query additionally searches the buckets reached by
    flipping its lowest-|margin| sign bits — recall recovers toward
    n_probes/2^n_planes scan fraction without touching the corpus side
    (only the tiny broadcast query set replicates per probe)."""
    if n_probes < 1 or n_probes > n_planes + 1:
        raise ValueError(
            "n_probes must be in [1, n_planes + 1] (single-bit perturbations)"
        )
    planes = random_hyperplanes(dim, n_planes, seed)
    c = corpus.select(id_col, _as_double(vec_col).alias("__cv")).withColumn(
        "bucket", lsh_bucket_expr(F.col("__cv"), planes)
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
        )
        .withColumn(
            "bucket",
            F.explode(lsh_probe_buckets_expr(F.col("__qv"), planes, n_probes)),
        )
    )
    scored = c.join(F.broadcast(q), on="bucket").withColumn(
        "cosine", cosine_similarity_expr(F.col("__qv"), F.col("__cv"))
    )
    scored = scored.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", id_col, "cosine")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.9,
    auto_block_planes: int = 0,
    dim: int | None = None,
    seed: int = 11,
    allow_quadratic: bool = False,
    kernel: str = "expr",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    ``block_col`` restricts comparison to equal-block pairs (label, LSH
    bucket, shard...). Without one, pass ``auto_block_planes > 0`` (+``dim``)
    to derive an LSH sign-bucket block — ~1/2^planes candidate fraction at
    some recall cost — or opt into the quadratic all-pairs cross join
    explicitly with ``allow_quadratic=True`` (tiny frames only). A bare
    unblocked call raises: at corpus scale the cartesian product is the
    plan that never finishes.

    ``kernel`` picks the in-block scoring engine:

    - ``"expr"``: codegen higher-order expression per candidate pair —
      zero Python, fine when blocks are small or the block key is
      high-cardinality.
    - ``"blas"``: one applyInPandas per block, scoring the whole block
      with chunked numpy GEMMs and emitting only qualifying pairs — an
      order of magnitude less per-pair cost when block sizes run to
      thousands (the in-block pair count is quadratic either way; that
      is a property of the blocking key, not the kernel). Chunking
      bounds peak memory at chunk_size × |block| scores; each block
      must fit one executor (same contract as any applyInPandas group).
    """
    if kernel == "blas":
        if block_col is None:
            raise ValueError("kernel='blas' requires an explicit block_col")
        return _neardup_pairs_blas(df, vec_col, id_col, block_col, threshold)
    if kernel != "expr":
        raise ValueError(f"unknown kernel {kernel!r}: expected 'expr' or 'blas'")
    from epic_pandas_spark.functions.vectors import dot_expr, norm_expr

    if block_col is None and auto_block_planes > 0:
        if dim is None:
            probe = df.select(F.size(vec_col).alias("d")).first()
            if probe is None:
                raise ValueError("cannot infer dim from an empty DataFrame")
            dim = probe["d"]
        planes = random_hyperplanes(dim, auto_block_planes, seed)
        df = df.withColumn(
            "__lsh_block", lsh_bucket_expr(_as_double(vec_col), planes)
        )
        block_col = "__lsh_block"
    elif block_col is None and not allow_quadratic:
        raise ValueError(
            "embedding_neardup_pairs without block_col is an all-pairs cross "
            "join (quadratic in the corpus). Pass block_col=, or "
            "auto_block_planes= for LSH sign-bucket blocking, or "
            "allow_quadratic=True for tiny frames."
        )

    a = df.select(
        F.col(id_col).alias("id_a"), _as_double(vec_col).alias("va"),
        *([F.col(block_col)] if block_col else []),
    ).withColumn("na", norm_expr(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"), _as_double(vec_col).alias("vb"),
        *([F.col(block_col)] if block_col else []),
    ).withColumn("nb", norm_expr(F.col("vb")))
    joined = a.join(b, on=block_col) if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def _neardup_pairs_blas(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    threshold: float,
    chunk_rows: int = 1024,
) -> DataFrame:
    """Per-block all-pairs cosine via chunked numpy GEMM (the BLAS twin of
    the expression kernel; same output set — float64 both ways, so the
    6-dp-rounded scores agree with the expression/DuckDB arithmetic).

    One Arrow group per block: normalize once, then score ``chunk_rows``
    rows against the whole block per GEMM, keeping peak memory at
    chunk_rows × |block| doubles instead of |block|². Only pairs with
    id_a < id_b and cosine ≥ threshold leave Python — output is the
    qualifying-pair set, never the score matrix."""
    out_schema = (
        f"id_a long, id_b long, cosine double"
    )

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        Vn = V / safe[:, None]
        # zero vectors have undefined cosine; the expression kernel's
        # 0/0 division yields NaN which fails the >= filter — match by
        # forcing their rows/cols to NaN
        Vn[norms == 0.0] = np.nan
        out_a, out_b, out_c = [], [], []
        for lo in range(0, len(ids), chunk_rows):
            hi = min(lo + chunk_rows, len(ids))
            S = Vn[lo:hi] @ Vn.T
            mask = (S >= threshold) & np.less.outer(ids[lo:hi], ids)
            ai, bj = np.nonzero(mask)
            out_a.append(ids[lo + ai])
            out_b.append(ids[bj])
            out_c.append(S[ai, bj])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
                "id_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                "cosine": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
            }
        )

    prepped = df.select(
        F.col(id_col).alias(id_col), _as_double(vec_col).alias(vec_col), F.col(block_col)
    )
    return prepped.groupBy(block_col).applyInPandas(score_block, out_schema)


def _ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str,
    id_col: str,
    codebook: str,
    kmeans_iterations: int,
) -> DataFrame:
    """Coarse-quantizer codebook as a (cid, cv) frame — shared by
    `ivf_knn` and `ivf_pq_knn`. "hash": the n_centroids corpus vectors
    with the smallest xxhash64(id) — deterministic, seedless, zero
    training cost. "kmeans": Lloyd-trained (deterministic), lists follow
    density."""
    if codebook == "kmeans":
        from epic_pandas_spark.extensions.clustering import kmeans_fit

        trained, _inertia = kmeans_fit(
            corpus, n_centroids, vec_col=vec_col, id_col=id_col,
            max_iterations=kmeans_iterations,
            tol=None,  # codebook mode: inertia discarded, skip its jobs
        )
        return corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(trained)],
            "cid long, cv array<double>",
        )
    return (
        corpus.select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv"))
        .orderBy(F.xxhash64(F.col("cid")).asc())
        .limit(n_centroids)
    )


def _ivf_assign(df, cents: DataFrame, ident: str, vec: str, n_lists: int) -> DataFrame:
    """Nearest-centroid list assignment: broadcast the codebook, score
    every row against every centroid with a codegen'd cosine, keep the
    top ``n_lists`` per row (argmax window over ≤ n_centroids rows/key).
    Returns ``(ident, vec, list_id)``."""
    from epic_pandas_spark.functions.vectors import dot_expr, norm_expr

    scored = df.crossJoin(F.broadcast(cents)).withColumn(
        "__sim",
        dot_expr(F.col(vec), F.col("cv")) / (norm_expr(F.col(vec)) * norm_expr(F.col("cv"))),
    )
    w = Window.partitionBy(ident).orderBy(F.col("__sim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_lists)
        .select(ident, vec, F.col("cid").alias("list_id"))
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    codebook: str = "hash",
    kmeans_iterations: int = 5,
) -> DataFrame:
    """IVF-style approximate top-k: a centroid codebook partitions the
    corpus into inverted lists by nearest centroid; each query searches
    only its ``n_probe`` nearest lists. Scanned fraction ≈
    n_probe/n_centroids — the coarse quantization scale path, trading
    recall for a bounded scan.

    ``codebook`` picks the centroid source:

    - ``"hash"``: the n_centroids corpus vectors with the smallest
      xxhash64(id) — deterministic, seedless, zero training cost; fine
      when the corpus is roughly isotropic.
    - ``"kmeans"``: Lloyd-trained centroids (extensions.clustering.
      kmeans_fit, itself deterministic) — lists follow the actual density,
      which evens out list sizes and lifts recall at the same n_probe.
      Training cost is kmeans_iterations corpus passes, amortized across
      every query batch served from the index.

    All stages are DataFrame ops: the codebook is broadcast, list
    assignment is an argmax window over corpus×centroid scores, probing is
    an equi-join on the list id.
    """
    if codebook not in ("hash", "kmeans"):
        raise ValueError("codebook must be 'hash' or 'kmeans'")
    cents = _ivf_centroids(
        corpus, n_centroids, vec_col, id_col, codebook, kmeans_iterations
    )

    def assign(df, ident, vec, n_lists):
        return _ivf_assign(df, cents, ident, vec, n_lists)

    from epic_pandas_spark.functions.vectors import dot_expr, norm_expr

    c = corpus.select(F.col(id_col), _as_double(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv"))
    corpus_lists = assign(c, id_col, "__cv", 1)
    query_probes = assign(q, "query_id", "__qv", n_probe)

    paired = corpus_lists.join(query_probes, on="list_id").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = paired.withColumn(
        "cosine",
        dot_expr(F.col("__qv"), F.col("__cv"))
        / (norm_expr(F.col("__qv")) * norm_expr(F.col("__cv"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", id_col, "cosine")
    )


def pq_train_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_sub: int = 8,
    n_codes: int = 16,
    sample_max: int = 65536,
    iterations: int = 8,
    normalize: bool = True,
):
    """Train product-quantization sub-codebooks (Jégou, Douze, Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    split the vector into ``n_sub`` contiguous subvectors and run Lloyd
    k-means with ``n_codes`` centroids independently per subspace.

    Training reads a DETERMINISTIC bounded sample (the ``sample_max``
    corpus rows with the smallest xxhash64(id) — same discipline as the
    "hash" coarse codebook) to the driver and iterates in numpy: the
    collect is bounded by ``sample_max`` regardless of corpus size, the
    standard practice for codebook training at scale (FAISS trains on a
    sample too). Returns a numpy array of shape
    ``(n_sub, n_codes, dim // n_sub)``."""
    probe = corpus.select(F.size(vec_col).alias("d")).first()
    if probe is None:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    dim = probe["d"]
    if dim % n_sub != 0:
        raise ValueError(f"n_sub={n_sub} must divide the vector dim {dim}")
    sub = dim // n_sub
    sample = (
        corpus.select(_as_double(vec_col).alias("v"), F.col(id_col))
        .orderBy(F.xxhash64(F.col(id_col)).asc())
        .limit(sample_max)
        .select("v")
        .toPandas()
    )
    x = np.vstack(sample["v"].to_numpy())
    if normalize:
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    books = np.empty((n_sub, n_codes, sub))
    for s in range(n_sub):
        xs = x[:, s * sub : (s + 1) * sub]
        # deterministic init: first n_codes distinct-ish rows of the
        # hash-ordered sample (k-means++ randomness adds nothing here)
        cents = xs[: n_codes].copy()
        if len(cents) < n_codes:  # tiny corpus: pad by repeating
            reps = -(-n_codes // max(len(cents), 1))
            cents = np.tile(cents, (reps, 1))[:n_codes]
        for _ in range(iterations):
            # BLAS form: ||x||² - 2xCᵀ + ||C||², one GEMM per iteration
            d2 = (
                (xs * xs).sum(axis=1, keepdims=True)
                - 2.0 * xs @ cents.T
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_codes",
    normalize: bool = True,
) -> DataFrame:
    """Encode each vector to its PQ code word — ``n_sub`` small ints
    (nearest sub-centroid per subspace). One Arrow-batched pandas UDF;
    per batch each subspace is a single ``||x||² - 2xCᵀ + ||C||²``
    argmin in BLAS. The encoded corpus carries n_sub bytes of code
    instead of dim floats — the representation that shuffles."""
    books = np.asarray(codebooks)
    n_sub, _n_codes, sub = books.shape

    @F.pandas_udf("array<int>")
    def _encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(vs.to_numpy()).astype(np.float64)
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), n_sub), dtype=np.int32)
        for s in range(n_sub):
            xs = x[:, s * sub : (s + 1) * sub]
            cents = books[s]
            d2 = (
                (xs * xs).sum(axis=1, keepdims=True)
                - 2.0 * xs @ cents.T
                + (cents * cents).sum(axis=1)[None, :]
            )
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(F.col(id_col), _encode(_as_double(vec_col)).alias(code_col))


def ivf_pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    refine_factor: int = 0,
    codebook: str = "hash",
    kmeans_iterations: int = 5,
    sample_max: int = 65536,
    pq_iterations: int = 8,
) -> DataFrame:
    """IVF-PQ approximate top-k cosine (Jégou et al. 2011 + coarse IVF):
    the corpus is coarse-partitioned into inverted lists AND compressed
    to product-quantization codes; queries probe ``n_probe`` lists and
    rank candidates by asymmetric distance computation (ADC) — a lookup
    of precomputed query-to-sub-centroid distances, never a full
    dot product against raw corpus vectors.

    Why this is the 100 TB ANN shape: after encoding, the corpus side of
    the candidate join carries ``n_sub`` small ints per row instead of
    ``dim`` floats (16-32× less shuffle for typical settings), the scan
    fraction is n_probe/n_centroids, and per-candidate scoring is a table
    gather instead of a dot product. Vectors are L2-normalized first, so
    ADC L2² orders like cosine (||a-b||² = 2 - 2·cos for unit vectors);
    the reported ``cosine`` is ``1 - adc/2``.

    ``refine_factor > 0`` re-ranks the top ``k*refine_factor`` ADC
    candidates with EXACT cosine (one equi-join back to the raw vectors
    for that bounded candidate set) — the standard recall-restoring
    second stage; the returned ``cosine`` is then exact.

    Plan: codebooks train on a bounded deterministic sample; coarse
    assignment reuses the `ivf_knn` machinery; ADC runs in one
    Arrow-batched ``mapInPandas`` over the paired stream (per batch, one
    LUT build + one gather per query), then a per-query top-k window
    over (query_id, id, score) triples."""
    if codebook not in ("hash", "kmeans"):
        raise ValueError("codebook must be 'hash' or 'kmeans'")
    if refine_factor < 0:
        raise ValueError("refine_factor must be >= 0")
    books = pq_train_codebooks(
        corpus, vec_col, id_col, n_sub, n_codes, sample_max, pq_iterations
    )
    sub = books.shape[2]

    cents = _ivf_centroids(
        corpus, n_centroids, vec_col, id_col, codebook, kmeans_iterations
    )
    c = corpus.select(F.col(id_col), _as_double(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qv"))
    corpus_lists = _ivf_assign(c, cents, id_col, "__cv", 1).select(
        id_col, "list_id"
    )
    encoded = pq_encode(corpus, books, vec_col, id_col, "__codes")
    corpus_side = corpus_lists.join(encoded, on=id_col)
    query_probes = _ivf_assign(q, cents, "query_id", "__qv", n_probe)

    paired = corpus_side.join(query_probes, on="list_id").filter(
        F.col("query_id") != F.col(id_col)
    )

    id_field = corpus.select(F.col(id_col)).schema.fields[0]
    qid_type = queries.select(F.col(id_col)).schema.fields[0].dataType.simpleString()
    out_schema = (
        f"query_id {qid_type}, {id_field.name} {id_field.dataType.simpleString()}, "
        "cosine double"
    )

    def adc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for qid, grp in pdf.groupby("query_id", sort=False):
                qv = np.asarray(grp["__qv"].iloc[0], dtype=np.float64)
                qv = qv / max(np.linalg.norm(qv), 1e-12)
                # LUT[s, c] = ||q_s - C_sc||², one (n_sub, n_codes) table
                lut = ((qv.reshape(books.shape[0], 1, sub) - books) ** 2).sum(axis=2)
                codes = np.vstack(grp["__codes"].to_numpy())
                adc2 = lut[np.arange(books.shape[0])[None, :], codes].sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            id_field.name: grp[id_field.name].to_numpy(),
                            "cosine": 1.0 - adc2 / 2.0,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    scored = paired.select("query_id", "__qv", id_col, "__codes").mapInPandas(
        adc, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    n_keep = k * refine_factor if refine_factor else k
    top = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_keep)
        .select("query_id", id_col, "cosine")
    )
    if not refine_factor:
        return top
    # exact re-rank of the bounded candidate set: join raw vectors back
    # for k*refine_factor rows per query, true cosine, final top-k window
    cand = top.select("query_id", id_col).join(c, on=id_col).join(
        q, on="query_id"
    )
    exact = cand.withColumn("cosine", cosine_similarity_expr(F.col("__qv"), F.col("__cv")))
    return (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", id_col, "cosine")
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-space decontamination (the semantic complement of the
    n-gram recipe): flag every corpus vector whose cosine to ANY eval-set
    vector reaches ``threshold`` — catches paraphrased/reformatted
    benchmark leakage that exact n-gram overlap misses.

    Returns ``(id_col, max_cosine, n_eval_matches)`` for flagged rows.

    Plan: the eval set is broadcast (benchmark suites are thousands of
    vectors; the corpus is not) and the corpus scans ONCE, scoring each
    row against all eval vectors with a codegen'd zip_with dot product,
    then one keyed max/count agg — no shuffle of the corpus, no pairwise
    corpus join. For eval sets too big to broadcast, pre-block both
    sides (IVF lists / LSH buckets) and reuse this per block."""
    from epic_pandas_spark.functions.vectors import cosine_similarity_expr

    ev = eval_df.select(
        F.col(id_col).alias("__eid"), F.col(vec_col).alias("__ev")
    )
    scored = corpus.select(id_col, vec_col).crossJoin(F.broadcast(ev)).select(
        id_col,
        cosine_similarity_expr(F.col(vec_col), F.col("__ev")).alias("__cos"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max("__cos").alias("max_cosine"),
            F.sum(
                F.when(F.col("__cos") >= F.lit(threshold), 1).otherwise(0)
            ).alias("n_eval_matches"),
        )
        .filter(F.col("max_cosine") >= F.lit(threshold))
    )


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    seed: int = 42,
    in_dim: int | None = None,
    out_col: str = "projected",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: multiply every vector by
    a seeded Gaussian matrix scaled 1/sqrt(out_dim), shrinking embedding
    width while approximately preserving pairwise Euclidean geometry
    (distortion ~ sqrt(log n / out_dim) w.h.p.). The cheap first stage
    before ANN / clustering / near-dup when the raw width is large.

    The matrix is generated once on the driver from ``seed``
    (deterministic across runs and engines using the same generator) and
    broadcast inside an Arrow-batched pandas UDF; each batch is one BLAS
    GEMM. in_dim is inferred from one row when not given."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    if in_dim is None:
        probe = df.select(F.size(vec_col).alias("d")).first()
        if probe is None:
            raise ValueError("cannot infer in_dim from an empty DataFrame")
        in_dim = probe["d"]
    mat = np.random.default_rng(seed).standard_normal((in_dim, out_dim)) / np.sqrt(
        out_dim
    )

    @F.pandas_udf("array<double>")
    def _project(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(vs.to_numpy())
        y = x @ mat
        return pd.Series(list(y))

    return df.withColumn(out_col, _project(F.col(vec_col)))


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebook: list[list[float]] | None = None,
    chunk_rows: int = 1024,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., arXiv
    2303.09540): cluster the corpus against a small codebook, then within
    each cluster KEEP a document only when no smaller-id document in the
    same cluster has cosine >= ``threshold``. Returns ``(id_col, cluster)``
    for the kept rows. (The reference engine has no embedding tier; this
    is an extension obligation — cf. the label-blocked pair variant
    ``embedding_neardup_pairs``.)

    The published two-stage scale shape, not an all-pairs join:

    1. **ASSIGN** — the k x dim codebook is folded into a codegen cosine
       expression (one struct per centroid, ``array_max`` argmax, ties ->
       lowest centroid index). One corpus scan, zero Python, no shuffle of
       the vectors beyond the cluster groupBy that follows.
       ``codebook=None`` uses the deterministic init-only codebook: the
       embeddings of the k smallest ids (``ORDER BY id LIMIT k`` — cheap,
       reproducible, and expressible by the DuckDB oracle). Pass
       ``kmeans_fit()`` centroids for trained clusters — same plan.
    2. **PRUNE** — one ``applyInPandas`` group per cluster scores the
       block with chunked numpy GEMMs (``chunk_rows`` x |block| peak
       score memory) and keeps rows with no earlier in-cluster
       near-duplicate. In-block pair count is quadratic in block size —
       that is SemDeDup's own semantics, so ``k`` must grow with the
       corpus to keep blocks executor-sized (the paper runs k=11000 over
       5B embeddings, ~500k vectors/cluster). Output is O(n) rows: the
       keep decisions, never the score matrix.

    The keep rule is the one-shot variant: a row is dropped when ANY
    smaller-id cluster-mate is within threshold, whether or not that mate
    is itself kept. This is order-deterministic, embarrassingly parallel
    within a block, and relationally expressible (an EXISTS subquery) —
    unlike the sequential greedy "kept-only" chain, which is
    order-dependent and cannot be verified by a set-based oracle.
    Zero-norm vectors have undefined cosine and are always kept (NaN
    fails every >= test), matching the expression kernel's 0/0 -> NaN.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if codebook is None:
        rows = (
            df.select(F.col(id_col), _as_double(vec_col).alias("__e"))
            .orderBy(F.col(id_col))
            .limit(k)
            .collect()
        )
        if not rows:
            raise ValueError("cannot derive a codebook from an empty DataFrame")
        codebook = [list(r["__e"]) for r in rows]

    v = _as_double(vec_col)
    # argmax-cosine via array_max over (score, -centroid_idx) structs:
    # struct comparison is lexicographic, so the max is the highest score
    # and, on exact ties, the LOWEST centroid index — the same order the
    # oracle's ROW_NUMBER (cosine DESC, cid ASC) induces.
    from epic_pandas_spark.functions.vectors import dot_expr, norm_expr

    # try_divide + coalesce(-2): a zero-norm vector (or centroid) has
    # undefined cosine — under ANSI mode the plain division would throw.
    # -2 is below every real cosine, so zero vectors tie at -2 across all
    # centroids and land in cluster 0 (lowest index wins), where the NaN
    # rows in the prune kernel keep them unconditionally.
    cand = F.array(
        *[
            F.struct(
                F.coalesce(
                    F.try_divide(
                        dot_expr(v, F.lit(c)),
                        norm_expr(v) * F.lit(float(np.linalg.norm(c))),
                    ),
                    F.lit(-2.0),
                ).alias("s"),
                F.lit(-ci).alias("nc"),
            )
            for ci, c in enumerate(codebook)
        ]
    )
    assigned = df.select(
        F.col(id_col), v.alias("__v"), (-F.array_max(cand)["nc"]).cast("int").alias("cluster")
    )

    # derive the id field's type from the input — the function is
    # otherwise id-type agnostic (string/int ids prune identically)
    id_ddl = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_ddl}, cluster int"

    def prune_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        V = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        Vn = V / safe[:, None]
        Vn[norms == 0.0] = np.nan  # undefined cosine -> never a duplicate
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            S = Vn[lo:hi] @ Vn.T
            # j strictly earlier than i in ascending-id order
            earlier = np.greater.outer(np.arange(lo, hi), np.arange(n))
            keep[lo:hi] = ~((S >= threshold) & earlier).any(axis=1)
        return pd.DataFrame({id_col: ids[keep], "cluster": pdf["cluster"].to_numpy()[keep]})

    return assigned.groupBy("cluster").applyInPandas(prune_block, out_schema)
