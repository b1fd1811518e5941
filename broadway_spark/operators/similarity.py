"""Similarity search over embedding columns.

- ``ann_bruteforce_topk``: exact top-k cosine neighbors — a broadcast
  nested-loop join of a *small* query set against the full corpus, one
  scan, per-query heap via window ranking. At 100 TB the corpus side
  streams through executors once; the query side must stay broadcast-
  small (thousands, not millions).
- ``ann_lsh_topk``: the scale path — sign-random-projection buckets
  prune the corpus before scoring, trading recall for a much smaller
  candidate set. Planes are derived from the portable md5 hash so the
  bucketing is deterministic and oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from broadway_spark.functions.vectors import cosine_similarity, dot_product, l2_norm
from broadway_spark.operators.materialize import materialize


def _cos_from_parts() -> F.Column:
    denom = F.col("__qn") * F.col("__cn")
    return F.when(
        denom > 0, dot_product(F.col("__qv"), F.col("__cv")) / denom
    ).otherwise(F.lit(0.0))


def ann_bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small (it is broadcast). Norms are computed once
    per row (not per pair). Self-matches (same id) are excluded. Ties
    order deterministically: (cos_sim desc, id asc) on the 6dp-rounded
    similarity, so ranking is engine-independent.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(_cos_from_parts(), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_range_search(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float,
) -> DataFrame:
    """All corpus neighbors within a cosine-similarity threshold of
    each query (range query — the radius-based complement to top-k;
    dedup candidate generation and diversity filtering both want the
    full neighborhood, not a fixed k).

    Same scale shape as ``ann_bruteforce_topk``: the query side is
    broadcast, the corpus streams once, norms are computed per row.
    The threshold compares against the 6dp-rounded similarity so the
    boundary is engine-independent. Returns (query_id, neighbor_id,
    cos_sim) with no ranking — the result set is the semantics.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(_cos_from_parts(), 6))
        .filter(F.col("cos_sim") >= min_cosine)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def srp_plane(p: int, dim: int, seed: int = 7) -> list[float]:
    """Plane p's components: deterministic pseudo-random values in
    [-0.5, 0.5) derived from md5(seed:p:j) — computed in Python once
    and embedded as literals, so any engine (and the DuckDB oracle)
    shares the exact same planes without per-row hashing."""
    import hashlib

    return [
        int(hashlib.md5(f"{seed}:{p}:{j}".encode()).hexdigest()[:8], 16)
        / 4294967296.0
        - 0.5
        for j in range(dim)
    ]


def srp_bucket(vec_col_name: str, num_planes: int = 8, dim: int = 64, seed: int = 7) -> F.Column:
    """Sign-random-projection bucket id (0 .. 2^num_planes - 1).

    The dot product against each literal plane runs as one fold over
    the (vector, plane) zip; no hashing in the row path.
    """
    bits = []
    for p in range(num_planes):
        plane = srp_plane(p, dim, seed)
        plane_lit = "array(" + ", ".join(repr(v) for v in plane) + ")"
        dot = (
            f"aggregate(zip_with(CAST({vec_col_name} AS ARRAY<DOUBLE>), "
            f"{plane_lit}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
            f"(acc, v) -> acc + v)"
        )
        bits.append(f"IF({dot} >= 0, {2 ** p}, 0)")
    return F.expr("(" + " + ".join(bits) + ")").cast("long")


def srp_bucket_sql(vec_expr: str, num_planes: int = 8, dim: int = 64, seed: int = 7) -> str:
    """DuckDB twin of ``srp_bucket`` (same literal planes)."""
    bits = []
    for p in range(num_planes):
        plane = srp_plane(p, dim, seed)
        plane_lit = "[" + ", ".join(repr(v) for v in plane) + "]"
        dot = f"list_dot_product(CAST({vec_expr} AS DOUBLE[]), {plane_lit})"
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {2 ** p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, num_centroids: int
) -> DataFrame:
    """Deterministic "sampled centroids" coarse quantizer: the first
    ``num_centroids`` corpus vectors, pre-normed for cosine."""
    return corpus.filter(F.col(id_col) < num_centroids).select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).cast("array<double>").alias("__pv"),
        l2_norm(vec_col).alias("__pn"),
    )


def _ivf_assign(
    side: DataFrame,
    cent: DataFrame,
    id_col: str,
    vec_col: str,
    id_alias: str,
    keep_rank: int,
) -> DataFrame:
    """Assign each vector to its ``keep_rank`` nearest coarse cells —
    one broadcast nested-loop against the (tiny) centroid set, ties on
    (6dp cosine desc, cid asc) so the cells are engine-independent."""
    s = side.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).cast("array<double>").alias("__v"),
        l2_norm(vec_col).alias("__n"),
    )
    denom = F.col("__n") * F.col("__pn")
    cos = F.when(
        denom > 0, dot_product(F.col("__v"), F.col("__pv")) / denom
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy(id_alias).orderBy(
        F.round(cos, 6).desc(), F.col("__cid").asc()
    )
    return (
        s.crossJoin(F.broadcast(cent))
        .withColumn("__crank", F.row_number().over(w))
        .filter(F.col("__crank") <= keep_rank)
        .select(id_alias, "__v", "__n", F.col("__cid").alias("__cell"))
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer assigns every
    corpus vector to its nearest centroid cell; queries probe only the
    ``nprobe`` nearest cells.

    Centroids here are the first ``num_centroids`` corpus vectors —
    deterministic "sampled centroids", so the oracle reproduces the
    index exactly. A k-means refinement would run offline and feed its
    centroids in the same way (the plan shape is identical).

    Scale shape: the cell-assignment pass is a broadcast nested-loop
    against ``num_centroids`` rows (one corpus scan, no shuffle); the
    probe join shuffles only the candidate cells. With C cells and
    balanced assignment the scoring work drops ~C/nprobe-fold versus
    brute force. Ties everywhere break on (cos desc, id asc) over the
    6dp-rounded similarity so ranking is engine-independent.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    cent = _ivf_centroids(corpus, id_col, vec_col, num_centroids)
    c_assigned = _ivf_assign(corpus, cent, id_col, vec_col, "neighbor_id", 1)
    q_assigned = (
        _ivf_assign(queries, cent, id_col, vec_col, "query_id", nprobe)
        .withColumnRenamed("__v", "__qv")
        .withColumnRenamed("__n", "__qn")
    )
    denom = F.col("__qn") * F.col("__n")
    cos = F.when(
        denom > 0, dot_product(F.col("__qv"), F.col("__v")) / denom
    ).otherwise(F.lit(0.0))
    scored = (
        c_assigned.join(F.broadcast(q_assigned), "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cos, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's probed
    SRP buckets.

    Bucket join replaces the full cross product — with 2^num_planes
    buckets the candidate set shrinks ~2^num_planes-fold. ``probes`` is
    the multi-probe knob (Lv et al., VLDB'07): probes=1 checks only the
    query's own bucket; probes=1+num_planes adds every Hamming-1
    neighbor bucket (one sign-bit flip), trading candidate volume back
    for recall — measured on the test corpus: 0.20 → 0.48 recall@10 at
    4 planes (probing 5 of 16 buckets); more planes × more probes is
    the production tuning axis.
    Each (query, candidate) pair still joins AT MOST once (a
    candidate's bucket is unique and the probed set is distinct), so no
    dedup pass is needed. The query side explodes ×probes — still
    broadcast-sized for realistic query sets.
    """
    bucket = srp_bucket(vec_col, num_planes, dim)
    # probe masks: 0 (own bucket), then single-bit flips
    masks = [0] + [1 << p for p in range(num_planes)]
    masks = masks[: max(1, min(probes, len(masks)))]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
        bucket.alias("__b0"),
    ).select(
        "query_id",
        "__qv",
        "__qn",
        F.explode(
            F.array(*[F.col("__b0").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
        bucket.alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(_cos_from_parts(), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Vectorized (Arrow + numpy) forms of the integer PQ / k-means kernels
# (r14 optimization, guide §4.2).
#
# The PQ codebook (dim·num_codes integers) and the k-means centroid table
# (k·dim integers) are CONSTANT-SIZE relations, so Lloyd training can hold
# them driver-side between rounds (the k-row-scalar-collect pattern the
# k-means seeds always used) and do each round's assignment + partial
# centroid-update in ONE corpus pass: a mapInArrow kernel hands whole Arrow
# batches to numpy and emits per-batch partial sums — ≤dim·num_codes rows
# per task — which one tiny aggregate folds and the driver collects. The
# original DataFrame form paid, per round, a broadcast join plus two
# n·m(·num_codes)-row shuffles and a persist+count barrier.
#
# Exactness: every quantity here is exact int64 (micro-unit quantization,
# squared distances, member sums), which is summation-order-independent, so
# numpy vectorization cannot change a value; np.argmin returns the FIRST
# minimal index and codes are kept sorted ascending, reproducing the
# min(struct(dist, code)) lower-code tiebreak; the centroid update divides
# the SAME int64 totals in the same double floor(sum/count) expression.
# FLOAT paths (cosines, IVF cell assignment) deliberately stay in the JVM:
# their sequential fold order is part of the oracle contract.
# ---------------------------------------------------------------------------


def _list_to_matrix(arr):
    """(n, dim) float64 matrix from an Arrow list<float|double> array —
    flatten() respects batch slicing; vectors are fixed-length."""
    import numpy as np

    n = len(arr)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return np.empty((0, 0))
    dim = len(flat) // n
    if dim * n != len(flat):
        raise ValueError("ragged vector column in PQ/k-means kernel")
    return flat.reshape(n, dim).astype(np.float64)


def _micro(mat):
    """Integer micro-units: floor(x · 1e6) in float64 then int64 — the
    exact arithmetic of transform(CAST(v AS ARRAY<DOUBLE>),
    x -> CAST(floor(x * 1000000) AS BIGINT)) element-for-element."""
    import numpy as np

    return np.floor(mat * 1000000.0).astype(np.int64)


# Row-block size for the distance kernels (r15, guide §5): the argmin
# temp is (rows × num_codes × sub) int64 — ~80 MB/task at 10k-row Arrow
# batches and small sub, but linear in dim. Processing each Arrow batch
# in fixed row blocks caps peak executor memory regardless of dim or
# batch size (2048 × 256 codes × 8 sub × 8 B ≈ 34 MB worst-case here).
# Blocking cannot change a value: assignments are per-row, and the
# int64 partial sums are summation-order independent.
_PQ_ROW_BLOCK = 2048

# Bounded-collect guard for the driver-side ADC query tables: at
# m=8/num_codes=16 each query expands to 128 Python tuples, so 1e5
# queries ≈ 13M tuples — the comfortable ceiling for "broadcast-small".
_QTABLE_MAX_QUERIES = 100_000


def _check_pq_dims(dim: int, m: int) -> None:
    """The vectorized PQ kernels slice subvectors as dim/m contiguous
    blocks covering positions 0..m·(dim//m)-1; a non-divisible dim/m
    would silently drop the remainder components (the pre-r14
    DataFrame form folded them into a partial extra subspace). All
    shipped callers use dim % m == 0 — fail loudly rather than
    silently change semantics (r14 advice item 1)."""
    if dim % m != 0:
        raise ValueError(
            f"PQ requires dim % m == 0 (got dim={dim}, m={m}): "
            "the subspace kernels cover only m*(dim//m) components"
        )


def _row_blocks(vm):
    """Yield fixed-size row blocks of a matrix (guide §5 memory cap)."""
    for s in range(0, vm.shape[0], _PQ_ROW_BLOCK):
        yield vm[s : s + _PQ_ROW_BLOCK], s


def _pq_cb_matrices(cb, m, sub):
    """codes + codebook matrices per subspace from the collected form
    cb[mi] = [(code, [cm...])...] (sorted by code)."""
    import numpy as np

    codes = [np.array([c for c, _ in cb[mi]], dtype=np.int64) for mi in range(m)]
    mats = [
        np.array([cm for _, cm in cb[mi]], dtype=np.int64).reshape(
            len(cb[mi]), sub
        )
        for mi in range(m)
    ]
    return codes, mats


def _pq_assign_batch(vm, codes, mats, m, sub):
    """Per-row argmin code per subspace (n×m int64) plus the argmin
    squared distances (n×m int64) — exact int64, lower-code tiebreak
    via first-minimal-index over ascending codes."""
    import numpy as np

    n = vm.shape[0]
    acodes = np.empty((n, m), dtype=np.int64)
    adists = np.empty((n, m), dtype=np.int64)
    for blk, s in _row_blocks(vm):
        bn = blk.shape[0]
        for mi in range(m):
            x = blk[:, mi * sub : (mi + 1) * sub]
            d = ((x[:, None, :] - mats[mi][None, :, :]) ** 2).sum(axis=2)
            ai = np.argmin(d, axis=1)
            acodes[s : s + bn, mi] = codes[mi][ai]
            adists[s : s + bn, mi] = d[np.arange(bn), ai]
    return acodes, adists


def _pq_train_collect(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    dim: int,
    num_codes: int,
    train_iters: int,
) -> list[list[tuple[int, list[int]]]]:
    """Lloyd-train the PQ codebook with the codebook collected driver-
    side between rounds. Identical recurrence to the DataFrame form
    (init = subvectors of the id<num_codes corpus vectors; assignment =
    exact-int argmin, lower-code tiebreak; update = floor over the
    double sum/count quotient of the same int64 totals; a code with no
    members in a subspace drops out) — but each round is ONE corpus
    pass: a numpy mapInArrow kernel emits per-batch partial sums, one
    aggregate folds them to ≤dim·num_codes rows, the driver collects.
    Returns cb[mi] = [(code, [cm for local pos 0..sub-1]), ...] sorted
    by code."""
    sub = dim // m
    init = (
        corpus.filter(F.col(id_col) < num_codes)
        .select(
            F.col(id_col).cast("long").alias("__code"),
            F.expr(
                f"transform(CAST({vec_col} AS ARRAY<DOUBLE>), "
                f"x -> CAST(floor(x * 1000000) AS BIGINT))"
            ).alias("__vm"),
        )
        .collect()  # ≤ num_codes rows — constant-size, like k-means seeds
    )
    cb: list[list[tuple[int, list[int]]]] = [
        sorted(
            (
                int(r["__code"]),
                [int(v) for v in r["__vm"][mi * sub : (mi + 1) * sub]],
            )
            for r in init
        )
        for mi in range(m)
    ]
    vec_only = corpus.select(F.col(vec_col).alias("__vec"))
    for _ in range(train_iters):
        codes, mats = _pq_cb_matrices(cb, m, sub)

        def _partials(batches, _codes=codes, _mats=mats):
            import numpy as np
            import pyarrow as pa

            sums = [np.zeros((len(_codes[mi]), sub), dtype=np.int64) for mi in range(m)]
            cnts = [np.zeros(len(_codes[mi]), dtype=np.int64) for mi in range(m)]
            seen = False
            for batch in batches:
                vm = _micro(_list_to_matrix(batch.column(0)))
                if vm.shape[0] == 0:
                    continue
                seen = True
                for blk, _ in _row_blocks(vm):
                    for mi in range(m):
                        x = blk[:, mi * sub : (mi + 1) * sub]
                        d = (
                            (x[:, None, :] - _mats[mi][None, :, :]) ** 2
                        ).sum(axis=2)
                        ai = np.argmin(d, axis=1)
                        np.add.at(sums[mi], ai, x)
                        np.add.at(cnts[mi], ai, 1)
            if not seen:
                return
            ms, cs, ps, ss, ns = [], [], [], [], []
            for mi in range(m):
                for ci in range(len(_codes[mi])):
                    if cnts[mi][ci] == 0:
                        continue
                    for j in range(sub):
                        ms.append(mi)
                        cs.append(int(_codes[mi][ci]))
                        ps.append(mi * sub + j)
                        ss.append(int(sums[mi][ci][j]))
                        ns.append(int(cnts[mi][ci]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ms, type=pa.int64()),
                    pa.array(cs, type=pa.int64()),
                    pa.array(ps, type=pa.int64()),
                    pa.array(ss, type=pa.int64()),
                    pa.array(ns, type=pa.int64()),
                ],
                names=["__m", "__code", "__pos", "__s", "__n"],
            )

        upd = (
            vec_only.mapInArrow(
                _partials,
                schema="__m long, __code long, __pos long, __s long, __n long",
            )
            .groupBy("__m", "__code", "__pos")
            .agg(
                # the exact update expression of the DataFrame form:
                # floor over the DOUBLE quotient of the int64 totals
                F.floor(F.sum("__s") / F.sum("__n"))
                .cast("bigint")
                .alias("__cm")
            )
            .collect()  # ≤ dim·num_codes rows — constant-size
        )
        nxt: list[dict[int, list[int | None]]] = [dict() for _ in range(m)]
        for r in upd:
            mi, code, pos = int(r["__m"]), int(r["__code"]), int(r["__pos"])
            nxt[mi].setdefault(code, [None] * sub)[pos - mi * sub] = int(
                r["__cm"]
            )
        cb = [
            sorted((code, cms) for code, cms in d.items())  # type: ignore[misc]
            for d in nxt
        ]
    return cb


def _pq_codes_from_cb(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cb: list[list[tuple[int, list[int]]]],
    m: int,
    sub: int,
) -> DataFrame:
    """Corpus PQ encoding from a collected codebook: the numpy argmin
    kernel emits (__vid, __codes) per row; a codegen posexplode yields
    (__vid, __m, __code) — no join, no shuffle (the original paid a
    broadcast join plus two keyed exchanges)."""
    codes, mats = _pq_cb_matrices(cb, m, sub)
    id_type = corpus.schema[id_col].dataType.simpleString()

    def _encode(batches, _codes=codes, _mats=mats):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            vm = _micro(_list_to_matrix(batch.column(1)))
            acodes, _ = _pq_assign_batch(vm, _codes, _mats, m, sub)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pa.array(acodes.tolist(), type=pa.list_(pa.int64())),
                ],
                names=["__vid", "__codes"],
            )

    return (
        corpus.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vec"))
        .mapInArrow(_encode, schema=f"__vid {id_type}, __codes array<long>")
        .select("__vid", F.posexplode("__codes").alias("__mi", "__code"))
        .select(
            "__vid",
            F.col("__mi").cast("bigint").alias("__m"),
            "__code",
        )
    )


def _pq_err_from_cb(
    side: DataFrame,
    id_col: str,
    vec_col: str,
    cb: list[list[tuple[int, list[int]]]],
    m: int,
    sub: int,
) -> DataFrame:
    """Per-vector exact PQ reconstruction error (Σ over subspaces of
    the argmin squared distance) — (__vid, __err), one pass, no join."""
    codes, mats = _pq_cb_matrices(cb, m, sub)
    id_type = side.schema[id_col].dataType.simpleString()

    def _err(batches, _codes=codes, _mats=mats):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            vm = _micro(_list_to_matrix(batch.column(1)))
            _, adists = _pq_assign_batch(vm, _codes, _mats, m, sub)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pa.array(adists.sum(axis=1).tolist(), type=pa.int64()),
                ],
                names=["__vid", "__err"],
            )

    return side.select(
        F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vec")
    ).mapInArrow(_err, schema=f"__vid {id_type}, __err long")


def _pq_qtable_from_cb(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cb: list[list[tuple[int, list[int]]]],
    m: int,
    sub: int,
) -> DataFrame:
    """Query ADC distance tables from a collected codebook, computed
    driver-side (the query set is broadcast-small by contract, and
    every distance is exact int64): (__qid, __m, __code, __qd).

    The driver-side expansion is |Q|·m·num_codes rows; a bounded-count
    guard enforces the "query side is small" ANN contract with a clear
    error instead of a driver OOM (r14 advice item 3)."""
    import math

    limit = _QTABLE_MAX_QUERIES
    qrows = (
        queries.select(
            F.col(id_col).alias("__qid"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        )
        .limit(limit + 1)
        .collect()  # bounded: the ANN contract pins the query side small
    )
    if len(qrows) > limit:
        raise ValueError(
            f"PQ query side exceeds {limit} rows; the ADC distance "
            "tables are built driver-side (|Q|*m*num_codes rows) and "
            "assume a broadcast-small query set — batch the queries "
            "or raise similarity._QTABLE_MAX_QUERIES deliberately"
        )
    spark = queries.sparkSession
    out = []
    for r in qrows:
        vm = [int(math.floor(x * 1000000.0)) for x in r["__qv"]]
        for mi in range(m):
            x = vm[mi * sub : (mi + 1) * sub]
            for code, cm in cb[mi]:
                d = sum((a - b) * (a - b) for a, b in zip(x, cm))
                out.append((r["__qid"], mi, code, d))
    return spark.createDataFrame(
        out, "__qid long, __m long, __code long, __qd long"
    )


def _pq_exact_rerank(
    short: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact-cosine re-rank of a (__qid, __vid) shortlist: the query
    side broadcasts, the corpus joins on id, ties break on
    (6dp cosine desc, id asc)."""
    q = queries.select(
        F.col(id_col).alias("__qid"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    scored = (
        short.join(F.broadcast(q), "__qid")
        .join(c, "__vid")
        .withColumn("cos_sim", F.round(_cos_from_parts(), 6))
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("cos_sim").desc(), F.col("__vid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            F.col("__vid").alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )


def ann_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    num_codes: int = 16,
    shortlist: int = 50,
    train_iters: int = 2,
) -> DataFrame:
    """Product-quantization ANN with exact re-rank (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
    public algorithm).

    The vector splits into ``m`` subspaces of ``dim/m`` components;
    each subvector is encoded as its nearest of ``num_codes`` codebook
    entries (asymmetric distance computation): a corpus vector becomes
    ``m`` small codes, and scoring a query against the whole corpus is
    ``m`` table lookups per vector instead of ``dim`` multiplies. The
    ``shortlist`` best ADC candidates are then re-ranked with the
    EXACT cosine, so approximation error only costs recall when a true
    neighbor falls outside the shortlist — at shortlist >> k recall
    approaches 1 (measured in-engine by the ``sim_pq_recall`` gate
    query; the SRP-LSH path measured 0.48).

    Determinism contract (oracle-exact, like ``kmeans_clusters``):
    vectors quantize to integer micro-units up front, every subspace
    distance and every ADC sum is exact BIGINT math, argmin ties break
    on the lower code, shortlist ties on the lower id, and the re-rank
    uses the engine-standard 6dp-rounded cosine with an id tiebreak.
    Codebook init = the subvectors of the ``num_codes`` lowest-id
    corpus vectors (the deterministic "sampled centroids" convention
    shared with the IVF coarse quantizer), then refined by
    ``train_iters`` rounds of per-subspace Lloyd's k-means in the same
    exact-integer arithmetic as ``kmeans_clusters`` (assignment =
    BIGINT argmin with a lower-code tiebreak; update = element-wise
    floor(sum/count), exact while |sum| < 2^53 — ~9e9 members per
    code at micro-unit magnitude; a code left with no members in some
    subspace drops out of that subspace's codebook, identically in
    both engines). Training moved the in-engine ``sim_pq_recall``
    audit from 0.92 (sampled codebooks) to the shipped figure — see
    BASELINE.md's sweep table.

    Scale shape: everything is ROW form + codegen. Encoding is one
    broadcast join against m·num_codes·(dim/m) codebook rows and one
    (id, m) partial-agg shuffle — the corpus is scanned once and
    stored as n·m code rows (the compressed index; 8 codes ≈ 8 bytes
    versus 256 bytes of floats). Per query batch: the distance tables
    (q·m·num_codes rows) broadcast; the ADC is one equi-join + one
    (query, id) partial-agg shuffle. No cross join anywhere; the
    shortlist bounds the exact-cosine work to shortlist·q pairs.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    _check_pq_dims(dim, m)
    sub = dim // m
    cb = _pq_train_collect(
        corpus, id_col, vec_col, m, dim, num_codes, train_iters
    )
    # corpus encoding: per (vector, subspace) the argmin code — the
    # numpy kernel against the collected codebook (no join, no shuffle)
    codes = _pq_codes_from_cb(corpus, id_col, vec_col, cb, m, sub)
    # query ADC tables: distance from each query subvector to each code
    qtable = _pq_qtable_from_cb(queries, id_col, vec_col, cb, m, sub)
    approx = (
        codes.join(F.broadcast(qtable), ["__m", "__code"])
        .filter(F.col("__qid") != F.col("__vid"))
        .groupBy("__qid", "__vid")
        .agg(F.sum("__qd").alias("__approx"))
    )
    wshort = Window.partitionBy("__qid").orderBy(
        F.col("__approx").asc(), F.col("__vid").asc()
    )
    short = (
        approx.withColumn("__srank", F.row_number().over(wshort))
        .filter(F.col("__srank") <= shortlist)
        .select("__qid", "__vid")
    )
    # exact-cosine re-rank of the shortlist
    return _pq_exact_rerank(short, corpus, queries, id_col, vec_col, k)


def ann_ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    num_codes: int = 16,
    shortlist: int = 50,
    train_iters: int = 2,
    num_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-PQ ANN — the production-scale composition (Jégou et al.,
    TPAMI 2011 §V; the FAISS ``IVFPQ`` index with
    ``by_residual=false``): an IVF coarse quantizer prunes the corpus
    to the query's ``nprobe`` nearest cells, PQ asymmetric-distance
    scoring ranks only those candidates from the compressed code
    index, and the ``shortlist`` best are re-ranked with the exact
    cosine.

    Composition of the two audited parts, same determinism contracts:
    cell assignment ties on (6dp cosine desc, cid asc) — the
    ``ann_ivf_topk`` convention; codes are trained per-subspace
    integer Lloyd's with exact-BIGINT ADC — the ``ann_pq_topk``
    convention; shortlist ties on the lower id; re-rank on the
    engine-standard 6dp cosine.

    Scale shape — why THIS is the 100 TB ANN plan: the corpus is
    scanned once for cell assignment (broadcast NLJ against
    ``num_centroids`` rows) and once for encoding (broadcast join +
    one (id, m) partial agg); at rest the index is n·m one-byte-ish
    code rows + n cell ids ≈ 30×+ compression. Per query batch the
    probed-cell candidate join prunes ~num_centroids/nprobe-fold
    BEFORE any scoring (the join that makes brute-force ADC over n·m
    rows unnecessary), the ADC aggregate shuffles only
    candidate·m rows keyed (query, id), and the exact re-rank touches
    shortlist·q vectors. Recall is audited in-engine by
    ``sim_ivfpq_recall``.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    # coarse quantizer: assign corpus vectors to 1 cell, probe nprobe
    cent = _ivf_centroids(corpus, id_col, vec_col, num_centroids)
    ca = _ivf_assign(corpus, cent, id_col, vec_col, "__vid", 1).select(
        "__vid", "__cell"
    )
    qa = _ivf_assign(queries, cent, id_col, vec_col, "__qid", nprobe).select(
        "__qid", "__cell"
    )

    # PQ code index + trained codebook (whole-corpus training, raw
    # vectors — the by_residual=false variant keeps ADC tables
    # query-only and the oracle CTE-for-CTE with ann_pq_topk)
    _check_pq_dims(dim, m)
    sub = dim // m
    cb = _pq_train_collect(
        corpus, id_col, vec_col, m, dim, num_codes, train_iters
    )
    codes = _pq_codes_from_cb(corpus, id_col, vec_col, cb, m, sub)
    qtable = _pq_qtable_from_cb(queries, id_col, vec_col, cb, m, sub)

    # candidate pruning: (query, candidate) pairs sharing a probed cell
    # — each pair appears at most once (a candidate's cell is unique)
    cand = (
        ca.join(F.broadcast(qa), "__cell")
        .filter(F.col("__qid") != F.col("__vid"))
        .select("__qid", "__vid")
    )
    # ADC over the pruned candidates only: candidate·m code rows join
    # the broadcast distance tables, one (query, id) partial agg
    approx = (
        cand.join(codes, "__vid")
        .join(F.broadcast(qtable), ["__qid", "__m", "__code"])
        .groupBy("__qid", "__vid")
        .agg(F.sum("__qd").alias("__approx"))
    )
    wshort = Window.partitionBy("__qid").orderBy(
        F.col("__approx").asc(), F.col("__vid").asc()
    )
    short = (
        approx.withColumn("__srank", F.row_number().over(wshort))
        .filter(F.col("__srank") <= shortlist)
        .select("__qid", "__vid")
    )
    return _pq_exact_rerank(short, corpus, queries, id_col, vec_col, k)


def kmeans_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column, in exact
    integer micro-units — the embedding-clustering pass of a training
    corpus pipeline (curation buckets, IVF coarse quantizers).

    Determinism contract (what makes a DuckDB oracle possible):
    - vectors quantize to integer micro-units (floor(x·1e6)) up front;
      every distance is then an exact BIGINT — no float summation order
      anywhere;
    - init: the k vectors with the lowest ids, cluster index = their
      id rank (the standard fixed-seed convention);
    - centroid update: element-wise floor(sum/count) — integer mean;
    - assignment ties break on the lower cluster index (min on the
      (dist, cluster) struct).

    Scale shape: everything runs in ROW form (id, pos, value) — pure
    codegen, no higher-order-function lambdas, no Python. Per
    iteration: one broadcast join against the k·dim centroid rows
    ((k·dim) ≤ a few thousand — always broadcastable), one
    (id, cluster) partial-agg shuffle for distances, one (cluster,
    pos) shuffle for the update. At 1B vectors each iteration is two
    shuffles of n·k and n·dim rows — the canonical distributed Lloyd's.

    Returns per-cluster: cluster_id, n_members, min member id, and the
    exact total within-cluster squared distance (micro-units²).
    """
    assign = kmeans_assignments(df, id_col, vec_col, k, iterations)
    return assign.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min(id_col).alias("min_member"),
        F.sum("dist").alias("total_dist"),
    )


def kmeans_assignments(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Per-vector cluster assignments under the same determinism
    contract as ``kmeans_clusters`` (which aggregates this result) —
    the building block for cluster-blocked downstream passes such as
    semantic dedup (SemDeDup, Abbas et al. 2023: cluster first, then
    near-dup only WITHIN a cluster, so the quadratic is bounded by the
    largest cluster instead of the corpus).

    Returns (id_col, cluster_id, dist): the final assignment after
    ``iterations`` Lloyd's updates, dist = exact squared distance to
    the final centroid in micro-units².

    Contract: ``id_col`` must be unique per row. The final assignment
    is a pure per-row map (one output row per input row); duplicate
    ids would surface as duplicate output rows, where the pre-r14
    grouped form collapsed them (r14 advice item 2). Every shipped
    caller feeds a primary-key id.
    """
    # Vectorized Lloyd's (r14 optimization, guide §4.2): the centroid
    # table is k·dim integers — constant-size — so it lives driver-side
    # between rounds (the seeds were always collected) and each round
    # is ONE corpus pass: a numpy mapInArrow kernel emits per-batch
    # partial member sums, one tiny aggregate folds them, the driver
    # collects ≤k·dim rows. Recurrence, tiebreaks (np.argmin first-
    # minimal index = lower cluster), the floor-over-double-quotient
    # update, and dropped-empty-cluster semantics are identical to the
    # join form (oracle-verified); every quantity is exact int64, so
    # vectorization cannot change a value.
    seeds = (
        df.select(
            F.col(id_col).alias("__vid"),
            F.expr(
                f"transform(CAST({vec_col} AS ARRAY<DOUBLE>), "
                f"x -> CAST(floor(x * 1000000) AS BIGINT))"
            ).alias("__vm"),
        )
        .orderBy("__vid")
        .limit(k)
        .collect()
    )
    if not seeds:
        raise ValueError(
            "k-means on empty input: no vectors to seed centroids from"
        )
    # Fewer than k distinct ids seeds len(seeds) < k clusters — every
    # vector is its own centroid; the result simply has fewer clusters
    # rather than empty ones. Cluster index = id rank among the seeds.
    cents: list[tuple[int, list[int]]] = [
        (i, [int(v) for v in r["__vm"]]) for i, r in enumerate(seeds)
    ]
    vec_only = df.select(F.col(vec_col).alias("__vec"))

    def _cent_matrices(cs):
        import numpy as np

        return (
            np.array([cl for cl, _ in cs], dtype=np.int64),
            np.array([cm for _, cm in cs], dtype=np.int64),
        )

    for _ in range(iterations):
        cls, mat = _cent_matrices(cents)

        def _partials(batches, _cls=cls, _mat=mat):
            import numpy as np
            import pyarrow as pa

            sums = np.zeros_like(_mat)
            cnts = np.zeros(len(_cls), dtype=np.int64)
            seen = False
            for batch in batches:
                vm = _micro(_list_to_matrix(batch.column(0)))
                if vm.shape[0] == 0:
                    continue
                seen = True
                for blk, _ in _row_blocks(vm):
                    d = ((blk[:, None, :] - _mat[None, :, :]) ** 2).sum(
                        axis=2
                    )
                    ai = np.argmin(d, axis=1)
                    np.add.at(sums, ai, blk)
                    np.add.at(cnts, ai, 1)
            if not seen:
                return
            cl_o, pos_o, s_o, n_o = [], [], [], []
            for ci in range(len(_cls)):
                if cnts[ci] == 0:
                    continue
                for j in range(sums.shape[1]):
                    cl_o.append(int(_cls[ci]))
                    pos_o.append(j)
                    s_o.append(int(sums[ci][j]))
                    n_o.append(int(cnts[ci]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cl_o, type=pa.int32()),
                    pa.array(pos_o, type=pa.int32()),
                    pa.array(s_o, type=pa.int64()),
                    pa.array(n_o, type=pa.int64()),
                ],
                names=["__cl", "__pos", "__s", "__n"],
            )

        upd = (
            vec_only.mapInArrow(
                _partials, schema="__cl int, __pos int, __s long, __n long"
            )
            .groupBy("__cl", "__pos")
            .agg(
                # the exact update expression of the join form: floor
                # over the DOUBLE quotient of the int64 totals
                F.floor(F.sum("__s") / F.sum("__n"))
                .cast("bigint")
                .alias("__cm")
            )
            .collect()  # ≤ k·dim rows — constant-size
        )
        nxt: dict[int, dict[int, int]] = {}
        for r in upd:
            nxt.setdefault(int(r["__cl"]), {})[int(r["__pos"])] = int(
                r["__cm"]
            )
        cents = [
            (cl, [poss[p] for p in sorted(poss)])
            for cl, poss in sorted(nxt.items())
        ]

    # final assignment against the last updated centroids — one pass,
    # no shuffle at all
    cls, mat = _cent_matrices(cents)
    id_type = df.schema[id_col].dataType.simpleString()

    def _final(batches, _cls=cls, _mat=mat):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            vm = _micro(_list_to_matrix(batch.column(1)))
            n = vm.shape[0]
            cl_out = np.empty(n, dtype=np.int64)
            d_out = np.empty(n, dtype=np.int64)
            for blk, s in _row_blocks(vm):
                bn = blk.shape[0]
                d = ((blk[:, None, :] - _mat[None, :, :]) ** 2).sum(axis=2)
                ai = np.argmin(d, axis=1)
                cl_out[s : s + bn] = _cls[ai]
                d_out[s : s + bn] = d[np.arange(bn), ai]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pa.array(cl_out.tolist(), type=pa.int32()),
                    pa.array(d_out.tolist(), type=pa.int64()),
                ],
                names=["__kid", "__cl", "__dist"],
            )

    return (
        df.select(F.col(id_col), F.col(vec_col).alias("__vec"))
        .mapInArrow(
            _final, schema=f"__kid {id_type}, __cl int, __dist long"
        )
        .select(
            F.col("__kid").alias(id_col),
            F.col("__cl").alias("cluster_id"),
            F.col("__dist").alias("dist"),
        )
    )


def ivfpq_index_merge(
    archive: DataFrame,
    new: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    dim: int = 64,
    num_codes: int = 16,
    train_iters: int = 2,
    num_centroids: int = 16,
) -> DataFrame:
    """Incremental IVF-PQ index maintenance — the ANN mirror of
    ``dedup.compact_lsh_archive``: merge a NEW vector batch into an
    EXISTING index without retraining, plus the codebook-drift audit
    that says when a retrain is due.

    The index parameters are FROZEN from the archive (coarse
    centroids sampled from archive ids, PQ codebooks Lloyd-trained on
    archive rows only — `_pq_trained_codebook`, the FAISS
    ``IVFPQ.add`` convention): merging is then (a) assign each new
    vector to its nearest existing cell and (b) PQ-encode it with the
    existing codebooks — O(|new|) work, one broadcast join against
    the tiny centroid/codebook relations per step; the archive is
    never re-encoded. Everything is exact BIGINT micro-unit
    arithmetic, so the audit is oracle-checkable.

    Drift audit: per cell, the mean exact PQ reconstruction error
    (Σ_subspace argmin squared distance, micro² units) of the new
    batch vs the archive baseline, and ``drift_ppm`` = (mean_new ·
    1e6) DIV mean_archive — published as exact integer ppm
    (functions/exact.py policy; computed as (Σnew·n_arch·1e6) DIV
    (Σarch·n_new) so no intermediate division ever rounds). A cell
    whose new-batch error runs well past 1e6 ppm of its baseline is
    a cell the frozen codebook no longer fits.

    Scale shape: two broadcast-NLJ cell assignments (against
    num_centroids rows), two broadcast-join + (id, m) partial-agg
    encodes, two per-cell aggregates, one ≤num_centroids-row join.
    Nothing is quadratic; nothing shuffles the raw vectors twice.

    Returns per cell: (cell, n_archive, n_new, mean_err_archive,
    mean_err_new, drift_ppm) — NULL new-side stats for cells the
    batch never touched.
    """
    from broadway_spark.functions.exact import div_trunc, ratio_ppm

    cent = _ivf_centroids(archive, id_col, vec_col, num_centroids)
    _check_pq_dims(dim, m)
    sub = dim // m
    cb = _pq_train_collect(
        archive, id_col, vec_col, m, dim, num_codes, train_iters
    )

    def per_vector_err(side: DataFrame) -> DataFrame:
        # numpy kernel: (__vid, __err) in one pass — the original paid
        # a broadcast join plus two keyed aggregates per side
        return _pq_err_from_cb(side, id_col, vec_col, cb, m, sub)

    a_cell = _ivf_assign(archive, cent, id_col, vec_col, "__vid", 1).select(
        "__vid", "__cell"
    )
    n_cell = _ivf_assign(new, cent, id_col, vec_col, "__vid", 1).select(
        "__vid", "__cell"
    )
    a_agg = (
        a_cell.join(per_vector_err(archive), "__vid")
        .groupBy("__cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_archive"),
            F.sum("__err").cast("decimal(38,0)").alias("__sa"),
        )
    )
    n_agg = (
        n_cell.join(per_vector_err(new), "__vid")
        .groupBy("__cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_new"),
            F.sum("__err").cast("decimal(38,0)").alias("__sn"),
        )
    )
    # Every cell is anchored by its own centroid vector on the archive
    # side, so a left join covers all cells; new-side NULLs mean "no
    # vectors from this batch landed here".
    merged = a_agg.join(n_agg, "__cell", "left")
    na = F.col("n_archive").cast("decimal(38,0)")
    nn = F.col("n_new").cast("decimal(38,0)")
    return merged.select(
        F.col("__cell").alias("cell"),
        "n_archive",
        F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
        div_trunc(F.col("__sa"), F.col("n_archive")).alias(
            "mean_err_archive"
        ),
        div_trunc(F.col("__sn"), F.col("n_new")).alias("mean_err_new"),
        ratio_ppm(F.col("__sn") * na, F.col("__sa") * nn).alias(
            "drift_ppm"
        ),
    )
