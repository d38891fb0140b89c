"""Product-quantization (PQ) approximate nearest neighbour — the third
ANN family next to LSH (`llm/similarity.py::cosine_topk_lsh*`) and IVF
(`cosine_topk_ivf*`), and the one that changes the *storage* equation:
a D-dim float vector (D·4 bytes) is replaced by ``m`` one-byte codes, so
at 100 TB the candidate scan reads a 16-32× smaller relation and the
distance math becomes ``m`` table lookups per pair (Jégou, Douze &
Schmid, "Product quantization for nearest neighbor search", IEEE TPAMI
2011 — the IVFADC paper; the reference has no ANN operator, this is
part of the training-data-pipeline surface the brief adds on top).

Exactness discipline (same as the IVF/LSH int variants): vectors are
quantized to integer units (``round(x·scale)``), codebooks are integer
vectors, so every sub-distance, every argmin and every ADC sum is exact
BIGINT arithmetic — any SQL engine replays the identical codes, distance
tables and ranking, which is what lets the DuckDB oracle check the whole
index bitwise instead of a rows-only recall gate.

Codebooks here are **data-derived and deterministic**: centroid ``c`` of
subspace ``i`` is the ``i``-th subvector of the ``c``-th corpus vector in
``vec_id`` order (the same fixed-seeding recipe as
``q_embedding_topk_ivf_fixed``).  A k-means-trained codebook would drop
in through the same encode/ADC machinery.

Scale shape:
  - codebook: ``m·ksub`` tiny integer vectors on the driver (O(1), like
    the IVF centroid list — NOT data-sized);
  - encode: one narrow projection over the corpus, no shuffle;
  - query: the per-query distance table is ``m·ksub`` BIGINTs —
    broadcast, corpus codes never move;
  - ADC scan: per corpus row, ``m`` array lookups + an exact sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm.similarity import int_vec
from my_flink_1_10_2_spark.operators.rank import top_n

# Guard for the broadcast (query) side, mirroring
# cosine_topk_bruteforce's cap philosophy: the ADC design assumes the
# query set is the small side; an oversized one should fail loudly, not
# OOM the driver/executors through the broadcast.
_MAX_QUERY_ROWS = 65_536


def pq_codebooks(
    corpus: DataFrame,
    m: int,
    ksub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> list[list[list[int]]]:
    """Deterministic PQ codebooks: ``codebooks[i][c]`` is the ``i``-th
    length-``dim/m`` integer subvector of the ``c``-th corpus vector in
    ``id_col`` order.  O(ksub·dim) driver bytes — index metadata, like
    the IVF centroid list."""
    rows = (
        corpus.select(id_col, int_vec(F.col(vec_col), scale).alias("__vi"))
        .orderBy(id_col)
        .limit(ksub)
        .select("__vi")
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"pq_codebooks: corpus has {len(rows)} rows < ksub={ksub}")
    dim = len(rows[0]["__vi"])
    if dim % m:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [[int(v) for v in r["__vi"][i * dsub : (i + 1) * dsub]] for r in rows]
        for i in range(m)
    ]


def _subdist_tables(vi_mat, codebooks):
    """numpy: exact int64 L2**2 distance of every row's subvectors to
    every centroid → (n, m, ksub) int64.  All magnitudes are far below
    2^63 by the integer-unit bounds, so this is the same arithmetic the
    SQL oracle performs — just vectorized."""
    import numpy as np

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cents = np.asarray(codebooks, dtype=np.int64)  # (m, ksub, dsub)
    out = []
    for i in range(m):
        sub = vi_mat[:, i * dsub : (i + 1) * dsub]  # (n, dsub)
        diff = sub[:, None, :] - cents[i][None, :, :]  # (n, ksub, dsub)
        out.append((diff * diff).sum(axis=2))  # exact int64
    return np.stack(out, axis=1)  # (n, m, ksub)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    vec_col: str = "embedding",
    scale: int = 1000,
    codes_col: str = "codes",
) -> DataFrame:
    """Add ``codes_col`` (array<int>, length m): per subspace, the index
    of the nearest centroid by exact integer L2**2, ties to the lowest
    index (``argmin`` keeps the first minimum — the row_number tie rule).
    This is the compressed representation the 100 TB corpus persists —
    m small ints instead of dim floats.

    Arrow-vectorized: the quantization (``int_vec``) happens in Spark so
    the kernel only subtracts/squares INTEGER-VALUED int64 matrices —
    exact in any evaluation order, bit-identical to the SQL oracle.
    (A Catalyst higher-order-function formulation is interpreted, not
    codegen'd — m·ksub·dsub lambda evals per row made it ~50× slower.)
    """
    import numpy as np

    from pyspark.sql.types import ArrayType, IntegerType

    cols = [c for c in df.columns]
    src = df.withColumn("__vi", int_vec(F.col(vec_col), scale))
    out_schema = src.drop("__vi").schema.add(codes_col, ArrayType(IntegerType()))

    def kernel(batches):
        for b in batches:
            if not len(b):
                continue
            vi = np.stack(b["__vi"].to_numpy()).astype(np.int64)
            codes = _subdist_tables(vi, codebooks).argmin(axis=2)  # (n, m)
            out = b.drop(columns=["__vi"])
            out[codes_col] = [row.astype("int32") for row in codes]
            yield out

    return src.mapInPandas(kernel, out_schema).select(*cols, codes_col)


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> list[list[list[int]]]:
    """K-means-TRAINED PQ codebooks via integer Lloyd iterations: init =
    the data-derived codebooks, then per round (a) assign every corpus
    subvector to its nearest centroid by exact int L2**2 (Arrow kernel,
    partition-local partial sums — the shuffle carries partitions·m·ksub
    ·dsub rows, never the data), (b) re-center each cluster and QUANTIZE
    the mean back to integer units via the exact half-up rational
    ``(2·s + c) // (2·c)`` — so every iteration's centroids are integer
    vectors and the whole training run replays bitwise in SQL (floor of
    the correctly-rounded double quotient equals the exact floor while
    ``2·s + c < 2^52``).  Empty clusters keep their previous centroid.
    """
    import numpy as np
    import pandas as pd

    cb = pq_codebooks(corpus, m, ksub, id_col, vec_col, scale)
    dsub = len(cb[0][0])
    src = corpus.select(int_vec(F.col(vec_col), scale).alias("__vi"))
    for _ in range(iterations):
        cur = cb

        def kern(batches, cur=cur):
            for b in batches:
                if not len(b):
                    continue
                vi = np.stack(b["__vi"].to_numpy()).astype(np.int64)
                codes = _subdist_tables(vi, cur).argmin(axis=2)  # (n, m)
                rows = {"i": [], "k": [], "j": [], "s": [], "c": []}
                for i in range(m):
                    sub = vi[:, i * dsub : (i + 1) * dsub]
                    for kk in range(ksub):
                        mask = codes[:, i] == kk
                        cnt = int(mask.sum())
                        if not cnt:
                            continue
                        ssum = sub[mask].sum(axis=0)
                        for j in range(dsub):
                            rows["i"].append(i)
                            rows["k"].append(kk)
                            rows["j"].append(j)
                            rows["s"].append(int(ssum[j]))
                            rows["c"].append(cnt)
                yield pd.DataFrame(rows)

        agg = (
            src.mapInPandas(kern, "i int, k int, j int, s long, c long")
            .groupBy("i", "k", "j")
            .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
            .collect()
        )
        nxt = [[list(cent) for cent in sub] for sub in cb]
        for r in agg:
            if r["c"] > 0:
                s_, c_ = int(r["s"]), int(r["c"])
                # oracle parity contract: floor(double(2s+c)/double(2c))
                # equals the exact rational floor only below 2^52 — fail
                # LOUDLY past it instead of silently diverging from SQL
                if abs(2 * s_ + c_) >= 2**52 or 2 * c_ >= 2**52:
                    raise ValueError(
                        "pq_train: |2*s + c| or 2*c exceeds 2^52 — the "
                        "half-up rational (2s+c)//(2c) no longer replays "
                        "bitwise as a double division in SQL; re-run with "
                        "a smaller quantization scale"
                    )
                nxt[r["i"]][r["k"]][r["j"]] = (2 * s_ + c_) // (2 * c_)
        cb = nxt
    return cb


def pq_topk_adc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1000,
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: exact per-query distance tables
    against the codebooks, corpus scanned as codes only.

    Returns (query_id, vec_id, adist, rank) — ``adist`` is the exact
    BIGINT ADC distance (sum over subspaces of the query→centroid
    sub-distance for the corpus vector's code), ``rank`` ascending by
    (adist, vec_id).  Self-pairs are excluded.

    Scale: codes relation is the only corpus-sized input (m ints/row);
    the query side (m·ksub longs per query) is broadcast; no shuffle of
    corpus data at all — the top-k is the partition-local + global-k
    pattern from :func:`operators.rank.top_n`.
    """
    n_queries = queries.limit(_MAX_QUERY_ROWS + 1).count()
    if n_queries > _MAX_QUERY_ROWS:
        raise ValueError(
            f"pq_topk_adc: query set exceeds {_MAX_QUERY_ROWS} rows — the "
            "ADC plan broadcasts per-query distance tables; run the large "
            "side as the corpus, or batch the queries"
        )
    import numpy as np

    if codebooks is None:
        codebooks = pq_codebooks(corpus, m, ksub, id_col, vec_col, scale)
    coded = pq_encode(corpus, codebooks, vec_col, scale).select(id_col, "codes")

    def qkernel(batches):
        import pandas as pd

        for b in batches:
            if not len(b):
                continue
            vi = np.stack(b["__vi"].to_numpy()).astype(np.int64)
            tabs = _subdist_tables(vi, codebooks)  # (n, m, ksub)
            yield pd.DataFrame(
                {
                    query_id_col: b[query_id_col].to_numpy(),
                    "__dtable": [list(map(list, t)) for t in tabs],
                }
            )

    qtab = (
        queries.select(F.col(id_col).alias(query_id_col), vec_col)
        .withColumn("__vi", int_vec(F.col(vec_col), scale))
        .mapInPandas(qkernel, f"{query_id_col} long, __dtable array<array<long>>")
    )

    lookups = F.zip_with(
        F.col("codes"),
        F.col("__dtable"),
        lambda c, row: F.element_at(row, (c + 1).cast("int")),
    )
    scored = (
        coded.crossJoin(F.broadcast(qtab))
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                lookups, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("adist"),
        )
    )
    return top_n(
        scored,
        [query_id_col],
        [F.col("adist"), F.col(id_col)],
        k,
        ascending=True,
        rank_col="rank",
    )


# ---------------------------------------------------------------------------
# IVFADC — the full Jégou/Douze/Schmid index (TPAMI 2011 §IV): an IVF
# coarse quantizer prunes the search to n_probe inverted lists, and a
# PQ codebook built on RESIDUALS (v − centroid) encodes what the coarse
# step left over.  This is the shape production ANN ships at 100 TB:
# the corpus is partitioned by centroid (only probed lists are
# scanned — partition pruning does the skipping), each row stores m
# bytes of residual code, and query cost is n_probe distance tables +
# an ADC scan of the probed lists.
# ---------------------------------------------------------------------------


def _coarse_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    scale: int,
) -> list[list[int]]:
    """Deterministic coarse quantizer: the n_centroids lowest-id corpus
    vectors in integer units (the q_embedding_topk_ivf_fixed recipe).
    O(n_centroids·dim) driver metadata."""
    rows = (
        corpus.select(id_col, int_vec(F.col(vec_col), scale).alias("__vi"))
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    if len(rows) < n_centroids:
        raise ValueError("ivfadc: corpus smaller than n_centroids")
    return [[int(v) for v in r["__vi"]] for r in rows]


def _assign_and_residual_kernel(cents, n_take: int | None = None):
    """numpy: exact int64 L2**2 argmin over the coarse centroids (ties
    to the lowest index) and the integer residual vectors.  With
    ``n_take``: the n_take nearest centroids per row (probe lists),
    ordered by (distance, index)."""
    import numpy as np

    C = np.asarray(cents, dtype=np.int64)  # (nc, dim)

    def one(vi_mat):
        diff = vi_mat[:, None, :] - C[None, :, :]  # (n, nc, dim)
        d = (diff * diff).sum(axis=2)  # exact int64
        if n_take is None:
            code = d.argmin(axis=1)  # first min = lowest index
            res = vi_mat - C[code]
            return code, res
        order = np.argsort(d, axis=1, kind="stable")  # ties → lowest index
        return order[:, :n_take], d

    return one


def ivfadc_index(
    corpus: DataFrame,
    n_centroids: int = 8,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
):
    """Build the IVFADC index: returns (coded, cents, codebooks) where
    ``coded`` is (id, centroid, codes) — the persisted form: an int
    list id + m small codes per vector, partitionable by ``centroid``
    so a probe scans only its lists.  The residual PQ codebooks are the
    subvectors of the first ksub residuals in id order (deterministic,
    O(ksub·dim) metadata)."""
    import numpy as np
    import pandas as pd

    cents = _coarse_centroids(corpus, n_centroids, id_col, vec_col, scale)
    assign = _assign_and_residual_kernel(cents)

    src = corpus.select(id_col, int_vec(F.col(vec_col), scale).alias("__vi"))

    def res_kernel(batches):
        for b in batches:
            if not len(b):
                continue
            vi = np.stack(b["__vi"].to_numpy()).astype(np.int64)
            code, res = assign(vi)
            yield pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    "centroid": code.astype("int32"),
                    "__res": list(res),
                }
            )

    residuals = src.mapInPandas(
        res_kernel, f"{id_col} long, centroid int, __res array<long>"
    )
    # deterministic residual codebooks: subvectors of the first ksub
    # residuals in id order
    head = residuals.orderBy(id_col).limit(ksub).select("__res").collect()
    if len(head) < ksub:
        raise ValueError("ivfadc: corpus smaller than ksub")
    dim = len(head[0]["__res"])
    if dim % m:
        raise ValueError(f"ivfadc: dim {dim} not divisible by m={m}")
    dsub = dim // m
    codebooks = [
        [[int(v) for v in r["__res"][i * dsub : (i + 1) * dsub]] for r in head]
        for i in range(m)
    ]

    def code_kernel(batches):
        for b in batches:
            if not len(b):
                continue
            res = np.stack(b["__res"].to_numpy()).astype(np.int64)
            codes = _subdist_tables(res, codebooks).argmin(axis=2)
            yield pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    "centroid": b["centroid"].to_numpy(),
                    "codes": [row.astype("int32") for row in codes],
                }
            )

    coded = residuals.mapInPandas(
        code_kernel, f"{id_col} long, centroid int, codes array<int>"
    )
    return coded, cents, codebooks


def ivfadc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1000,
) -> DataFrame:
    """IVFADC approximate k-NN: probe the ``n_probe`` nearest coarse
    lists, ADC-scan only those lists with per-(query, probed-centroid)
    residual distance tables.  Returns (query_id, vec_id, adist, rank)
    with ``adist`` the exact BIGINT ADC distance — every stage
    (assignment, residuals, codes, probes, tables, sums, ranking) is
    integer-exact and SQL-replayable.

    Scale: the corpus relation is (centroid, m codes) — partitioned by
    centroid, only probed partitions are read; the query side is
    queries×n_probe rows of m·ksub longs, broadcast into an equi-join
    on ``centroid`` (a bucket join, not a cross join)."""
    import numpy as np
    import pandas as pd

    n_queries = queries.limit(_MAX_QUERY_ROWS + 1).count()
    if n_queries > _MAX_QUERY_ROWS:
        raise ValueError(
            f"ivfadc_topk: query set exceeds {_MAX_QUERY_ROWS} rows — batch "
            "the queries or run the large side as the corpus"
        )
    coded, cents, codebooks = ivfadc_index(
        corpus, n_centroids, m, ksub, id_col, vec_col, scale
    )
    probe = _assign_and_residual_kernel(cents, n_take=n_probe)
    C = np.asarray(cents, dtype=np.int64)

    def qkernel(batches):
        for b in batches:
            if not len(b):
                continue
            vi = np.stack(b["__vi"].to_numpy()).astype(np.int64)
            lists, _ = probe(vi)  # (n, n_probe) centroid ids
            rows = {query_id_col: [], "centroid": [], "__dtable": []}
            for r in range(len(vi)):
                for c in lists[r]:
                    res = (vi[r] - C[c])[None, :]
                    tab = _subdist_tables(res, codebooks)[0]  # (m, ksub)
                    rows[query_id_col].append(b[query_id_col].iloc[r])
                    rows["centroid"].append(int(c))
                    rows["__dtable"].append([list(map(int, t)) for t in tab])
            yield pd.DataFrame(rows)

    qtab = (
        queries.select(F.col(id_col).alias(query_id_col), vec_col)
        .withColumn("__vi", int_vec(F.col(vec_col), scale))
        .mapInPandas(
            qkernel,
            f"{query_id_col} long, centroid int, __dtable array<array<long>>",
        )
    )
    lookups = F.zip_with(
        F.col("codes"),
        F.col("__dtable"),
        lambda c, row: F.element_at(row, (c + 1).cast("int")),
    )
    scored = (
        coded.join(F.broadcast(qtab), "centroid")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                lookups, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("adist"),
        )
    )
    return top_n(
        scored,
        [query_id_col],
        [F.col("adist"), F.col(id_col)],
        k,
        ascending=True,
        rank_col="rank",
    )
