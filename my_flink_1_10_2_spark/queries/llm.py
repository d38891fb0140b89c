"""LLM-data-pipeline queries: text analysis, dedup (exact / n-gram Jaccard
/ MinHash+LSH / SimHash), embedding similarity search, multimodal columns.

Oracles are built programmatically from the SAME constants as the engine
implementations (stopword lists, hash construction, shingle size), so
engine and oracle can't drift apart.  Hashes derive from md5 — identical
in Spark and DuckDB — making even MinHash/SimHash exactly replayable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm import dedup as D
from my_flink_1_10_2_spark.llm import similarity as S
from my_flink_1_10_2_spark.llm import text as T
from my_flink_1_10_2_spark.llm.multimodal import (
    documents_as_media,
    extract_features,
    synthetic_png_media,
)
from my_flink_1_10_2_spark.queries import read, register


def _cpu_spread(df):
    """Round-robin repartition to the session's shuffle parallelism
    before a CPU-heavy Arrow stage.  Codec work is pure Python CPU per
    row: a small parquet scan yields 1-2 input splits, which would run
    the whole corpus serially on one core.  The shuffle moves only the
    stage's input columns (here a bigint id / small payload), and at
    real scale this is the standard rebalance before an expensive UDF
    stage (AQE coalescing does not apply to mapInPandas inputs)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n)


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect) mirroring llm.text / llm.dedup
# ---------------------------------------------------------------------------

_WORDS = r"str_split_regex(text, '\s+')"
_SHINGLES = (
    "list_transform(range(1, greatest(len({w})-2, 1)+1), "
    "i -> array_to_string({w}[i:i+2], ' '))"
).format(w=_WORDS)


def _hits_sql(sw: list[str]) -> str:
    cond = " OR ".join(f"w = '{s}'" for s in sw)
    return f"len(list_filter({_WORDS}, w -> {cond}))"


def _lang_case_sql() -> str:
    scores = {lang: _hits_sql(sw) for lang, sw in T.STOPWORDS.items()}
    whens = []
    for lang in T.LANG_ORDER:
        s = scores[lang]
        conds = [f"{s} > 0"]
        for other in T.LANG_ORDER:
            if T.LANG_ORDER.index(other) < T.LANG_ORDER.index(lang):
                conds.append(f"{s} > {scores[other]}")
            elif other != lang:
                conds.append(f"{s} >= {scores[other]}")
        whens.append("WHEN " + " AND ".join(conds) + f" THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


_MD5H = "('0x' || substr(md5('{seed}|' || {col}), 1, 15))::BIGINT"


def _minhash_mins(num_hashes: int) -> list[str]:
    # mirrors llm.dedup.minhash_signatures: hash i = 32-bit slice #(i%4) of
    # md5 digest group g=i//4
    out = []
    for i in range(num_hashes):
        g, lo = i // 4, (i % 4) * 8 + 1
        out.append(
            f"min(('0x' || substr(md5('{g}|' || shingle), {lo}, 8))::BIGINT) AS h{i}"
        )
    return out


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "q_text_stats",
    oracle=f"""
    SELECT doc_id,
           len({_WORDS}) AS n_tokens,
           length(text)  AS n_chars_computed,
           length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
             / greatest(length(text), 1) AS punct_ratio,
           list_sum(list_transform({_WORDS}, w -> CAST(length(w) AS DOUBLE)))
             / greatest(len({_WORDS}), 1) AS avg_word_len
    FROM documents
    """,
    category="llm_text",
)
def q_text_stats(spark, sf_dir):
    """Token counting + char/punct stats (SURVEY §7.2 step 7 text analysis).

    Pure JVM expressions — the 100 TB path never leaves codegen.
    """
    docs = read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.char_count("text").alias("n_chars_computed"),
        T.punct_ratio("text").alias("punct_ratio"),
        T.avg_word_len("text").alias("avg_word_len"),
    )


@register(
    "q_lang_id",
    oracle=f"""
    SELECT doc_id, lang, {_lang_case_sql()} AS lang_pred
    FROM documents
    """,
    category="llm_text",
)
def q_lang_id(spark, sf_dir):
    """Stopword-profile language ID heuristic (deterministic CASE chain)."""
    docs = read(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", T.lang_id("text").alias("lang_pred"))


@register(
    "q_quality_score",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len({_WORDS}) AS DOUBLE) AS n_tok,
             list_sum(list_transform({_WORDS}, w -> CAST(length(w) AS DOUBLE)))
               / greatest(len({_WORDS}), 1) AS wl,
             length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
               / greatest(length(text), 1) AS pr
      FROM documents
    )
    SELECT doc_id,
           round((least(n_tok / 50.0, 1.0)
                + (1.0 - least(abs(wl - 5.0) / 5.0, 1.0))
                + (1.0 - least(pr * 5, 1.0))) / 3, 6) AS quality
    FROM s
    """,
    category="llm_text",
)
def q_quality_score(spark, sf_dir):
    """Composite document quality score (length / word-size / punctuation)."""
    docs = read(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score("text").alias("quality"))


@register(
    "q_fingerprint",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents)
    SELECT doc_id,
           CAST(list_reduce(
             list_transform(words, w ->
               list_sum(list_transform(str_split(w, ''), c -> CAST(ascii(c) AS BIGINT)))),
             (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS fingerprint
    FROM w
    """,
    category="llm_text",
)
def q_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (llm.text.fingerprint)."""
    docs = read(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS digest, min(doc_id) AS doc_id, count(*) AS dup_count
    FROM documents GROUP BY 1
    """,
    category="llm_dedup",
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: one hash-groupBy shuffle on the md5 digest."""
    return D.exact_dedup(read(spark, sf_dir, "documents"))


@register(
    "q_shingles",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents WHERE doc_id <= 50)
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                 i -> array_to_string(words[i:i+2], ' '))) AS shingle
    FROM w
    """,
    category="llm_dedup",
)
def q_shingles(spark, sf_dir):
    """3-word shingle extraction (the explode feeding MinHash/Jaccard)."""
    docs = read(spark, sf_dir, "documents").filter("doc_id <= 50")
    return D.shingles(docs)


@register(
    "q_ngram_jaccard",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                        i -> array_to_string(words[i:i+2], ' '))) AS shingle
           FROM w),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter_sz
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc1, doc2,
           inter_sz / (s1.sz + s2.sz - inter_sz) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE inter_sz / (s1.sz + s2.sz - inter_sz) >= 0.2
    """,
    category="llm_dedup",
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (shingle self-join — shuffle
    keyed on shingle, never a cartesian product)."""
    docs = read(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.2)


@register(
    "q_minhash_signatures",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                        i -> array_to_string(words[i:i+2], ' '))) AS shingle
           FROM w),
    sig AS (SELECT doc_id, {', '.join(_minhash_mins(16))} FROM sh GROUP BY doc_id)
    SELECT doc_id,
           array_to_string([{', '.join(f'h{i}' for i in range(16))}], ',') AS sig_str
    FROM sig
    """,
    category="llm_dedup",
)
def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (16 md5-derived hash fns, min per shingle set).

    The md5-based hash family is engine-portable, so the oracle replays
    the exact signature — not just a statistical check.
    """
    docs = read(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, num_hashes=16)
    return sig.select(
        "doc_id", F.concat_ws(",", *[F.col("sig")[i].cast("string") for i in range(16)]).alias("sig_str")
    )


@register(
    "q_minhash_lsh_pairs",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                        i -> array_to_string(words[i:i+2], ' '))) AS shingle
           FROM w),
    sig AS (SELECT doc_id, {', '.join(_minhash_mins(16))} FROM sh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b,
             CASE b
               {' '.join(f"WHEN {b} THEN array_to_string([h{4*b}, h{4*b+1}, h{4*b+2}, h{4*b+3}], ',')" for b in range(4))}
             END AS band_key,
             [{', '.join(f'h{i}' for i in range(16))}] AS sig
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2, a.sig AS sig1, b.sig AS sig2
      FROM banded a JOIN banded b ON a.b = b.b AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    )
    SELECT doc1, doc2,
           len(list_filter(range(1, 17), i -> sig1[i] = sig2[i])) / 16.0 AS est_jaccard
    FROM cand
    WHERE len(list_filter(range(1, 17), i -> sig1[i] = sig2[i])) / 16.0 >= 0.25
    """,
    category="llm_dedup",
)
def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH banding near-dup candidates — the O(collisions) scale
    path that replaces the O(n²) comparison (SURVEY §7.2 step 7)."""
    docs = read(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.25)


def _simhash_oracle(bits: int = 32) -> str:
    h = _MD5H.format(seed=0, col="w")
    votes = []
    for b in range(bits):
        votes.append(
            f"CASE WHEN list_sum(list_transform(dw, w -> CASE WHEN (({h}) >> {b}) & 1 = 1 "
            f"THEN 1 ELSE -1 END)) > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END"
        )
    total = " + ".join(votes)
    return f"""
    WITH w AS (SELECT doc_id, list_distinct({_WORDS}) AS dw FROM documents WHERE doc_id <= 100)
    SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM w
    """


@register("q_simhash", oracle=_simhash_oracle(32), category="llm_dedup")
def q_simhash(spark, sf_dir):
    """SimHash 32-bit signatures — bit-exact against the oracle thanks to
    the md5 hash family."""
    docs = read(spark, sf_dir, "documents").filter("doc_id <= 100")
    return D.simhash(docs, bits=32)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@register(
    "q_embedding_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.q_vec,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, round(sim, 9) AS sim, rank FROM (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    category="llm_similarity",
)
def q_embedding_topk(spark, sf_dir):
    """Exact cosine top-k neighbors (brute force, queries broadcast —
    corpus never shuffles; the LSH variant is the 100 TB path)."""
    emb = read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    out = S.cosine_topk_bruteforce(emb, queries, k=5)
    return out.withColumn("sim", F.round("sim", 9))


def _lsh_int_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 8,
    k: int = 5,
    scale: int = 1000,
) -> str:
    """Exact SQL replay of the integer-unit LSH index: the md5-derived
    hyperplanes are integer constants, the vectors are quantized to
    integer units, so every bucket bit is the sign of an EXACT dot
    product both engines agree on (all partial sums are integers
    < 2^53 — any summation order is exact)."""
    from my_flink_1_10_2_spark.llm.similarity import planes_int

    def bexpr(t: int) -> str:
        bits = []
        for p, plane in enumerate(planes_int(dim, num_planes, t)):
            lit = "[" + ", ".join(f"{v}.0" for v in plane) + "]"
            bits.append(
                f"(CASE WHEN list_dot_product(vi, {lit}) > 0 THEN {2 ** p} ELSE 0 END)"
            )
        return " + ".join(bits)

    tbls = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, {t} AS tbl, {bexpr(t)} AS bucket FROM corpus"
        for t in range(num_tables)
    )
    return f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * {scale})) AS vi
      FROM embeddings
    ),
    buckets AS MATERIALIZED (
{tbls}
    ),
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, b.vec_id
      FROM buckets qb JOIN buckets b ON qb.tbl = b.tbl AND qb.bucket = b.bucket
      WHERE qb.vec_id < 10 AND b.vec_id <> qb.vec_id
    ),
    scored AS (
      SELECT c.query_id, c.vec_id, list_cosine_similarity(q.v, e.v) AS sim
      FROM cand c JOIN corpus q ON q.vec_id = c.query_id
                  JOIN corpus e ON e.vec_id = c.vec_id
    )
    SELECT query_id, vec_id, round(sim, 9) AS sim, rank FROM (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM scored) WHERE rank <= {k}
    """


@register("q_embedding_topk_lsh", oracle=_lsh_int_oracle(), category="llm_similarity")
def q_embedding_topk_lsh(spark, sf_dir):
    """Approximate top-k via random-hyperplane LSH buckets — the
    integer-unit hash family makes the OR-amplified candidate set
    engine-independent, so the full index path (8 tables × 4 integer
    hyperplane signs → bucket equi-join → exact cosine re-rank) is
    graded exactly, not rows-only.  Recall vs brute force is additionally
    asserted in tests/test_llm.py."""
    emb = read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    out = S.cosine_topk_lsh_int(emb, queries, dim=64, k=5, num_planes=4, num_tables=8)
    return out.withColumn("sim", F.round("sim", 9))


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@register(
    "q_multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
    category="llm_multimodal",
)
def q_multimodal_metadata(spark, sf_dir):
    """Multimodal column model: opaque binary payload + typed metadata;
    metadata predicates push down so codecs only see selected rows."""
    media = documents_as_media(read(spark, sf_dir, "documents"))
    return media.select("media_id", "mime", "n_bytes")


@register(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
           octet_length(encode(text)) AS n_bytes,
           round((COALESCE(list_sum(list_transform(range(0, 64),
                    j -> CASE WHEN 1 + j*8 <= length(text)
                              THEN ascii(substr(text, 1 + j*8, 1)) ELSE 0 END)), 0)
                  % 997) / 997.0, 6) AS f0
    FROM documents
    """,
    category="llm_multimodal",
)
def q_multimodal_features(spark, sf_dir):
    """Decode + feature-extract via Arrow-batched mapInPandas. The codec
    is the declared deterministic stub (byte-stride sums mod 997 — real
    image/audio libs aren't in this container), which makes even the
    Python decode path exactly replayable by the SQL oracle: the
    fixture text is ASCII, so character codes ARE the payload bytes."""
    media = documents_as_media(read(spark, sf_dir, "documents"))
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id", "mime", "n_bytes", F.round(F.element_at("features", 1), 6).alias("f0")
    )


@register(
    "q_png_pixel_stats",
    oracle="""
    SELECT media_id, width, height,
           CAST(SUM((media_id*31 + i*7) % 256) AS BIGINT) AS px_sum,
           CAST(MIN((media_id*31 + i*7) % 256) AS BIGINT) AS px_min,
           CAST(MAX((media_id*31 + i*7) % 256) AS BIGINT) AS px_max
    FROM (
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 5 AS BIGINT) AS width,
             CAST(3 + doc_id % 4 AS BIGINT) AS height,
             unnest(range((4 + doc_id % 5) * (3 + doc_id % 4))) AS i
      FROM documents)
    GROUP BY media_id, width, height
    """,
    category="llm_multimodal",
)
def q_png_pixel_stats(spark, sf_dir):
    """REAL image decode (ref-brief multimodal slot): per-document PNGs
    are encoded executor-side with mixed scanline filters, then decoded
    by the pure-stdlib baseline PNG codec (llm/png.py — zlib inflate +
    Sub/Up/Average/Paeth unfiltering), and the DECODED pixel statistics
    are graded against the closed-form SQL replay of the pixel rule.
    Any inflate/unfilter defect mismatches; the JPEG/video codecs stay
    honestly gated."""
    docs = read(spark, sf_dir, "documents")
    feats = extract_features(synthetic_png_media(docs), fake=False)
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("bigint").alias("width"),
        F.element_at("features", 2).cast("bigint").alias("height"),
        F.element_at("features", 5).cast("bigint").alias("px_sum"),
        F.element_at("features", 6).cast("bigint").alias("px_min"),
        F.element_at("features", 7).cast("bigint").alias("px_max"),
    )


@register(
    "q_image_dhash_neardup",
    oracle="""
    WITH idx AS (SELECT doc_id AS d, unnest(range(64)) AS k FROM documents),
    cells AS (
      SELECT d, k,
             (k // 8) * 16 + ((k % 8) * 16) // 9 AS i1,
             (k // 8) * 16 + (((k % 8) + 1) * 16) // 9 AS i2
      FROM idx),
    vals AS (
      SELECT d, k,
             CASE WHEN i1 = (d*13) % 128 THEN ((d%50)*31 + i1*7 + 128) % 256
                  ELSE ((d%50)*31 + i1*7) % 256 END AS v1,
             CASE WHEN i2 = (d*13) % 128 THEN ((d%50)*31 + i2*7 + 128) % 256
                  ELSE ((d%50)*31 + i2*7) % 256 END AS v2
      FROM cells),
    h AS MATERIALIZED (
      SELECT d,
             CAST(sum(CASE WHEN k < 32 AND v1 > v2
                           THEN 1::BIGINT << k ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN k >= 32 AND v1 > v2
                           THEN 1::BIGINT << (k - 32) ELSE 0 END) AS BIGINT) AS hi
      FROM vals GROUP BY d)
    SELECT a.d AS doc_a, b.d AS doc_b,
           CAST(bit_count(xor(a.lo, b.lo))
                + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.d < b.d
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    ORDER BY doc_a, doc_b
    """,
    category="llm_multimodal",
)
def q_image_dhash_neardup(spark, sf_dir):
    """Image perceptual near-dup (the multimodal analog of MinHash-LSH
    text dedup): per-document PNGs — period-50 groups with a one-pixel
    perturbation — are REALLY encoded (mixed scanline filters), REALLY
    decoded (llm/png.py), dHashed over the decoded pixels (9x8
    nearest-neighbor grid, 64 horizontal-gradient bits), and paired by a
    4x16-bit banded hamming join (pigeonhole-exact for hamming <= 3 —
    candidates are band-bucket collisions, never all-pairs).  The SQL
    oracle replays the closed-form pixels through the same dHash
    arithmetic; any decode/resize/packing defect mismatches."""
    docs = read(spark, sf_dir, "documents")
    from my_flink_1_10_2_spark.llm.multimodal import (
        dhash_neardup_pairs,
        neardup_png_media,
        png_dhash,
    )

    hashes = png_dhash(neardup_png_media(docs))
    return dhash_neardup_pairs(hashes, max_hamming=3).orderBy("doc_a", "doc_b")


@register(
    "q_wav_audio_stats",
    oracle="""
    SELECT media_id, n_samples,
           CAST(sum(s) AS BIGINT) AS s_sum,
           CAST(min(s) AS BIGINT) AS s_min,
           CAST(max(s) AS BIGINT) AS s_max,
           CAST(sum(CASE WHEN i > 0
                         AND ((((media_id*17 + (i-1)*13) % 2048) - 1024 < 0)
                              <> (s < 0))
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM (
      SELECT media_id, n_samples, i,
             ((media_id*17 + i*13) % 2048) - 1024 AS s
      FROM (
        SELECT doc_id AS media_id,
               CAST(64 + doc_id % 32 AS BIGINT) AS n_samples,
               unnest(range(64 + doc_id % 32)) AS i
        FROM documents))
    GROUP BY media_id, n_samples
    """,
    category="llm_multimodal",
)
def q_wav_audio_stats(spark, sf_dir):
    """REAL audio decode (the WAV leg of the multimodal column):
    per-document PCM waveforms are encoded as genuine RIFF/WAVE files
    executor-side, decoded back by the pure-stdlib codec (llm/wav.py —
    RIFF chunk walk + little-endian PCM frames), and the DECODED sample
    statistics (sum/min/max/zero-crossings) are graded against the
    closed-form SQL replay.  Compressed audio stays honestly gated."""
    from my_flink_1_10_2_spark.llm.multimodal import synthetic_wav_media

    docs = read(spark, sf_dir, "documents")
    feats = extract_features(synthetic_wav_media(docs), fake=False)
    return feats.select(
        "media_id",
        F.element_at("features", 3).cast("bigint").alias("n_samples"),
        F.element_at("features", 4).cast("bigint").alias("s_sum"),
        F.element_at("features", 5).cast("bigint").alias("s_min"),
        F.element_at("features", 6).cast("bigint").alias("s_max"),
        F.element_at("features", 7).cast("bigint").alias("zero_crossings"),
    )


@register(
    "q_audio_autocorr_pitch",
    oracle="""
    WITH s AS MATERIALIZED (
      SELECT media_id, i, ((media_id*17 + i*13) % 2048) - 1024 AS v
      FROM (
        SELECT doc_id AS media_id,
               unnest(range(64 + doc_id % 32)) AS i
        FROM documents)),
    ac AS (
      SELECT a.media_id, lags.lag AS lag,
             CAST(sum(a.v * b.v) AS BIGINT) AS r
      FROM (SELECT unnest(range(2, 17)) AS lag) lags
      JOIN s a ON TRUE
      JOIN s b ON b.media_id = a.media_id AND b.i = a.i + lags.lag
      GROUP BY a.media_id, lags.lag)
    SELECT media_id,
           CAST(lag AS BIGINT) AS pitch_lag,
           r AS peak_autocorr
    FROM (
      SELECT media_id, lag, r,
             row_number() OVER (PARTITION BY media_id
                                ORDER BY r DESC, lag) AS rn
      FROM ac)
    WHERE rn = 1
    """,
    category="llm_multimodal",
)
def q_audio_autocorr_pitch(spark, sf_dir):
    """Audio analysis on REAL decoded samples: dominant period by
    integer autocorrelation — r(lag) = Σ s[i]·s[i+lag] over lags 2..16
    on the PCM samples decoded from genuine WAV files (llm/wav.py),
    argmax tie-broken toward the smaller lag.  Exact BIGINT arithmetic
    end-to-end, so the SQL oracle replays the closed-form waveform
    through identical sums; any decode defect shifts every product."""
    import pandas as _pd

    from my_flink_1_10_2_spark.llm.multimodal import synthetic_wav_media
    from my_flink_1_10_2_spark.llm.wav import wav_decode

    def pitch(batches):
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _r, _c, _b, s = wav_decode(payload)
                best_lag, best_r = None, None
                for lag in range(2, 17):
                    r = sum(s[i] * s[i + lag] for i in range(len(s) - lag))
                    if best_r is None or r > best_r:
                        best_lag, best_r = lag, r
                out.append((int(mid), best_lag, best_r))
            yield _pd.DataFrame(
                out, columns=["media_id", "pitch_lag", "peak_autocorr"]
            )

    media = synthetic_wav_media(read(spark, sf_dir, "documents"))
    return _cpu_spread(media).mapInPandas(
        pitch, "media_id bigint, pitch_lag bigint, peak_autocorr bigint"
    )


# ---------------------------------------------------------------------------
# token counting (pipeline brief: whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "q_token_count",
    oracle=r"""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> ''))                     AS ws_tokens,
           len(regexp_extract_all(text,
                           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
    FROM documents
    """,
    category="llm_text",
)
def q_token_count(spark, sf_dir):
    """Token counting for training-data budgeting: whitespace tokens and
    a BPE-ish regex segmentation (letters runs / digit runs / single
    punctuation — the GPT-2 pre-tokenizer shape). Pure JVM regex, no
    Python per row."""
    docs = read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))
        ).alias("bpe_tokens"),
    )


def _ivf_int_oracle(
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 3,
    k: int = 5,
    scale: int = 1000,
) -> str:
    """Exact SQL replay of integer-unit IVF with the Lloyd iterations
    UNROLLED as CTEs (the community-detection recipe): centroids are
    integer SUM vectors (cosine is scale-invariant), assignment/probe
    scores are exact-integer dots divided by one sqrt — bitwise
    identical across engines."""
    score = "-(list_dot_product(vi, cv) / sqrt(list_dot_product(cv, cv)))"
    sql = f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * {scale})) AS vi
      FROM embeddings
    ),
    cents0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, vi AS cv
      FROM (SELECT vec_id, vi FROM corpus ORDER BY vec_id LIMIT {n_centroids})
    )"""
    for i in range(iterations):
        sql += f""",
    assign{i} AS MATERIALIZED (
      SELECT vec_id, c AS centroid FROM (
        SELECT corpus.vec_id, cents{i}.c,
               row_number() OVER (PARTITION BY corpus.vec_id
                 ORDER BY {score}, c) AS rn
        FROM corpus CROSS JOIN cents{i}) WHERE rn = 1
    ),
    cents{i + 1} AS MATERIALIZED (
      SELECT p.c, COALESCE(s.cv, p.cv) AS cv FROM cents{i} p LEFT JOIN (
        SELECT centroid AS c, list(sm ORDER BY j) AS cv FROM (
          SELECT a.centroid, t.j, SUM(corpus.vi[t.j + 1]) AS sm
          FROM assign{i} a JOIN corpus USING (vec_id), range({dim}) t(j)
          GROUP BY a.centroid, t.j
        ) GROUP BY centroid
      ) s ON s.c = p.c
    )"""
    fin = iterations
    sql += f""",
    assign_final AS MATERIALIZED (
      SELECT vec_id, c AS centroid FROM (
        SELECT corpus.vec_id, cents{fin}.c,
               row_number() OVER (PARTITION BY corpus.vec_id
                 ORDER BY {score}, c) AS rn
        FROM corpus CROSS JOIN cents{fin}) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, c AS centroid FROM (
        SELECT corpus.vec_id AS query_id, cents{fin}.c,
               row_number() OVER (PARTITION BY corpus.vec_id
                 ORDER BY {score}, c) AS rn
        FROM corpus CROSS JOIN cents{fin} WHERE corpus.vec_id < 10)
      WHERE rn <= {n_probe}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id
      FROM probes p JOIN assign_final a ON a.centroid = p.centroid
      WHERE a.vec_id <> p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.vec_id, list_cosine_similarity(q.v, e.v) AS sim
      FROM cand c JOIN corpus q ON q.vec_id = c.query_id
                  JOIN corpus e ON e.vec_id = c.vec_id
    )
    SELECT query_id, vec_id, round(sim, 9) AS sim, rank FROM (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM scored) WHERE rank <= {k}
    """
    return sql


@register("q_embedding_topk_ivf", oracle=_ivf_int_oracle(), category="llm_similarity")
def q_embedding_topk_ivf(spark, sf_dir):
    """IVF approximate top-k with a TRAINED coarse quantizer (3 Lloyd
    iterations) graded exactly: integer-unit vectors and sum-vector
    centroids make every assignment round bitwise-replayable by the
    unrolled-CTE oracle — no rows-only concession even for the trained
    index.  Recall vs brute force asserted in tests/test_llm.py."""
    emb = read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    out = S.cosine_topk_ivf_int(
        emb, queries, k=5, n_centroids=16, n_probe=4, iterations=3
    )
    return out.withColumn("sim", F.round("sim", 9))


@register(
    "q_embedding_topk_ivf_fixed",
    oracle="""
    WITH cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
    ),
    corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    assign AS (
      SELECT vec_id, c AS centroid FROM (
        SELECT corpus.vec_id, cents.c,
               row_number() OVER (PARTITION BY corpus.vec_id
                 ORDER BY -list_cosine_similarity(v, cv), cents.c) AS rn
        FROM corpus CROSS JOIN cents) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, c AS centroid FROM (
        SELECT q.vec_id AS query_id, cents.c,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY -list_cosine_similarity(q.v, cv), cents.c) AS rn
        FROM corpus q CROSS JOIN cents WHERE q.vec_id < 10) WHERE rn <= 4
    ),
    cand AS (
      SELECT p.query_id, a.vec_id,
             list_cosine_similarity(qc.v, cc.v) AS sim
      FROM probes p
        JOIN assign a ON a.centroid = p.centroid
        JOIN corpus qc ON qc.vec_id = p.query_id
        JOIN corpus cc ON cc.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, round(sim, 9) AS sim, rank FROM (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM cand
    ) WHERE rank <= 5
    """,
    category="llm_similarity",
)
def q_embedding_topk_ivf_fixed(spark, sf_dir):
    """IVF top-k with FIXED coarse centroids (the 8 lowest-id vectors,
    zero Lloyd iterations) — same probe/bucket machinery as the k-means
    variant but fully deterministic, so the whole ANN candidate path
    (assignment argmin, probe-4 selection, bucket join, per-query rank)
    gets an exact SQL oracle instead of a rows-only check."""
    emb = read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    out = S.cosine_topk_ivf(
        emb, queries, k=5, n_centroids=8, n_probe=4, iterations=0
    )
    return out.withColumn("sim", F.round("sim", 9))


@register(
    "q_line_dedup",
    oracle="""
    WITH docs(doc_id, text) AS (VALUES
      (1, 'HEADER' || chr(10) || 'alpha beta' || chr(10) || 'FOOTER'),
      (2, 'HEADER' || chr(10) || 'gamma delta' || chr(10) || 'FOOTER'),
      (3, 'HEADER' || chr(10) || 'alpha beta' || chr(10) || 'epsilon'),
      (4, 'HEADER' || chr(10) || 'FOOTER')
    ),
    lines AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
      FROM docs
    ),
    freq AS (SELECT line, count(*) AS n FROM lines GROUP BY line)
    SELECT l.doc_id,
           coalesce(string_agg(CASE WHEN f.n <= 1 THEN l.line END,
                               chr(10) ORDER BY l.pos), '') AS text,
           CAST(sum(CASE WHEN f.n <= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lines_kept,
           CAST(sum(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lines_dropped
    FROM lines l JOIN freq f ON l.line = f.line
    GROUP BY l.doc_id
    ORDER BY l.doc_id
    """,
    category="llm_dedup",
)
def q_line_dedup(spark, sf_dir):
    """Corpus-wide line-level dedup (pipeline brief: the C4/Gopher
    boilerplate-removal step — drop lines repeated across documents,
    reassemble in order; `llm/lines.py::line_dedup`).  The corpus is a
    fixed literal (the driver's synthetic documents are single-line), so
    both engines process identical multi-line inputs; 'alpha beta'
    repeats across docs 1 and 3 and is dropped like the HEADER/FOOTER
    chrome, doc 4 collapses to empty text."""
    from my_flink_1_10_2_spark.llm.lines import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "HEADER\nalpha beta\nFOOTER"),
            (2, "HEADER\ngamma delta\nFOOTER"),
            (3, "HEADER\nalpha beta\nepsilon"),
            (4, "HEADER\nFOOTER"),
        ],
        "doc_id int, text string",
    )
    return line_dedup(docs).orderBy("doc_id")


@register(
    "q_embedding_centroids",
    oracle="""
    WITH u AS (
      SELECT CAST(label AS BIGINT) AS label,
             unnest(range(len(embedding))) AS pos,
             unnest(list_transform(
               embedding, x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT))) AS u
      FROM embeddings
    )
    SELECT label, CAST(pos AS BIGINT) AS pos,
           round(sum(u) / count(*) / 1000000.0, 6) AS centroid
    FROM u GROUP BY label, pos ORDER BY label, pos
    """,
    category="llm_similarity",
)
def q_embedding_centroids(spark, sf_dir):
    """Per-label element-wise embedding centroids in long (label, pos,
    value) form — the k-means/IVF seeding primitive.

    Float discipline: elements are quantized to 1e-6 integer units
    *before* summing, so partial-aggregation order cannot wobble the
    mean (bigint sums are associative); both engines divide the exact
    integer sum once at the end.  100 TB shape: posexplode → one
    partially-aggregated shuffle of (label, pos) cells — O(labels x dim)
    groups regardless of row count."""
    emb = read(spark, sf_dir, "embeddings")
    units = emb.select(
        F.col("label").cast("bigint").alias("label"),
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> cast(round(cast(x as double) * 1000000) as bigint))"
            )
        ).alias("pos", "u"),
    )
    cent = units.groupBy("label", "pos").agg(
        F.sum("u").alias("su"), F.count("*").alias("n")
    )
    return cent.select(
        "label",
        F.col("pos").cast("bigint").alias("pos"),
        F.round(F.col("su") / F.col("n") / 1e6, 6).alias("centroid"),
    ).orderBy("label", "pos")


@register(
    "q_tfidf_top_terms",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, unnest(str_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM words WHERE term != '' GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / df) * 1000000)
                          AS BIGINT) AS score_i
      FROM tf, dfreq, n WHERE tf.term = dfreq.term
    ),
    ranked AS (
      SELECT doc_id, term, score_i,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_i DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, CAST(rk AS BIGINT) AS rk, term,
           round(score_i / 1000000.0, 6) AS tfidf
    FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
    """,
    category="llm_text",
)
def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document — the classic distributed
    keyword-extraction kernel (ref exposes the same shape through its
    WordCount/relational examples; this is the weighted variant a
    training-data pipeline uses for topic tagging).

    Float discipline: idf = ln(N/df) is computed once per distinct df
    and quantized to 1e-6 integer units; scores are exact bigint
    products, so ranking is reproducible across engines and partition
    orders.  100 TB shape: explode → (doc, term) partial-agg shuffle,
    vocab-sized df shuffle, then a per-doc top-k window — no global
    single-task stage."""
    docs = read(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.round(F.log(F.col("n").cast("double") / F.col("df")) * 1e6)
                .cast("bigint")
            ).alias("score_i"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("score_i").desc(), "term")
    )
    return (
        scored.withColumn("rk", rk)
        .where(F.col("rk") <= 3)
        .select(
            "doc_id",
            F.col("rk").cast("bigint").alias("rk"),
            "term",
            F.round(F.col("score_i") / 1e6, 6).alias("tfidf"),
        )
        .orderBy("doc_id", "rk")
    )


@register(
    "q_unigram_logprob",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, unnest(str_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ),
    tok AS (SELECT doc_id, term FROM words WHERE term != ''),
    vocab AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT sum(cnt) AS total FROM vocab),
    lp AS (
      SELECT term,
             CAST(round(ln(cnt / CAST(total AS DOUBLE)) * 1000000) AS BIGINT)
               AS lp_i
      FROM vocab, tot
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(sum(lp.lp_i) / count(*) / 1000000.0, 6) AS mean_logprob
    FROM tok t JOIN lp ON t.term = lp.term
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    category="llm_text",
)
def q_unigram_logprob(spark, sf_dir):
    """Unigram language-model score per document (CCNet-style
    perplexity-proxy quality filter): mean ln p(token) under the
    corpus's own unigram distribution — low scores flag gibberish /
    boilerplate for the cleaning funnel.

    Float discipline: ln p is quantized to 1e-6 integer units once per
    vocab entry; per-doc sums are exact bigint, divided once at the end.
    100 TB shape: tokenize scan → vocab partial-agg shuffle → token⋈vocab
    hash join (AQE broadcasts the vocab side only when genuinely small)
    → per-doc partial-agg shuffle.  No driver-side state, no global
    window."""
    docs = read(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    vocab = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(F.log(F.col("cnt") / F.col("total").cast("double")) * 1e6)
        .cast("bigint")
        .alias("lp_i"),
    )
    return (
        tok.join(lp, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("lp_i") / F.count("*") / 1e6, 6).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_chunk_documents",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      FROM documents),
    n AS (
      SELECT doc_id, toks,
             GREATEST(CAST(ceil((len(toks) - 16) / 48.0) AS INT), 1) AS n_chunks
      FROM t),
    c AS (
      SELECT doc_id, n_chunks, toks,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM n)
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           array_to_string(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text,
           CAST(len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS BIGINT) AS chunk_len
    FROM c
    """,
    category="llm",
)
def q_chunk_documents(spark, sf_dir):
    """Context-window chunking (64-token chunks, 16-token overlap):
    the prepare-for-pretraining / RAG-indexing explode.  Map-only —
    no shuffle, whole-stage codegen end to end; every token lands in
    >= 1 chunk, chunk k starts at 48*k.  Oracle replays the identical
    slice arithmetic with DuckDB list functions."""
    from my_flink_1_10_2_spark.llm.chunking import chunk_documents

    docs = read(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_documents(docs, chunk_tokens=64, overlap=16)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        "chunk_text",
        F.col("chunk_len").cast("bigint").alias("chunk_len"),
    )


@register(
    "q_text_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')) AS norm_text
    FROM documents WHERE doc_id % 4 = 0
    """,
    category="llm_text",
)
def q_text_normalize(spark, sf_dir):
    """Canonical text normalization for dedup keys: lowercase, strip
    non-alphanumerics, collapse runs of spaces, trim — the transform
    upstream of every fuzzy-dedup fingerprint.  Pure regexp_replace
    chain (JVM codegen, map-only); identical regexes replay in DuckDB."""
    docs = read(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select("doc_id", norm.alias("norm_text"))


@register(
    "q_provenance",
    oracle="""
    SELECT source, count(*) AS n_docs,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
    category="pipeline",
)
def q_provenance(spark, sf_dir):
    """Provenance rollup: per-source document counts, id ranges and
    volume — the audit table a training-data pipeline keeps so every
    example traces back to its origin (the `source` column is the
    fixture's provenance tag; at scale `input_file_name()` extends the
    same rollup to physical files)."""
    docs = read(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "q_embedding_normalize",
    oracle="""
    SELECT e.vec_id, d.i AS dim_idx,
           round(CAST(e.embedding[d.i] AS DOUBLE) / sqrt(list_sum(
             list_transform(e.embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 6)
             AS unit_val
    FROM embeddings e, generate_series(1, 4) AS d(i)
    WHERE e.vec_id % 10 = 0
    """,
    category="llm_similarity",
)
def q_embedding_normalize(spark, sf_dir):
    """L2-normalize embeddings and keep the leading 4 dims (the
    matryoshka-truncation serving trick: normalize on the FULL vector,
    then slice).  Pure array higher-order functions — JVM-side,
    map-only; both engines fold the square sum left-to-right over
    doubles, so 6-dp rounding is engine-exact.  Output is exploded to
    one scalar row per (vec_id, dim_idx): the driver's canonicalizer
    hashes pandas frames and cannot sort array-typed columns, so every
    registry query keeps a scalar-only top-level schema (gated in
    tests/test_registry_contract.py)."""
    emb = read(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x))
    head = F.transform(F.slice(dbl, 1, 4), lambda x: F.round(x / norm, 6))
    return emb.select("vec_id", F.posexplode(head).alias("pos", "unit_val")).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim_idx"),
        "unit_val",
    )


@register(
    "q_pipeline_normalize_dedup_chunk",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, source,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
      FROM documents),
    keep AS (
      SELECT doc_id, source, norm_text FROM (
        SELECT doc_id, source, norm_text,
               row_number() OVER (PARTITION BY md5(norm_text) ORDER BY doc_id) AS rn
        FROM norm) WHERE rn = 1),
    toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(norm_text, '\s+'), x -> x <> '') AS t
      FROM keep),
    chunks AS (
      SELECT source,
             unnest(generate_series(0, GREATEST(CAST(ceil((len(t) - 16) / 48.0) AS INT), 1) - 1)) AS cid,
             t
      FROM toks)
    SELECT source,
           count(*) AS n_chunks,
           CAST(sum(len(list_slice(t, cid * 48 + 1, cid * 48 + 64))) AS BIGINT) AS total_tokens
    FROM chunks GROUP BY source
    """,
    category="llm",
)
def q_pipeline_normalize_dedup_chunk(spark, sf_dir):
    """End-to-end mini pipeline composing three proven operators:
    normalize (regexp chain) -> exact dedup keep-first on the normalized
    text digest -> context-window chunking -> per-source chunk rollup.
    One digest shuffle + one source shuffle; everything between is
    map-only.  The oracle recomposes the same three SQL pieces."""
    from my_flink_1_10_2_spark.llm.chunking import chunk_documents
    from pyspark.sql import Window

    docs = read(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    normed = docs.select("doc_id", "source", norm.alias("norm_text"))
    w = Window.partitionBy(F.md5("norm_text")).orderBy("doc_id")
    keep = (
        normed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    chunks = chunk_documents(keep, text_col="norm_text", chunk_tokens=64, overlap=16)
    return chunks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").cast("bigint").alias("total_tokens"),
    )


@register(
    "q_fim_split",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      FROM documents WHERE doc_id % 6 = 0),
    cuts AS (
      SELECT doc_id, toks, len(toks) AS n_tokens,
             (('0x' || substr(md5('fim1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
               % (len(toks) + 1) AS p1
      FROM t),
    cuts2 AS (
      SELECT doc_id, toks, n_tokens, p1,
             p1 + (('0x' || substr(md5('fim2:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
               % (n_tokens - p1 + 1) AS p2
      FROM cuts)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
           COALESCE(array_to_string(list_slice(toks, 1, p1), ' '), '') AS prefix,
           COALESCE(array_to_string(list_slice(toks, p1 + 1, p2), ' '), '') AS middle,
           COALESCE(array_to_string(list_slice(toks, p2 + 1, n_tokens), ' '), '') AS suffix
    FROM cuts2
    """,
    category="llm",
)
def q_fim_split(spark, sf_dir):
    """Fill-in-the-middle (PSM) split with deterministic salted-md5 cut
    points (0 <= p1 <= p2 <= n) — the code-pretraining transform,
    map-only and retry-stable; the oracle replays the identical modulo
    arithmetic and list slices."""
    from my_flink_1_10_2_spark.llm.chunking import fim_split

    docs = read(spark, sf_dir, "documents").where(F.col("doc_id") % 6 == 0)
    return fim_split(docs.select("doc_id", "text"))


@register(
    "q_bigram_backoff_score",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c_w
      FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
    tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS tt FROM uni),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      FROM tok WHERE len(t) >= 2),
    ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_ctx FROM bg GROUP BY w1),
    bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY w1, w2),
    lp AS (
      SELECT bgc.w1, bgc.w2,
             CAST(round(ln(0.75 * (CAST(c_bg AS DOUBLE) / c_ctx)
                           + 0.25 * (CAST(c_w AS DOUBLE) / (SELECT tt FROM tot))) * 1000000)
                  AS BIGINT) AS lp_i
      FROM bgc JOIN ctx ON ctx.w1 = bgc.w1 JOIN uni ON uni.w = bgc.w2)
    SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(lp_i) AS DOUBLE) / (count(*) * 1000000.0), 6) AS score
    FROM bg JOIN lp ON lp.w1 = bg.w1 AND lp.w2 = bg.w2
    WHERE bg.doc_id % 5 = 0
    GROUP BY bg.doc_id
    """,
    category="llm_text",
)
def q_bigram_backoff_score(spark, sf_dir):
    """Bigram language-model quality score with interpolated unigram
    backoff (0.75·P(w2|w1) + 0.25·P(w2)) — the CCNet-style perplexity
    filter one model-order up from q_unigram_logprob.  The model trains
    on the FULL corpus; every 5th doc is scored.

    Float discipline: each (w1,w2) log-prob quantizes once to 1e-6
    integer units (identical IEEE expression of exact integer counts on
    both engines); per-doc sums are exact bigints, divided once.
    100 TB shape: two token-granularity aggregates (bigram, unigram,
    both partially aggregated map-side), one hash join back to the
    bigram stream, one per-doc aggregate — no driver state, no windows.
    """
    docs = read(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    tok = docs.select("doc_id", toks.alias("t"))
    # vocabulary-bounded model table, lazily checkpointed so the total
    # and the scoring join reuse one unigram corpus pass
    uni = (
        tok.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
        .localCheckpoint(eager=False)
    )
    tot = uni.agg(F.sum("c_w").cast("bigint").alias("tt"))
    pair_idx = F.sequence(F.lit(0), F.size("t") - 2)
    bg = (
        tok.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # bigram-type table checkpointed once (vocabulary²-bounded); the
    # context counts derive from it (sum of bigram-type counts per w1 ==
    # count of bigram instances per w1, exact integers) instead of
    # re-exploding the corpus a third time
    bgc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .localCheckpoint(eager=False)
    )
    ctx = bgc.groupBy("w1").agg(F.sum("c_bg").cast("bigint").alias("c_ctx"))
    from my_flink_1_10_2_spark.operators.hints import dim

    lp = (
        bgc.join(ctx, "w1")
        .join(uni, bgc.w2 == uni.w)
        .join(dim(tot))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    F.lit(0.75) * (F.col("c_bg").cast("double") / F.col("c_ctx"))
                    + F.lit(0.25) * (F.col("c_w").cast("double") / F.col("tt"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lp_i"),
        )
    )
    scored = bg.where(F.col("doc_id") % 5 == 0).join(lp, ["w1", "w2"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum("lp_i").cast("double") / (F.count(F.lit(1)) * F.lit(1e6)), 6
        ).alias("score"),
    )


@register(
    "q_lsh_quality_report",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                        i -> array_to_string(words[i:i+2], ' '))) AS shingle
           FROM w),
    sig AS (SELECT doc_id, {', '.join(_minhash_mins(16))} FROM sh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b,
             CASE b
               {' '.join(f"WHEN {b} THEN array_to_string([h{4*b}, h{4*b+1}, h{4*b+2}, h{4*b+3}], ',')" for b in range(4))}
             END AS band_key,
             [{', '.join(f'h{i}' for i in range(16))}] AS sig
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2, a.sig AS sig1, b.sig AS sig2
      FROM banded a JOIN banded b ON a.b = b.b AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    ),
    est AS (
      SELECT doc1, doc2,
             len(list_filter(range(1, 17), i -> sig1[i] = sig2[i])) / 16.0 AS est_jaccard
      FROM cand),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter_sz
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT est.doc1, est.doc2,
           round(est_jaccard, 6) AS est_j,
           round(COALESCE(inter_sz / (s1.sz + s2.sz - inter_sz), 0.0), 6) AS exact_j,
           round(abs(est_jaccard
                     - COALESCE(inter_sz / (s1.sz + s2.sz - inter_sz), 0.0)), 6) AS abs_err
    FROM est
    LEFT JOIN inter ON inter.doc1 = est.doc1 AND inter.doc2 = est.doc2
    JOIN sizes s1 ON s1.doc_id = est.doc1
    JOIN sizes s2 ON s2.doc_id = est.doc2
    """,
    category="llm_dedup",
)
def q_lsh_quality_report(spark, sf_dir):
    """LSH tuning diagnostic: for every MinHash band-bucket candidate
    pair, the signature-estimated Jaccard next to the EXACT n-gram
    Jaccard and the absolute error — the report that tells you whether
    (num_hashes, bands) is calibrated before running a 100 TB dedup.
    Exact similarity is computed only for the O(collisions) candidate
    set, never all pairs."""
    docs = read(spark, sf_dir, "documents")
    cand = D.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.0)
    exact = D.ngram_jaccard_pairs(docs, threshold=0.0).select(
        "doc1", "doc2", F.col("jaccard").alias("__exact")
    )
    return (
        cand.join(exact, ["doc1", "doc2"], "left")
        .select(
            "doc1",
            "doc2",
            F.round("est_jaccard", 6).alias("est_j"),
            F.round(F.coalesce("__exact", F.lit(0.0)), 6).alias("exact_j"),
            F.round(
                F.abs(F.col("est_jaccard") - F.coalesce("__exact", F.lit(0.0))), 6
            ).alias("abs_err"),
        )
    )


@register(
    "q_dedup_funnel_report",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                        i -> array_to_string(words[i:i+2], ' '))) AS shingle
           FROM w),
    sig AS (SELECT doc_id, {', '.join(_minhash_mins(16))} FROM sh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b,
             CASE b
               {' '.join(f"WHEN {b} THEN array_to_string([h{4*b}, h{4*b+1}, h{4*b+2}, h{4*b+3}], ',')" for b in range(4))}
             END AS band_key,
             [{', '.join(f'h{i}' for i in range(16))}] AS sig
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM banded a JOIN banded b ON a.b = b.b AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_raw,
           (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) FROM documents) AS n_exact_unique,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_neardup_candidates
    """,
    category="llm_dedup",
)
def q_dedup_funnel_report(spark, sf_dir):
    """Dedup funnel report — the one-row audit a corpus pipeline logs
    per run: raw docs, exact-unique docs (text digest), and MinHash-LSH
    near-dup candidate pairs.  Composes the proven exact-dedup and LSH
    stages; three bounded aggregates, nothing driver-side."""
    docs = read(spark, sf_dir, "documents")
    n_raw = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_raw"))
    n_exact = docs.agg(
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_exact_unique")
    )
    n_cand = (
        D.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.0)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_neardup_candidates"))
    )
    return n_raw.join(n_exact).join(n_cand)


@register(
    "q_langid_confusion",
    oracle=f"""
    SELECT lang AS labeled, {_lang_case_sql()} AS predicted,
           CAST(count(*) AS BIGINT) AS n
    FROM documents
    GROUP BY 1, 2
    """,
    category="llm_text",
)
def q_langid_confusion(spark, sf_dir):
    """Classifier evaluation as a data op: the confusion matrix of the
    stopword-profile language-ID heuristic against the labeled `lang`
    column — the quality report every heuristic filter ships with.
    One rollup over the scored scan."""
    docs = read(spark, sf_dir, "documents")
    return (
        docs.select(F.col("lang").alias("labeled"), T.lang_id("text").alias("predicted"))
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "q_length_percentiles_disc",
    oracle="""
    SELECT source,
           CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
           CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS p95,
           CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY source
    """,
    category="llm_text",
)
def q_length_percentiles_disc(spark, sf_dir):
    """Exact DISCRETE per-source length percentiles (the cut-off picker
    for length filters — a percentile that IS an observed value, unlike
    the interpolated PERCENTILE_CONT).  Engine formulation: per-source
    value counts, cumulative sums over the (source-partitioned, bounded)
    distinct-length relation, smallest value whose cumulative count
    reaches ceil(p*n) — no approximate sketch, no full sort of the raw
    rows."""
    from pyspark.sql import Window

    docs = read(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source").orderBy("n_chars")
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("source"))
    )

    def disc(p):
        target = F.ceil(F.lit(p) * F.col("n"))
        return F.min(F.when(F.col("cum") >= target, F.col("n_chars")))

    return cum.groupBy("source").agg(
        disc(0.5).cast("bigint").alias("p50"),
        disc(0.95).cast("bigint").alias("p95"),
        F.max("n").cast("bigint").alias("n"),
    )


@register(
    "q_dedup_threshold_curve",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                        i -> array_to_string(words[i:i+2], ' '))) AS shingle
           FROM w),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter_sz
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT inter_sz * 1.0 / (s1.sz + s2.sz - inter_sz) AS j
      FROM inter JOIN sizes s1 ON s1.doc_id = doc1 JOIN sizes s2 ON s2.doc_id = doc2)
    SELECT t, CAST(count(*) FILTER (WHERE j >= t) AS BIGINT) AS n_pairs
    FROM jac, (SELECT unnest([0.2, 0.4, 0.6, 0.8]) AS t)
    GROUP BY t
    """,
    category="llm_dedup",
)
def q_dedup_threshold_curve(spark, sf_dir):
    """Threshold-tuning curve for fuzzy dedup: how many near-dup pairs
    survive at Jaccard >= t for t in {{0.2, 0.4, 0.6, 0.8}} — the
    pick-the-knob report run before committing a corpus-wide dedup.
    One shingle self-join; the 4 thresholds ride a tiny literal
    cross-join, not 4 scans."""
    docs = read(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.0).select("jaccard")
    ts = spark.createDataFrame([(0.2,), (0.4,), (0.6,), (0.8,)], "t double")
    return (
        pairs.crossJoin(F.broadcast(ts))
        .groupBy("t")
        .agg(
            F.count(F.when(F.col("jaccard") >= F.col("t"), 1))
            .cast("bigint")
            .alias("n_pairs")
        )
    )


def _bpe_oracle(num_merges: int = 12) -> str:
    """Unrolled-CTE replay of BPE training (llm/bpe.py): every merge
    step is a pair-count aggregate + deterministic argmax + one literal
    separator-framed string replace — SQL replays the identical merge
    table because greedy left-to-right non-overlapping replace IS the
    BPE merge order on both engines."""
    sep = "chr(31)"
    ss = "chr(31)||chr(31)"
    sql = f"""
    WITH words AS MATERIALIZED (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  w -> w <> '')) AS word
        FROM documents
      ) GROUP BY word
    ),
    w0 AS MATERIALIZED (
      SELECT word, freq,
             {sep} || array_to_string(
               list_append(list_filter(str_split(word, ''), c -> c <> ''), '</w>'),
               {ss}) || {sep} AS seq
      FROM words
    )"""
    for i in range(1, num_merges + 1):
        prev = f"w{i - 1}"
        sql += f""",
    p{i} AS (
      SELECT pr.l_sym AS l_sym, pr.r_sym AS r_sym, sum(freq) AS cnt FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(syms)), j ->
                 struct_pack(l_sym := syms[j], r_sym := syms[j + 1]))) AS pr
        FROM (SELECT freq,
                     str_split(substr(seq, 2, length(seq) - 2), {ss}) AS syms
              FROM {prev})
      ) GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (
      SELECT l_sym, r_sym, cnt FROM p{i}
      ORDER BY cnt DESC, l_sym, r_sym LIMIT 1
    ),
    w{i} AS MATERIALIZED (
      SELECT word, freq,
             replace(seq, {sep}||l_sym||{ss}||r_sym||{sep},
                          {sep}||l_sym||r_sym||{sep}) AS seq
      FROM {prev}, b{i}
    )"""
    finals = "\n      UNION ALL ".join(
        f"SELECT {i} AS step, l_sym, r_sym, l_sym||r_sym AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, num_merges + 1)
    )
    return sql + f"\n    SELECT * FROM ({finals})"


@register("q_bpe_vocab", oracle=_bpe_oracle(12), category="llm_text")
def q_bpe_vocab(spark, sf_dir):
    """Distributed BPE vocabulary training (Sennrich et al. 1508.07909;
    the learn-the-tokenizer counterpart of q_token_count): 12 merges
    over the word-frequency table.  Each step is one partial-agg pair
    count + a global top-1 + a map-side literal replace — only the
    winning pair crosses to the driver, and the training table is
    vocabulary-sized, so the same plan holds on a 100 TB corpus."""
    from my_flink_1_10_2_spark.llm.bpe import train_bpe

    return train_bpe(read(spark, sf_dir, "documents"), num_merges=12)


def _semantic_neardup_oracle(
    n_centroids: int = 8, threshold: float = 0.35, scale: int = 1000
) -> str:
    """Replay of IVF-blocked near-dup: the fixed-centroid integer-exact
    assignment (same arithmetic as the _ivf_int_oracle CTEs with zero
    Lloyd iterations), within-bucket pairs, exact-cosine threshold."""
    score = "-(list_dot_product(vi, cv) / sqrt(list_dot_product(cv, cv)))"
    return f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * {scale})) AS vi
      FROM embeddings
    ),
    cents AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, vi AS cv
      FROM (SELECT vec_id, vi FROM corpus ORDER BY vec_id LIMIT {n_centroids})
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, c AS centroid FROM (
        SELECT corpus.vec_id, cents.c,
               row_number() OVER (PARTITION BY corpus.vec_id
                 ORDER BY {score}, c) AS rn
        FROM corpus CROSS JOIN cents) WHERE rn = 1
    )
    SELECT a.vec_id AS src, b.vec_id AS dst, a.centroid,
           round(list_cosine_similarity(va.v, vb.v), 9) AS cosine
    FROM assign a
      JOIN assign b ON a.centroid = b.centroid AND a.vec_id < b.vec_id
      JOIN corpus va ON va.vec_id = a.vec_id
      JOIN corpus vb ON vb.vec_id = b.vec_id
    WHERE list_cosine_similarity(va.v, vb.v) >= {threshold}
    """


@register(
    "q_semantic_neardup_ivf",
    oracle=_semantic_neardup_oracle(),
    category="llm_dedup",
)
def q_semantic_neardup_ivf(spark, sf_dir):
    """Semantic near-dup detection with IVF blocking — the scale path
    for embedding-cosine dedup (candidate pairs only within a coarse
    cluster: sum-of-bucket² arithmetic instead of n², one shuffle on
    centroid).  The integer-exact quantizer makes the blocked selection
    engine-independent, so the whole pipeline grades exactly; recall vs
    the exact all-pairs operator is asserted in tests/test_llm.py."""
    from my_flink_1_10_2_spark.llm.dedup import semantic_neardup_pairs_ivf

    out = semantic_neardup_pairs_ivf(
        read(spark, sf_dir, "embeddings"), threshold=0.35, n_centroids=8
    )
    return out.withColumn("cosine", F.round("cosine", 9))


def _bpe_pieces_oracle(num_merges: int = 12, topk: int = 20) -> str:
    """Oracle for the ENCODE path: replay training (same CTEs as
    _bpe_oracle), then the final symbol sequences ARE the segmentation —
    piece frequencies weighted by word frequency, top-k."""
    base = _bpe_oracle(num_merges)
    # strip the merge-table SELECT tail; keep the CTE chain
    ctes = base[: base.rindex("\n    SELECT * FROM (")]
    ss = "chr(31)||chr(31)"
    return f"""{ctes},
    pieces AS (
      SELECT unnest(str_split(substr(seq, 2, length(seq) - 2), {ss})) AS piece,
             freq
      FROM w{num_merges}
    )
    SELECT piece, CAST(sum(freq) AS BIGINT) AS n_uses,
           CAST(row_number() OVER (ORDER BY sum(freq) DESC, piece) AS BIGINT) AS rnk
    FROM pieces GROUP BY piece
    ORDER BY rnk LIMIT {topk}
    """


@register("q_bpe_corpus_tokens", oracle=_bpe_pieces_oracle(), category="llm_text")
def q_bpe_corpus_tokens(spark, sf_dir):
    """BPE ENCODE path graded end to end: train 12 merges, then segment
    the corpus with the learned rules (map-only literal-replace chain,
    whole-stage codegen) and rank the top-20 vocabulary pieces by
    corpus usage.  Train + encode on the word-frequency relation — the
    tokenizer-application shape a 100 TB corpus pass would use."""
    from my_flink_1_10_2_spark.llm.bpe import (
        bpe_segment,
        train_bpe,
        word_frequencies,
    )

    docs = read(spark, sf_dir, "documents")
    rules = [
        (r["l_sym"], r["r_sym"])
        for r in train_bpe(docs, num_merges=12).collect()
    ]
    wf = word_frequencies(docs)
    pieces = bpe_segment(wf, "word", rules).select(
        F.explode("pieces").alias("piece"), "freq"
    )
    agg = pieces.groupBy("piece").agg(F.sum("freq").cast("bigint").alias("n_uses"))
    from my_flink_1_10_2_spark.operators.rank import global_rank

    ranked = global_rank(agg, [F.desc("n_uses"), F.asc("piece")], rank_col="rnk")
    return (
        ranked.where(F.col("rnk") <= 20)
        .select("piece", "n_uses", F.col("rnk").cast("bigint").alias("rnk"))
        .orderBy("rnk")
    )


@register(
    "q_dup_ngram_fraction",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, str_split_regex(text, '\s+') AS words FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words)-7, 0)+1),
                                   i -> array_to_string(words[i:i+7], ' '))) AS g
      FROM w
    ),
    spread AS (
      SELECT g, count(DISTINCT doc_id) AS docs FROM grams GROUP BY g
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(CASE WHEN s.docs >= 2 THEN 1 END) AS BIGINT) AS n_dup,
           CAST(count(CASE WHEN s.docs >= 2 THEN 1 END) * 1000000
                // count(*) AS BIGINT) AS dup_frac_e6
    FROM grams JOIN spread s USING (g)
    GROUP BY doc_id
    """,
    category="llm_text",
)
def q_dup_ngram_fraction(spark, sf_dir):
    """Duplicate 8-gram fraction per document (the Gopher repetition /
    C4 boilerplate quality signal at n-gram granularity): the share of
    gram positions whose gram also appears in another document.  Two
    keyed shuffles (gram spread, per-doc rollup), exact integer 1e-6
    units for the fraction."""
    from my_flink_1_10_2_spark.llm.text import dup_ngram_stats

    out = dup_ngram_stats(read(spark, sf_dir, "documents"), n=8)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_dup").cast("bigint").alias("n_dup"),
        "dup_frac_e6",
    )


@register(
    "q_embedding_topk_pq",
    oracle="""
    WITH corpus AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS vi
      FROM embeddings
    ),
    subs AS (SELECT unnest(range(0,4)) AS i),
    cb AS (
      SELECT subs.i, b.c,
             list_slice(b.vi, CAST(subs.i*16+1 AS BIGINT),
                        CAST(subs.i*16+16 AS BIGINT)) AS cv
      FROM (SELECT row_number() OVER (ORDER BY vec_id)-1 AS c, vi
            FROM (SELECT vec_id, vi FROM corpus ORDER BY vec_id LIMIT 16)) b
      CROSS JOIN subs
    ),
    dist AS (
      SELECT corpus.vec_id, cb.i, cb.c,
             CAST(list_sum(list_transform(range(1,17),
               j -> (list_extract(vi, CAST(cb.i*16+j AS BIGINT))
                      - list_extract(cv, j))
                  * (list_extract(vi, CAST(cb.i*16+j AS BIGINT))
                      - list_extract(cv, j)))) AS BIGINT) AS d
      FROM corpus CROSS JOIN cb
    ),
    codes AS (
      SELECT vec_id, i, c AS code FROM (
        SELECT vec_id, i, c,
               row_number() OVER (PARTITION BY vec_id, i ORDER BY d, c) AS rn
        FROM dist) WHERE rn = 1
    ),
    adc AS (
      SELECT q.vec_id AS query_id, e.vec_id, CAST(sum(q.d) AS BIGINT) AS adist
      FROM dist q JOIN codes e ON e.i = q.i AND e.code = q.c
      WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id, adist, rank FROM (
      SELECT query_id, vec_id, adist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adist, vec_id) AS rank
      FROM adc) WHERE rank <= 5
    """,
    category="llm_similarity",
)
def q_embedding_topk_pq(spark, sf_dir):
    """Product-quantization ADC top-k (`llm/pq.py`) — the third ANN
    family next to LSH and IVF, and the storage-side one: the corpus is
    scanned as m=4 one-byte codes instead of 64 floats (16x smaller at
    100 TB) and each query-candidate distance is m table lookups.
    Codebooks are the deterministic data-derived kind (subvectors of the
    16 lowest-id vectors, integer units), so every sub-distance, argmin
    code and ADC sum is exact BIGINT arithmetic — the oracle replays the
    ENTIRE index (encode + distance tables + ranking) bitwise, not a
    recall bound."""
    from my_flink_1_10_2_spark.llm.pq import pq_topk_adc

    emb = read(spark, sf_dir, "embeddings")
    return pq_topk_adc(emb, emb.filter("vec_id < 10"), k=5, m=4, ksub=16)


_BM25_SCORED_CTE = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(str_split_regex(lower(text), '\s+'),
                                t -> t != '')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('hash','merge','window') GROUP BY 1,2),
    stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                     (SELECT sum(dl) FROM dl) AS dl_sum),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dl.dl,
        (ln((CAST(n AS DOUBLE) - df + 0.5)/(df + 0.5) + 1.0)
          * (CAST(tf AS DOUBLE) * 2.2))
        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE))
            / (CAST(dl_sum AS DOUBLE) / CAST(n AS DOUBLE)))) AS score
      FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
    )
"""


@register(
    "q_bm25_term_scores",
    oracle=_BM25_SCORED_CTE
    + """
    SELECT doc_id, term, tf, dl, score,
           CAST(round(score * 1000000.0) AS BIGINT) AS score_e6
    FROM scored
    """,
    category="llm_text",
)
def q_bm25_term_scores(spark, sf_dir):
    """Okapi BM25 per-(document, term) scores (`llm/ranking.py`) for the
    query {hash, merge, window} — k1=1.2 length-saturated tf, b=0.75
    length normalization against corpus avgdl.  The raw DOUBLE score is
    graded bitwise: tf/df/dl/N are exact grouped counts, avgdl is one
    IEEE division, and idf's ln runs through libm (Arrow UDF over the
    3-row per-term df relation) which matches DuckDB's ln bit-for-bit —
    the JVM log intrinsic differs by 1 ulp on ~7% of inputs, so the
    engine-side F.log is deliberately NOT in this plan."""
    from my_flink_1_10_2_spark.llm.ranking import bm25_term_scores

    return bm25_term_scores(
        read(spark, sf_dir, "documents"), ["hash", "merge", "window"]
    )


@register(
    "q_bm25_ranking",
    oracle=_BM25_SCORED_CTE
    + """
    , totals AS (
      SELECT doc_id, max(dl) AS dl, count(*) AS n_terms_hit,
             CAST(sum(CAST(round(score * 1000000.0) AS BIGINT)) AS BIGINT)
               AS score_e6
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, dl, CAST(n_terms_hit AS BIGINT) AS n_terms_hit,
           score_e6, rank FROM (
      SELECT *, row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rank
      FROM totals) WHERE rank <= 10
    """,
    category="llm_text",
)
def q_bm25_ranking(spark, sf_dir):
    """Top-10 documents by total BM25 for {hash, merge, window}: term
    scores quantized to exact 1e-6 integer units BEFORE the per-doc sum,
    so the total is order-independent BIGINT arithmetic and the ranking
    replays exactly.  Plan: one corpus shuffle on (doc, term), broadcast
    df/idf + corpus stats, TakeOrderedAndProject for the global top-k —
    no single-task window touches the corpus-sized relation."""
    from my_flink_1_10_2_spark.llm.ranking import bm25_rank

    return bm25_rank(read(spark, sf_dir, "documents"), ["hash", "merge", "window"], k=10)


@register(
    "q_gopher_quality",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(str_split_regex(text, '\s+'), t -> t != '') AS words,
             str_split(text, chr(10)) AS lines,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             CAST((length(text) - length(replace(text, '...', ''))) / 3
                  AS BIGINT) AS n_dots,
             length(text) - length(replace(text, '…', '')) AS n_uellip
      FROM documents
    ),
    stats AS (
      SELECT doc_id,
        CAST(len(words) AS BIGINT) AS n_words,
        CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0)
             AS BIGINT) AS n_word_chars,
        CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
             AS BIGINT) AS n_alpha_words,
        CAST(n_hash + n_dots + n_uellip AS BIGINT) AS n_symbols,
        CAST(len(lines) AS BIGINT) AS n_lines,
        CAST(len(list_filter(lines, l -> starts_with(l, '•')
              OR starts_with(l, '- ') OR starts_with(l, '* ')))
             AS BIGINT) AS n_bullet_lines,
        CAST(len(list_filter(lines, l -> ends_with(l, '...')
              OR ends_with(l, '…'))) AS BIGINT) AS n_ellipsis_lines,
        CAST((CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'the') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'be') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'to') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'of') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'and') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'that') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'have') THEN 1 ELSE 0 END)
           + (CASE WHEN list_contains(list_transform(words, w -> lower(w)), 'with') THEN 1 ELSE 0 END)
             AS BIGINT) AS n_stop_hits
      FROM base
    )
    SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_symbols, n_lines,
           n_bullet_lines, n_ellipsis_lines, n_stop_hits,
           CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS INT) AS flag_word_count,
           CAST(CASE WHEN 3*n_words <= n_word_chars AND n_word_chars <= 10*n_words THEN 1 ELSE 0 END AS INT) AS flag_mean_word_len,
           CAST(CASE WHEN 10*n_symbols <= n_words THEN 1 ELSE 0 END AS INT) AS flag_symbol_ratio,
           CAST(CASE WHEN 10*n_bullet_lines <= 9*n_lines THEN 1 ELSE 0 END AS INT) AS flag_bullet_lines,
           CAST(CASE WHEN 10*n_ellipsis_lines <= 3*n_lines THEN 1 ELSE 0 END AS INT) AS flag_ellipsis_lines,
           CAST(CASE WHEN 5*n_alpha_words >= 4*n_words THEN 1 ELSE 0 END AS INT) AS flag_alpha_words,
           CAST(CASE WHEN n_stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS flag_stopwords,
           CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                      AND 3*n_words <= n_word_chars AND n_word_chars <= 10*n_words
                      AND 10*n_symbols <= n_words
                      AND 10*n_bullet_lines <= 9*n_lines
                      AND 10*n_ellipsis_lines <= 3*n_lines
                      AND 5*n_alpha_words >= 4*n_words
                      AND n_stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS passes_gopher
    FROM stats
    """,
    category="llm_text",
)
def q_gopher_quality(spark, sf_dir):
    """Gopher §A1.1 quality rule set (`llm/text.py::gopher_flags`) over
    the documents table: word-count bounds, mean-word-length window,
    symbol/bullet/ellipsis ratios, alpha-word fraction and required
    stopwords — every threshold cross-multiplied to exact BIGINT
    comparisons (no float ratios), so each per-rule flag and the
    conjunctive verdict replay bitwise.  One projection, zero shuffles,
    whole-stage codegen."""
    from my_flink_1_10_2_spark.llm.text import gopher_flags

    return gopher_flags(read(spark, sf_dir, "documents")).drop(
        "text", "lang", "source", "n_chars"
    )


def _pca_oracle(iterations: int = 12, dim: int = 64) -> str:
    """Unrolled power-iteration oracle replicating `llm/pca.py` exactly:
    HUGEINT Gram/covariance/mat-vec (exact), correctly-rounded
    HUGEINT→DOUBLE conversions, the same (w/max|w|)*1e6 +
    sign·floor(|x|+0.5) re-quantization each round, first-nonzero sign
    fix, exact BIGINT projections."""
    requant = """
    q{t} AS (SELECT max(abs(CAST(w AS DOUBLE))) AS q FROM w{t}),
    v{t} AS MATERIALIZED (
      SELECT i, CAST(CASE WHEN q = 0 THEN 0
        WHEN CAST(w AS DOUBLE) < 0
          THEN -floor(abs((CAST(w AS DOUBLE) / q) * 1000000.0) + 0.5)
        ELSE floor(abs((CAST(w AS DOUBLE) / q) * 1000000.0) + 0.5)
        END AS HUGEINT) AS v
      FROM w{t} CROSS JOIN q{t})"""
    its = []
    prev = "v0"
    for t in range(1, iterations + 1):
        its.append(
            f"""
    w{t} AS MATERIALIZED (SELECT c.i, CAST(sum(cc * v.v) AS HUGEINT) AS w
             FROM c JOIN {prev} v ON v.i = c.j GROUP BY 1),"""
            + requant.format(t=t)
        )
        prev = f"v{t}"
    return (
        f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS vi
      FROM embeddings
    ),
    idx AS (SELECT unnest(range(0,{dim})) AS i),
    pairs AS (SELECT a.i AS i, b.i AS j FROM idx a, idx b),
    sm AS (
      SELECT p.i, p.j,
             CAST(sum(CAST(list_extract(vi, CAST(p.i+1 AS BIGINT)) AS HUGEINT)
                      * list_extract(vi, CAST(p.j+1 AS BIGINT))) AS HUGEINT) AS s
      FROM corpus, pairs p GROUP BY 1, 2
    ),
    mm AS (SELECT i.i,
                  CAST(sum(list_extract(vi, CAST(i.i+1 AS BIGINT))) AS HUGEINT) AS m
           FROM corpus, idx i GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM corpus),
    c AS MATERIALIZED (
      SELECT sm.i, sm.j, (n * s - ma.m * mb.m) AS cc
      FROM sm JOIN mm ma ON ma.i = sm.i JOIN mm mb ON mb.i = sm.j CROSS JOIN nn
    ),
    v0 AS (SELECT i, CAST(1 AS HUGEINT) AS v FROM idx),"""
        + ",".join(its)
        + f""",
    sgn AS (SELECT CASE WHEN (SELECT v FROM {prev} WHERE v <> 0
                              ORDER BY i LIMIT 1) < 0
                        THEN -1 ELSE 1 END AS sg),
    comp AS (SELECT i, v * sg AS e FROM {prev} CROSS JOIN sgn)
    SELECT vec_id,
           CAST(sum(CAST(list_extract(vi, CAST(comp.i+1 AS BIGINT)) AS HUGEINT)
                    * comp.e) AS BIGINT) AS proj
    FROM corpus, comp GROUP BY 1
    """
    )


@register("q_pca_projection", oracle=_pca_oracle(), category="llm_similarity")
def q_pca_projection(spark, sf_dir):
    """Distributed PCA (`llm/pca.py`): project every embedding onto the
    top principal component.  One Arrow pass computes the integer Gram
    matrix as partition-local int64 matmul partials (shuffle =
    partitions x dim^2, never the data); the dim x dim covariance is
    O(dim^2) driver metadata (like the IVF centroid list) where an
    exact-integer power iteration with an engine-portable
    re-quantization protocol runs 12 rounds; projections are exact
    BIGINT dot products.  (Convergence rate is the method's (l2/l1)^t —
    near 1 on this isotropic fixture — so what is graded here is the
    deterministic factorization protocol; convergence quality is tested
    on a planted-spectrum corpus in tests/test_pca.py.)  The oracle replays the ENTIRE factorization —
    Gram, covariance, all 12 iterations, sign fix, projections —
    bitwise."""
    from my_flink_1_10_2_spark.llm.pca import pca_project, pca_top_component

    emb = read(spark, sf_dir, "embeddings")
    comp = pca_top_component(emb, iterations=12)
    return pca_project(emb, comp)


@register(
    "q_feature_hash",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(list_filter(str_split_regex(lower(text), '\s+'),
                                  t -> t != '')) AS w
        FROM documents)
    ),
    hashed AS (
      SELECT doc_id,
             ('0x' || substr(md5('fh|0|' || w), 1, 15))::BIGINT % 64 AS b,
             CASE WHEN ('0x' || substr(md5('fh|0|' || w), 1, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM words
    ),
    sparse AS (SELECT doc_id, b, CAST(sum(s) AS BIGINT) AS v
               FROM hashed GROUP BY 1, 2),
    dense AS (
      SELECT d.doc_id, i.i, coalesce(s.v, 0) AS v
      FROM (SELECT DISTINCT doc_id FROM documents) d
      CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
      LEFT JOIN sparse s ON s.doc_id = d.doc_id AND s.b = i.i
    )
    SELECT doc_id, string_agg(v, ',' ORDER BY i) AS fh
    FROM dense GROUP BY doc_id
    """,
    category="llm_text",
)
def q_feature_hash(spark, sf_dir):
    """Hashing-trick text vectorization (`llm/text.py::feature_hash`):
    64-bucket signed md5 feature vectors per document — vocabulary-free
    featurization for corpora too large to build a vocab over.  Explode
    → one (doc, bucket)-keyed partial-agg shuffle → dense assembly from
    the per-doc sparse map; every count is exact BIGINT and the md5
    bucketing replays identically in SQL, so the full dense vector is
    graded bitwise.  (Serialized to a canonical comma-joined string for
    grading — the driver's value hash is only specified for scalar
    columns.)"""
    from my_flink_1_10_2_spark.llm.text import feature_hash

    out = feature_hash(read(spark, sf_dir, "documents"), num_features=64)
    return out.select(
        "doc_id",
        F.array_join(F.transform("fh", lambda x: x.cast("string")), ",").alias("fh"),
    )


@register(
    "q_embedding_standardize",
    oracle="""
    WITH longf AS (
      SELECT vec_id, i - 1 AS i,
             CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000)
                  AS BIGINT) AS v
      FROM embeddings,
           (SELECT unnest(range(1, 65)) AS i)
    ),
    stats AS (
      SELECT i, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS m,
             CAST(sum(v * v) AS BIGINT) AS ss
      FROM longf GROUP BY i
    )
    SELECT l.vec_id, l.i,
           CASE WHEN sqrt(CAST(s.n * s.ss - s.m * s.m AS DOUBLE)
                          / CAST(s.n * s.n AS DOUBLE)) <> 0.0
                THEN (CAST(l.v AS DOUBLE)
                      - CAST(s.m AS DOUBLE) / CAST(s.n AS DOUBLE))
                     / sqrt(CAST(s.n * s.ss - s.m * s.m AS DOUBLE)
                            / CAST(s.n * s.n AS DOUBLE))
           END AS z
    FROM longf l JOIN stats s ON s.i = l.i
    """,
    category="llm_similarity",
)
def q_embedding_standardize(spark, sf_dir):
    """Per-dimension z-score standardization of the embedding corpus
    (`llm/similarity.py::standardize_embeddings`): exact BIGINT moment
    sums (partial-agg shuffle of partitions×dim rows), population
    variance as the exact integer numerator n·ss − m², then one
    division + one sqrt + one subtraction/division per element — every
    z DOUBLE graded bitwise, no rounding."""
    from my_flink_1_10_2_spark.llm.similarity import standardize_embeddings

    return standardize_embeddings(read(spark, sf_dir, "embeddings"))


@register(
    "q_embedding_topk_ivfadc",
    oracle="""
WITH corpus AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS vi
  FROM embeddings
),
cents AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, vi AS cv
  FROM (SELECT vec_id, vi FROM corpus ORDER BY vec_id LIMIT 8)
),
adist_c AS MATERIALIZED (
  SELECT corpus.vec_id, cents.c,
         CAST(list_sum(list_transform(range(1,65),
           j -> (list_extract(vi, j) - list_extract(cv, j))
              * (list_extract(vi, j) - list_extract(cv, j)))) AS BIGINT) AS d
  FROM corpus CROSS JOIN cents
),
assign AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM adist_c) WHERE rn = 1
),
resid AS MATERIALIZED (
  SELECT corpus.vec_id, a.c AS centroid,
         list_transform(range(1,65),
           j -> list_extract(vi, j) - list_extract(cv, j)) AS rv
  FROM corpus JOIN assign a USING (vec_id) JOIN cents ON cents.c = a.c
),
subs AS (SELECT unnest(range(0,4)) AS i),
cb AS MATERIALIZED (
  SELECT subs.i, b.k,
         list_slice(b.rv, CAST(subs.i*16+1 AS BIGINT), CAST(subs.i*16+16 AS BIGINT)) AS cv
  FROM (SELECT row_number() OVER (ORDER BY vec_id)-1 AS k, rv
        FROM (SELECT vec_id, rv FROM resid ORDER BY vec_id LIMIT 16)) b
  CROSS JOIN subs
),
rdist AS MATERIALIZED (
  SELECT resid.vec_id, resid.centroid, cb.i, cb.k,
         CAST(list_sum(list_transform(range(1,17),
           j -> (list_extract(rv, CAST(cb.i*16+j AS BIGINT)) - list_extract(cv, j))
              * (list_extract(rv, CAST(cb.i*16+j AS BIGINT)) - list_extract(cv, j)))) AS BIGINT) AS d
  FROM resid CROSS JOIN cb
),
codes AS MATERIALIZED (
  SELECT vec_id, centroid, i, k AS code FROM (
    SELECT vec_id, centroid, i, k,
           row_number() OVER (PARTITION BY vec_id, i ORDER BY d, k) AS rn
    FROM rdist) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, c AS centroid FROM (
    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM adist_c WHERE vec_id < 10) WHERE rn <= 2
),
qres AS MATERIALIZED (
  SELECT p.query_id, p.centroid,
         list_transform(range(1,65),
           j -> list_extract(q.vi, j) - list_extract(cents.cv, j)) AS rv
  FROM probes p JOIN corpus q ON q.vec_id = p.query_id
       JOIN cents ON cents.c = p.centroid
),
qdist AS MATERIALIZED (
  SELECT qres.query_id, qres.centroid, cb.i, cb.k,
         CAST(list_sum(list_transform(range(1,17),
           j -> (list_extract(rv, CAST(cb.i*16+j AS BIGINT)) - list_extract(cv, j))
              * (list_extract(rv, CAST(cb.i*16+j AS BIGINT)) - list_extract(cv, j)))) AS BIGINT) AS d
  FROM qres CROSS JOIN cb
),
adc AS (
  SELECT q.query_id, e.vec_id, CAST(sum(q.d) AS BIGINT) AS adist
  FROM qdist q JOIN codes e
    ON e.centroid = q.centroid AND e.i = q.i AND e.code = q.k
  WHERE e.vec_id <> q.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, adist, rank FROM (
  SELECT query_id, vec_id, adist,
         row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank
  FROM adc) WHERE rank <= 5

    """,
    category="llm_similarity",
)
def q_embedding_topk_ivfadc(spark, sf_dir):
    """IVFADC — the full Jegou/Douze/Schmid production index
    (`llm/pq.py::ivfadc_topk`): IVF coarse quantizer (8 deterministic
    centroids) prunes the search to the 2 probed inverted lists, and a
    residual PQ codebook (subvectors of the first 16 residuals) encodes
    each vector as m=4 codes.  The corpus relation is (centroid, codes)
    — partitionable by centroid so probes skip unprobed lists; the ADC
    join is an equi-join on centroid, NOT a cross join.  Every stage
    (assignment, residuals, codes, probes, distance tables, sums,
    ranking) is exact BIGINT arithmetic; the oracle replays the entire
    index bitwise."""
    from my_flink_1_10_2_spark.llm.pq import ivfadc_topk

    emb = read(spark, sf_dir, "embeddings")
    return ivfadc_topk(
        emb, emb.filter("vec_id < 10"), k=5, n_centroids=8, n_probe=2, m=4, ksub=16
    )


@register(
    "q_zipf_fit",
    oracle=r"""
    WITH words AS (
      SELECT unnest(list_filter(str_split_regex(lower(text), '\s+'),
                                t -> t != '')) AS term
      FROM documents
    ),
    freqs AS (SELECT term, count(*) AS freq FROM words GROUP BY term),
    top AS (SELECT term, freq FROM freqs ORDER BY freq DESC, term LIMIT 100),
    ranked AS (
      SELECT freq, row_number() OVER (ORDER BY freq DESC, term) AS rank
      FROM top
    ),
    q AS (
      SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000000.0) AS HUGEINT)
               AS xq,
             CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000000.0) AS HUGEINT)
               AS yq
      FROM ranked
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS k,
             CAST(sum(xq) AS HUGEINT) AS sx, CAST(sum(yq) AS HUGEINT) AS sy,
             CAST(sum(xq * yq) AS HUGEINT) AS sxy,
             CAST(sum(xq * xq) AS HUGEINT) AS sxx
      FROM q
    )
    SELECT CAST(k AS BIGINT) AS n_terms_fit,
           CAST(k * sxy - sx * sy AS DOUBLE)
             / CAST(k * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
              - (CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(k AS DOUBLE) / 1000000000.0 AS intercept
    FROM s
    """,
    category="llm_text",
)
def q_zipf_fit(spark, sf_dir):
    """Zipf-law exponent of the corpus term-frequency distribution
    (`llm/text.py::zipf_fit`): least-squares ln(freq) ~ ln(rank) over
    the top-100 terms — the distribution fingerprint dataset-QA uses to
    spot templated/synthetic text.  Counts exact, ranks a total order,
    ln via libm on the 100-row relation, regression sums in exact
    DECIMAL(38)/HUGEINT — slope and intercept DOUBLEs graded bitwise."""
    from my_flink_1_10_2_spark.llm.text import zipf_fit

    return zipf_fit(read(spark, sf_dir, "documents"), top_k=100)


@register(
    "q_inverted_index",
    oracle=r"""
    WITH words AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(str_split_regex(lower(text), '\s+'),
                                t -> t != '')) AS term
      FROM documents
    )
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           string_agg(doc_id, ',' ORDER BY doc_id) AS postings
    FROM words GROUP BY term HAVING count(*) >= 50
    """,
    category="llm_text",
)
def q_inverted_index(spark, sf_dir):
    """Inverted-index build — the search/retrieval kernel a curation
    pipeline materializes for term lookups: per term, the document
    frequency and the doc_id-sorted posting list (terms with df >= 50
    here to bound the graded output).  One (doc, term) distinct shuffle
    + one term-keyed aggregate; posting lists are sort_array'd so the
    aggregation order never leaks into the result."""
    docs = read(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    ).distinct()
    return (
        words.groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("df") >= 50)
    )


@register(
    "q_readability",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(str_split_regex(lower(text), '\s+'), t -> t != '')
               AS words,
             greatest(len(list_filter(str_split_regex(text, '[.!?]+'),
                                      s -> trim(s) != '')), 1) AS n_sentences
      FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(n_sentences AS BIGINT) AS n_sentences,
             CAST(coalesce(list_sum(list_transform(words,
               w -> greatest(len(list_filter(str_split_regex(w, '[^aeiouy]+'),
                                             g -> g != '')), 1))), 0) AS BIGINT)
               AS n_syllables
      FROM base
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN
             206.835 - 1.015 * (CAST(n_words AS DOUBLE)
                                / CAST(n_sentences AS DOUBLE))
                     - 84.6 * (CAST(n_syllables AS DOUBLE)
                               / CAST(n_words AS DOUBLE))
           END AS flesch
    FROM stats
    """,
    category="llm_text",
)
def q_readability(spark, sf_dir):
    """Flesch reading-ease scoring (`llm/text.py::flesch_reading_ease`)
    — the classic readability signal corpus QA tracks next to the
    Gopher rules: exact integer word/sentence/vowel-group-syllable
    counts, then two IEEE divisions in a fixed expression tree; the raw
    DOUBLE score is graded bitwise.  One projection, zero shuffles."""
    from my_flink_1_10_2_spark.llm.text import (
        flesch_reading_ease,
        readability_stats,
    )

    docs = read(spark, sf_dir, "documents")
    s = readability_stats("text")
    return docs.select(
        "doc_id",
        s["n_words"].alias("n_words"),
        s["n_sentences"].alias("n_sentences"),
        s["n_syllables"].alias("n_syllables"),
        flesch_reading_ease("text").alias("flesch"),
    )


def _pq_trained_oracle(iterations: int = 2, m: int = 4, ksub: int = 8,
                       dsub: int = 16) -> str:
    """Unrolled integer-Lloyd PQ oracle replicating `llm/pq.py::pq_train`
    + the ADC search bitwise: every iteration assigns by exact int
    L2**2 (ties to the lowest centroid), re-centers with the half-up
    rational (2s+c)//(2c) (floor of the correctly-rounded double
    quotient — exact while 2s+c < 2^52), empty clusters carry the
    previous centroid."""
    its = []
    prev = "cb0"
    for t in range(1, iterations + 1):
        its.append(f"""
    dist{t} AS MATERIALIZED (
      SELECT c.vec_id, cb.i, cb.k,
             CAST(sum((list_extract(c.vi, CAST(cb.i*{dsub} + cb.j AS BIGINT)) - cb.v)
                    * (list_extract(c.vi, CAST(cb.i*{dsub} + cb.j AS BIGINT)) - cb.v))
                  AS BIGINT) AS d
      FROM corpus c CROSS JOIN {prev} cb GROUP BY 1, 2, 3),
    codes{t} AS MATERIALIZED (
      SELECT vec_id, i, k AS code FROM (
        SELECT vec_id, i, k,
               row_number() OVER (PARTITION BY vec_id, i ORDER BY d, k) AS rn
        FROM dist{t}) WHERE rn = 1),
    sums{t} AS MATERIALIZED (
      SELECT cd.i, cd.code AS k, js.j,
             CAST(sum(list_extract(c.vi, CAST(cd.i*{dsub} + js.j AS BIGINT)))
                  AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS cnt
      FROM codes{t} cd JOIN corpus c USING (vec_id) CROSS JOIN js
      GROUP BY 1, 2, 3),
    cb{t} AS MATERIALIZED (
      SELECT p.i, p.k, p.j,
             CASE WHEN s.cnt > 0
                  THEN CAST(floor(CAST(2*s.s + s.cnt AS DOUBLE)
                                  / CAST(2*s.cnt AS DOUBLE)) AS BIGINT)
                  ELSE p.v END AS v
      FROM {prev} p LEFT JOIN sums{t} s
        ON s.i = p.i AND s.k = p.k AND s.j = p.j)""")
        prev = f"cb{t}"
    fin = iterations + 1
    return (f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS vi
      FROM embeddings
    ),
    subs AS (SELECT unnest(range(0,{m})) AS i),
    js AS (SELECT unnest(range(1,{dsub + 1})) AS j),
    cb0 AS MATERIALIZED (
      SELECT subs.i, b.k, js.j,
             list_extract(b.vi, CAST(subs.i*{dsub} + js.j AS BIGINT)) AS v
      FROM (SELECT row_number() OVER (ORDER BY vec_id)-1 AS k, vi
            FROM (SELECT vec_id, vi FROM corpus ORDER BY vec_id LIMIT {ksub})) b
      CROSS JOIN subs CROSS JOIN js),"""
      + ",".join(its)
      + f""",
    dist{fin} AS MATERIALIZED (
      SELECT c.vec_id, cb.i, cb.k,
             CAST(sum((list_extract(c.vi, CAST(cb.i*{dsub} + cb.j AS BIGINT)) - cb.v)
                    * (list_extract(c.vi, CAST(cb.i*{dsub} + cb.j AS BIGINT)) - cb.v))
                  AS BIGINT) AS d
      FROM corpus c CROSS JOIN {prev} cb GROUP BY 1, 2, 3),
    codes{fin} AS MATERIALIZED (
      SELECT vec_id, i, k AS code FROM (
        SELECT vec_id, i, k,
               row_number() OVER (PARTITION BY vec_id, i ORDER BY d, k) AS rn
        FROM dist{fin}) WHERE rn = 1),
    adc AS (
      SELECT q.vec_id AS query_id, e.vec_id, CAST(sum(q.d) AS BIGINT) AS adist
      FROM dist{fin} q JOIN codes{fin} e ON e.i = q.i AND e.code = q.k
      WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id, adist, rank FROM (
      SELECT query_id, vec_id, adist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adist, vec_id) AS rank
      FROM adc) WHERE rank <= 5
    """)


@register(
    "q_embedding_topk_pq_trained",
    oracle=_pq_trained_oracle(),
    category="llm_similarity",
)
def q_embedding_topk_pq_trained(spark, sf_dir):
    """PQ with K-MEANS-TRAINED codebooks (`llm/pq.py::pq_train`): two
    integer Lloyd iterations — exact int L2 assignment, cluster means
    re-quantized to integer units via the half-up rational (2s+c)//(2c)
    each round, empty clusters carrying their previous centroid — then
    the same ADC top-k as the fixed-codebook variant.  The oracle
    unrolls BOTH training iterations and the final encode/search, so
    the trained index (not just its use) is graded bitwise."""
    from my_flink_1_10_2_spark.llm.pq import pq_topk_adc, pq_train

    emb = read(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=4, ksub=8, iterations=2)
    return pq_topk_adc(
        emb, emb.filter("vec_id < 10"), k=5, m=4, ksub=8, codebooks=cb
    )


@register(
    "q_minhash_estimate_audit",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                        i -> array_to_string(words[i:i+2], ' ')))
                    AS shingle
           FROM w),
    sig AS (SELECT doc_id, {', '.join(_minhash_mins(16))} FROM sh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b,
             CASE b
               {' '.join(f"WHEN {b} THEN array_to_string([h{4*b}, h{4*b+1}, h{4*b+2}, h{4*b+3}], ',')" for b in range(4))}
             END AS band_key,
             [{', '.join(f'h{i}' for i in range(16))}] AS sig
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
             CAST(len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i]))
                  AS BIGINT) AS n_matches
      FROM banded a JOIN banded b ON a.b = b.b AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT c.doc1, c.doc2, CAST(count(*) AS BIGINT) AS i
      FROM cand c JOIN sh s1 ON s1.doc_id = c.doc1
                  JOIN sh s2 ON s2.doc_id = c.doc2 AND s2.shingle = s1.shingle
      GROUP BY 1, 2
    )
    SELECT c.doc1, c.doc2, c.n_matches,
           CAST(c.n_matches * 1000000 // 16 AS BIGINT) AS est_e6,
           CAST(coalesce(i.i, 0) * 1000000
                // (sa.n + sb.n - coalesce(i.i, 0)) AS BIGINT) AS true_e6,
           CAST(abs(c.n_matches * 1000000 // 16
                    - coalesce(i.i, 0) * 1000000
                      // (sa.n + sb.n - coalesce(i.i, 0))) AS BIGINT) AS err_e6
    FROM cand c JOIN sizes sa ON sa.doc_id = c.doc1
                JOIN sizes sb ON sb.doc_id = c.doc2
                LEFT JOIN inter i ON i.doc1 = c.doc1 AND i.doc2 = c.doc2
    """,
    category="llm_dedup",
)
def q_minhash_estimate_audit(spark, sf_dir):
    """MinHash estimate-vs-truth audit — the sketch-quality report a
    dedup pipeline keeps next to its thresholds: for every LSH candidate
    pair, the signature-agreement estimate (n_matches/16) against the
    EXACT shingle Jaccard, both in exact 1e-6 integer units with the
    absolute error.  The truth side joins shingle sets only for
    candidate pairs (O(candidates), never all pairs)."""
    docs = read(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, num_hashes=16)
    import itertools as _it

    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.concat_ws(
                            ",", *[F.col("sig")[i].cast("string") for i in range(4 * b, 4 * b + 4)]
                        ).alias("band_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.b").alias("b"), F.col("bk.band_key").alias("band_key"))
    a = banded.select(
        F.col("doc_id").alias("doc1"), F.col("sig").alias("sig1"), "b", "band_key"
    )
    bb = banded.select(
        F.col("doc_id").alias("doc2"), F.col("sig").alias("sig2"), "b", "band_key"
    )
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig1"), F.col("sig2"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ).cast("bigint")
    cand = (
        a.join(bb, ["b", "band_key"])
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", matches.alias("n_matches"))
        .distinct()
    )
    sh = D.shingles(docs).select("doc_id", "shingle").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n"))
    sh2 = sh.select(F.col("doc_id").alias("__d2"), F.col("shingle").alias("__s2"))
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "doc1"), "doc1")
        .join(
            sh2,
            (F.col("doc2") == F.col("__d2")) & (F.col("shingle") == F.col("__s2")),
        )
        .groupBy("doc1", "doc2")
        .agg(F.count("*").cast("bigint").alias("i"))
    )
    est = F.expr("CAST(n_matches * 1000000 DIV 16 AS BIGINT)")
    true_ = F.expr("CAST(coalesce(i, 0) * 1000000 DIV (n_a + n_b - coalesce(i, 0)) AS BIGINT)")
    return (
        cand.join(sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n_a")), "doc1")
        .join(sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n_b")), "doc2")
        .join(inter, ["doc1", "doc2"], "left")
        .select(
            "doc1",
            "doc2",
            "n_matches",
            est.alias("est_e6"),
            true_.alias("true_e6"),
            F.abs(est - true_).cast("bigint").alias("err_e6"),
        )
    )


@register(
    "q_term_pmi",
    oracle=r"""
    WITH words AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(str_split_regex(lower(text), '\s+'),
                                t -> t != '')) AS term
      FROM documents
    ),
    top AS (
      SELECT term FROM (
        SELECT term, count(*) AS df FROM words GROUP BY 1
        ORDER BY df DESC, term LIMIT 30)
    ),
    inc AS (SELECT w.doc_id, w.term FROM words w JOIN top USING (term)),
    cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM inc GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    co AS (
      SELECT a.term AS term_x, b.term AS term_y,
             CAST(count(*) AS BIGINT) AS c_xy
      FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    lq AS (
      SELECT v, CAST(round(ln(CAST(v AS DOUBLE)) * 1000000000.0) AS BIGINT)
               AS l
      FROM (SELECT DISTINCT c AS v FROM cnt
            UNION SELECT DISTINCT c_xy FROM co
            UNION SELECT n FROM n)
    )
    SELECT co.term_x, co.term_y, co.c_xy,
           CAST(ln.l + lxy.l - lx.l - ly.l AS BIGINT) AS pmi_e9
    FROM co
    JOIN cnt cx ON cx.term = co.term_x
    JOIN cnt cy ON cy.term = co.term_y
    CROSS JOIN n
    JOIN lq lx ON lx.v = cx.c
    JOIN lq ly ON ly.v = cy.c
    JOIN lq lxy ON lxy.v = co.c_xy
    JOIN lq ln ON ln.v = n.n
    """,
    category="llm_text",
)
def q_term_pmi(spark, sf_dir):
    """Pointwise mutual information of top-term co-occurrence — the
    collocation-mining kernel (which frequent terms attract or repel
    each other across documents): PMI = ln(N·c_xy/(c_x·c_y)) decomposed
    into ln N + ln c_xy − ln c_x − ln c_y with EVERY log quantized to
    1e-9 integer units through the libm Arrow UDF over the distinct
    count values — the result is a pure BIGINT sum, no division, no
    float anywhere in the graded value.  Doc-pair co-occurrence joins
    the 30-term incidence relation on doc_id — bounded, never a term
    cartesian."""
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _ln():
        def kernel(s):
            return pd.Series([math.log(float(v)) for v in s], dtype="float64")

        kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(kernel, DoubleType())

    docs = read(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    ).distinct()
    top = (
        words.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(30)
        .select("term")
    )
    inc = words.join(F.broadcast(top), "term")
    cnt = inc.groupBy("term").agg(F.count("*").cast("bigint").alias("c"))
    n = docs.agg(F.count("*").cast("bigint").alias("n"))
    co = (
        inc.select(F.col("doc_id"), F.col("term").alias("term_x"))
        .join(
            inc.select(F.col("doc_id"), F.col("term").alias("term_y")), "doc_id"
        )
        .where(F.col("term_x") < F.col("term_y"))
        .groupBy("term_x", "term_y")
        .agg(F.count("*").cast("bigint").alias("c_xy"))
        .where(F.col("c_xy") >= 5)
    )
    ln = _ln()
    vals = (
        cnt.select(F.col("c").alias("v"))
        .unionByName(co.select(F.col("c_xy").alias("v")))
        .unionByName(n.select(F.col("n").alias("v")))
        .distinct()
        .withColumn("l", F.round(ln(F.col("v").cast("double")) * 1e9).cast("bigint"))
    )
    return (
        co.join(cnt.select(F.col("term").alias("term_x"), F.col("c").alias("cx")), "term_x")
        .join(cnt.select(F.col("term").alias("term_y"), F.col("c").alias("cy")), "term_y")
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(vals.select(F.col("v").alias("cx"), F.col("l").alias("lx"))), "cx")
        .join(F.broadcast(vals.select(F.col("v").alias("cy"), F.col("l").alias("ly"))), "cy")
        .join(F.broadcast(vals.select(F.col("v").alias("c_xy"), F.col("l").alias("lxy"))), "c_xy")
        .join(F.broadcast(vals.select(F.col("v").alias("n"), F.col("l").alias("ln_"))), "n")
        .select(
            "term_x",
            "term_y",
            "c_xy",
            (F.col("ln_") + F.col("lxy") - F.col("lx") - F.col("ly"))
            .cast("bigint")
            .alias("pmi_e9"),
        )
    )


@register(
    "q_lsh_recall_report",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                        i -> array_to_string(words[i:i+2], ' ')))
                    AS shingle
           FROM w),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT s1.doc_id AS doc1, s2.doc_id AS doc2,
             CAST(count(*) AS BIGINT) AS i
      FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle
                           AND s1.doc_id < s2.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc1, doc2 FROM inter
      JOIN sizes sa ON sa.doc_id = doc1 JOIN sizes sb ON sb.doc_id = doc2
      WHERE 4 * i >= sa.n + sb.n - i
    ),
    sig AS (SELECT doc_id, {', '.join(_minhash_mins(16))} FROM sh GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b,
             CASE b
               {' '.join(f"WHEN {b} THEN array_to_string([h{4*b}, h{4*b+1}, h{4*b+2}, h{4*b+3}], ',')" for b in range(4))}
             END AS band_key
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM banded a JOIN banded b ON a.b = b.b AND a.band_key = b.band_key
      WHERE a.doc_id < b.doc_id
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth JOIN cand USING (doc1, doc2))
                AS BIGINT) AS n_found,
           CAST((SELECT count(*) FROM truth JOIN cand USING (doc1, doc2))
                  * 1000000
                // greatest((SELECT count(*) FROM truth), 1) AS BIGINT)
             AS recall_e6
    """,
    category="llm_dedup",
)
def q_lsh_recall_report(spark, sf_dir):
    """LSH candidate RECALL against exact ground truth — the other half
    of the sketch audit (`q_minhash_estimate_audit` grades estimate
    accuracy; this grades what the banding MISSES): true pairs are
    those with exact shingle Jaccard >= 1/4 (the integer cross-test
    4·|A∩B| >= |A∪B| — no float threshold), computed only over pairs
    sharing at least one shingle (the join bounds the pair space — no
    cartesian); candidates come from the 4-band LSH.  One row: truth
    size, candidate size, found count, recall in exact 1e-6 units."""
    docs = read(spark, sf_dir, "documents")
    sh = D.shingles(docs).select("doc_id", "shingle").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n"))
    inter = (
        sh.select(F.col("doc_id").alias("doc1"), "shingle")
        .join(
            sh.select(F.col("doc_id").alias("doc2"), F.col("shingle").alias("__s")),
            (F.col("shingle") == F.col("__s")) & (F.col("doc1") < F.col("doc2")),
        )
        .groupBy("doc1", "doc2")
        .agg(F.count("*").cast("bigint").alias("i"))
    )
    truth = (
        inter.join(sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("na")), "doc1")
        .join(sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("nb")), "doc2")
        .where(4 * F.col("i") >= F.col("na") + F.col("nb") - F.col("i"))
        .select("doc1", "doc2")
    )
    cand = (
        D.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.0)
        .select("doc1", "doc2")
        .distinct()
    )
    found = truth.join(cand, ["doc1", "doc2"])
    stats = (
        truth.agg(F.count("*").cast("bigint").alias("n_true"))
        .crossJoin(cand.agg(F.count("*").cast("bigint").alias("n_candidates")))
        .crossJoin(found.agg(F.count("*").cast("bigint").alias("n_found")))
    )
    return stats.select(
        "n_true",
        "n_candidates",
        "n_found",
        F.expr(
            "CAST(n_found * 1000000 DIV greatest(n_true, 1) AS BIGINT)"
        ).alias("recall_e6"),
    )


@register(
    "q_curriculum_stages",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             (length(text) * 1000) // (len({_WORDS}) + 1) AS difficulty
      FROM documents
    ),
    staged AS (
      SELECT *, ntile(4) OVER (ORDER BY difficulty, doc_id) AS stage
      FROM d
    )
    SELECT stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(difficulty) AS BIGINT) AS min_difficulty,
           CAST(max(difficulty) AS BIGINT) AS max_difficulty,
           CAST(sum(n_chars) AS BIGINT) AS stage_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM staged GROUP BY stage ORDER BY stage
    """,
    category="llm_text",
)
def q_curriculum_stages(spark, sf_dir):
    """Curriculum-learning data ordering (Bengio et al. 2009 applied to
    corpus construction): rank every document by an integer difficulty
    score (mean token length in permille — length*1000 DIV (tokens+1),
    exact in both engines) and cut the corpus into 4 curriculum stages
    with NTILE, easy → hard; the per-stage profile is what a training
    scheduler consumes.  The global NTILE runs through
    operators/rank.py::global_ntile (range-partitioned global rank +
    closed-form integer bucket arithmetic) — NOT Spark's native
    unpartitioned ntile window, which funnels the whole corpus through
    one task (Exchange SinglePartition).  Stage boundaries are
    deterministic under the (difficulty, doc_id) total order."""
    from my_flink_1_10_2_spark.operators.rank import global_ntile

    docs = read(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        # integer DIV (not a double ratio) so the score is engine-exact
        F.expr(
            "(length(text) * 1000) DIV (size(split(text, '\\\\s+')) + 1)"
        ).alias("difficulty"),
    )
    staged = global_ntile(d, 4, ["difficulty", "doc_id"], "stage")
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("difficulty").cast("bigint").alias("min_difficulty"),
            F.max("difficulty").cast("bigint").alias("max_difficulty"),
            F.sum("n_chars").cast("bigint").alias("stage_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
        .orderBy("stage")
    )


@register(
    "q_jpeg_tile_stats",
    oracle="""
    SELECT media_id, width, height, px_sum, px_min, px_max FROM (
      SELECT doc_id AS media_id,
             CAST(8 * (2 + doc_id % 3) AS BIGINT) AS width,
             CAST(8 * (1 + doc_id % 2) AS BIGINT) AS height,
             CAST(64 * SUM(((doc_id*37 + t*29) % 128) * 2) AS BIGINT) AS px_sum,
             CAST(MIN(((doc_id*37 + t*29) % 128) * 2) AS BIGINT) AS px_min,
             CAST(MAX(((doc_id*37 + t*29) % 128) * 2) AS BIGINT) AS px_max
      FROM (
        SELECT doc_id,
               unnest(range((2 + doc_id % 3) * (1 + doc_id % 2))) AS t
        FROM documents)
      GROUP BY doc_id)
    """,
    category="llm_multimodal",
)
def q_jpeg_tile_stats(spark, sf_dir):
    """REAL JPEG decode (the last gated image leg, now implemented —
    llm/jpeg.py: baseline sequential DCT, Annex-K Huffman tables, byte
    stuffing, blocked 8×8 DCT/IDCT): per-document grayscale JPEGs of
    QUANT-EXACT constant tiles are encoded executor-side, decoded by
    the same public-spec pipeline in reverse, and the DECODED pixel
    statistics grade against the closed-form SQL replay.  Constant
    even-level tiles make the lossy pipeline bit-exact (DC multiples of
    the quant step; AC exactly zero), so a defect anywhere in the
    marker parsing / Huffman / zigzag / dequant / IDCT chain
    mismatches.  Lossy behavior on natural images is property-tested
    (tests/test_jpeg_codec.py)."""
    from my_flink_1_10_2_spark.llm.multimodal import (
        extract_features,
        synthetic_jpeg_media,
    )

    docs = read(spark, sf_dir, "documents")
    feats = extract_features(synthetic_jpeg_media(docs), fake=False)
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("bigint").alias("width"),
        F.element_at("features", 2).cast("bigint").alias("height"),
        F.element_at("features", 5).cast("bigint").alias("px_sum"),
        F.element_at("features", 6).cast("bigint").alias("px_min"),
        F.element_at("features", 7).cast("bigint").alias("px_max"),
    )


@register(
    "q_video_frame_stats",
    oracle="""
    SELECT media_id, n_frames, n_sampled, px_sum, px_min, px_max FROM (
      SELECT doc_id AS media_id,
             CAST(3 + doc_id % 4 AS BIGINT) AS n_frames,
             CAST(count(DISTINCT f) AS BIGINT) AS n_sampled,
             CAST(64 * SUM(((doc_id*41 + f*23 + t*29) % 128) * 2)
                  AS BIGINT) AS px_sum,
             CAST(MIN(((doc_id*41 + f*23 + t*29) % 128) * 2)
                  AS BIGINT) AS px_min,
             CAST(MAX(((doc_id*41 + f*23 + t*29) % 128) * 2)
                  AS BIGINT) AS px_max
      FROM (
        SELECT doc_id, f, t
        FROM (SELECT doc_id,
                     unnest(range(3 + doc_id % 4)) AS f
              FROM documents),
             (SELECT unnest(range(2)) AS t)
        WHERE f % 2 = 0)
      GROUP BY doc_id)
    """,
    category="llm_multimodal",
)
def q_video_frame_stats(spark, sf_dir):
    """REAL video decode with frame SAMPLING (the last multimodal gate,
    now implemented — llm/avi.py MJPEG/AVI container walk + llm/jpeg.py
    per-frame baseline JPEG): per-document AVIs of quant-exact frames
    are encoded executor-side, every SECOND frame is selected on the
    chunk index (dropped frames are never decoded — the production
    sampler shape), the kept frames decode to pixels, and the decoded
    statistics grade against the closed-form SQL replay.  Codecs beyond
    MJPG (H.264 class) stay honestly gated."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.avi import avi_decode_sampled_pixels
    from my_flink_1_10_2_spark.llm.multimodal import synthetic_avi_media

    media = synthetic_avi_media(read(spark, sf_dir, "documents"))

    def stats(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w, _h, n_total, pxs = avi_decode_sampled_pixels(
                    bytes(payload), every=2
                )
                flat = b"".join(pxs)
                rows.append(
                    (int(mid), n_total, len(pxs), sum(flat), min(flat), max(flat))
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "n_frames", "n_sampled",
                        "px_sum", "px_min", "px_max",
                    ],
                )

    return _cpu_spread(media).mapInPandas(
        stats,
        "media_id long, n_frames long, n_sampled long, "
        "px_sum long, px_min long, px_max long",
    )


@register(
    "q_png_interlaced_palette_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS media_id,
             CAST(5 + doc_id % 7 AS BIGINT) AS width,
             CAST(4 + doc_id % 5 AS BIGINT) AS height,
             (doc_id * 5 + i * 3) % 16 AS j,
             doc_id AS d
      FROM (SELECT doc_id,
                   unnest(range((5 + doc_id % 7) * (4 + doc_id % 5))) AS i
            FROM documents)
    ),
    rgb AS (
      SELECT media_id, width, height,
             (d*11 + j*29) % 256 AS r,
             (d*17 + j*13) % 256 AS g,
             (d*7 + j*37) % 256 AS b
      FROM px
    )
    SELECT media_id, width, height,
           CAST(sum(r) AS BIGINT) AS r_sum,
           CAST(sum(g) AS BIGINT) AS g_sum,
           CAST(sum(b) AS BIGINT) AS b_sum,
           CAST(least(min(r), min(g), min(b)) AS BIGINT) AS px_min,
           CAST(greatest(max(r), max(g), max(b)) AS BIGINT) AS px_max
    FROM rgb GROUP BY media_id, width, height
    """,
    category="llm_multimodal",
)
def q_png_interlaced_palette_stats(spark, sf_dir):
    """REAL Adam7 + palette decode (the round-7 PNG gate closures):
    per-document INTERLACED palette PNGs — seven independently-filtered
    sub-images, PLTE-expanded color, mixed scanline filters, sizes
    chosen to hit empty and partial passes — are encoded executor-side
    and decoded back by llm/png.py; the decoded per-channel sums grade
    against the closed-form SQL replay of the palette rule.  A defect
    anywhere in the pass geometry / per-pass unfiltering / PLTE
    expansion mismatches."""
    from my_flink_1_10_2_spark.llm.multimodal import interlaced_palette_png_stats

    return interlaced_palette_png_stats(read(spark, sf_dir, "documents"))


@register(
    "q_adpcm_wav_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(30 + (doc_id % 5) * 25 AS BIGINT) AS n_samples,
           CAST(((doc_id * 37) % 256 - 128) * 100 AS BIGINT) AS amp_min,
           CAST(((doc_id * 37) % 256 - 128) * 100 AS BIGINT) AS amp_max,
           CAST((30 + (doc_id % 5) * 25)
                * (((doc_id * 37) % 256 - 128) * 100) AS BIGINT) AS amp_sum
    FROM documents
    """,
    category="llm_multimodal",
)
def q_adpcm_wav_stats(spark, sf_dir):
    """REAL IMA-ADPCM decode (round-7 audio gate closure, llm/wav.py
    format tag 0x11): per-document compressed WAVs are encoded and
    decoded executor-side — block headers, nibble stream, index clamp,
    fact-chunk tail trimming all on the real path.  Constant-amplitude
    signals are BIT-EXACT through the lossy codec (zero diff encodes
    nibble 0, which decodes to step>>3 = 0 at index 0, and every block
    header carries its first sample verbatim), so the decoded stats
    replay in closed form: a defect anywhere in block framing or the
    step tables mismatches.  Sample counts span multiple blocks with a
    padded tail (block_align 16 -> 25 samples/block)."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.wav import wav_decode, wav_encode_adpcm

    schema = (
        "media_id long, n_samples long, amp_min long, amp_max long, amp_sum long"
    )

    def batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 30 + (d % 5) * 25
                v = ((d * 37) % 256 - 128) * 100
                payload = wav_encode_adpcm([v] * n, sample_rate=8000,
                                           block_align=16)
                rate, channels, bits, out = wav_decode(payload)
                if (rate, channels, bits) != (8000, 1, 16):
                    raise ValueError("ADPCM container metadata mismatch")
                rows.append((d, len(out), min(out), max(out), sum(out)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "amp_min", "amp_max", "amp_sum"],
            )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, schema)


@register(
    "q_jpeg_progressive_tile_stats",
    oracle="""
    SELECT media_id, width, height, px_sum, px_min, px_max FROM (
      SELECT doc_id AS media_id,
             CAST(8 * (2 + doc_id % 3) AS BIGINT) AS width,
             CAST(8 * (1 + doc_id % 2) AS BIGINT) AS height,
             CAST(64 * SUM(((doc_id*37 + t*29) % 128) * 2) AS BIGINT) AS px_sum,
             CAST(MIN(((doc_id*37 + t*29) % 128) * 2) AS BIGINT) AS px_min,
             CAST(MAX(((doc_id*37 + t*29) % 128) * 2) AS BIGINT) AS px_max
      FROM (
        SELECT doc_id,
               unnest(range((2 + doc_id % 3) * (1 + doc_id % 2))) AS t
        FROM documents)
      GROUP BY doc_id)
    """,
    category="llm_multimodal",
)
def q_jpeg_progressive_tile_stats(spark, sf_dir):
    """REAL PROGRESSIVE JPEG decode (round-7 SOF2 gate closure —
    llm/jpeg_progressive.py: spectral selection, successive
    approximation with DC/AC first scans at Al=1 and both refinement
    passes, EOB-run band coding per T.81 Annex G): the same quant-exact
    tile fixtures as q_jpeg_tile_stats, encoded as four-scan
    progressive streams executor-side and decoded by the unified
    dispatcher (jpeg_decode_gray routes SOF2).  Identical quantized
    coefficients make the progressive path pixel-exact on these
    fixtures, so the decoded statistics replay in the same closed-form
    SQL; any defect in scan reassembly, refinement bit handling, or the
    EOB logic mismatches."""
    from my_flink_1_10_2_spark.llm.multimodal import (
        extract_features,
        synthetic_jpeg_media,
    )

    docs = read(spark, sf_dir, "documents")
    feats = extract_features(
        synthetic_jpeg_media(docs, progressive=True), fake=False
    )
    return feats.select(
        "media_id",
        F.element_at("features", 1).cast("bigint").alias("width"),
        F.element_at("features", 2).cast("bigint").alias("height"),
        F.element_at("features", 5).cast("bigint").alias("px_sum"),
        F.element_at("features", 6).cast("bigint").alias("px_min"),
        F.element_at("features", 7).cast("bigint").alias("px_max"),
    )


@register(
    "q_jpeg_color_tile_stats",
    oracle="""
    SELECT media_id, width, height, y_sum, cb_sum, cr_sum FROM (
      SELECT doc_id AS media_id,
             CAST(16 * (1 + doc_id % 3) AS BIGINT) AS width,
             CAST(16 * (1 + doc_id % 2) AS BIGINT) AS height,
             CAST(256 * SUM(2 * ((doc_id*37 + t*29) % 128)) AS BIGINT) AS y_sum,
             CAST(256 * SUM(128 + 17 * (((doc_id*5 + t*3) % 13) - 6))
                  AS BIGINT) AS cb_sum,
             CAST(256 * SUM(128 + 17 * (((doc_id*7 + t*11) % 13) - 6))
                  AS BIGINT) AS cr_sum
      FROM (
        SELECT doc_id,
               unnest(range((1 + doc_id % 3) * (1 + doc_id % 2))) AS t
        FROM documents)
      GROUP BY doc_id)
    """,
    category="llm_multimodal",
)
def q_jpeg_color_tile_stats(spark, sf_dir):
    """REAL COLOR JPEG decode (round-7 multi-component gate closure —
    llm/jpeg_color.py: YCbCr 4:2:0 MCU interleave, per-component DC
    predictors, Annex-K luma AND chroma quant/Huffman tables, box-down
    / replicate-up chroma resampling): per-document color JPEGs of
    QUANT-EXACT constant 16x16 tiles — Y at even levels (multiples of
    the luma DC step), chroma at 128±17k (multiples of the chroma DC
    step 17) — are encoded and decoded executor-side; the decoded
    per-plane sums grade against the closed-form SQL replay.  Constant
    tiles survive 2x2 box averaging exactly, so any defect in MCU
    geometry, table selection, predictor separation, or upsampling
    mismatches."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.jpeg_color import (
        jpeg_decode_color,
        jpeg_encode_color,
    )

    schema = (
        "media_id long, width long, height long, "
        "y_sum long, cb_sum long, cr_sum long"
    )

    def batches(it):
        for pdf in it:
            rows = []
            import numpy as np

            for d in pdf["doc_id"]:
                d = int(d)
                tw, th = 1 + d % 3, 1 + d % 2  # 16px tiles across / down
                w, h = 16 * tw, 16 * th
                ones = np.ones((16, 16), dtype=np.uint8)

                def plane(level):
                    tiles = np.array(
                        [level(t) for t in range(tw * th)], dtype=np.uint8
                    ).reshape(th, tw)
                    return np.kron(tiles, ones).tobytes()

                y = plane(lambda t: 2 * ((d * 37 + t * 29) % 128))
                cb = plane(lambda t: 128 + 17 * (((d * 5 + t * 3) % 13) - 6))
                cr = plane(lambda t: 128 + 17 * (((d * 7 + t * 11) % 13) - 6))
                payload = jpeg_encode_color(w, h, y, cb, cr, subsampling="4:2:0")
                dw, dh, dy, dcb, dcr = jpeg_decode_color(payload)
                if (dw, dh) != (w, h):
                    raise ValueError("color decode dims mismatch")
                rows.append((
                    d, w, h,
                    int(np.frombuffer(dy, dtype=np.uint8).sum(dtype=np.int64)),
                    int(np.frombuffer(dcb, dtype=np.uint8).sum(dtype=np.int64)),
                    int(np.frombuffer(dcr, dtype=np.uint8).sum(dtype=np.int64)),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "y_sum", "cb_sum", "cr_sum"],
            )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, schema)


@register(
    "q_jpeg12_cmyk_tile_stats",
    oracle="""
    SELECT media_id, width, height, c_sum, m_sum, y_sum, k_sum FROM (
      SELECT doc_id AS media_id,
             CAST(8 * (2 + doc_id % 3) AS BIGINT) AS width,
             CAST(8 * (1 + doc_id % 2) AS BIGINT) AS height,
             CAST(64 * SUM(2 * ((doc_id*37 + t*29) % 2048)) AS BIGINT) AS c_sum,
             CAST(64 * SUM(2 * ((doc_id*37 + 53 + t*29) % 2048)) AS BIGINT) AS m_sum,
             CAST(64 * SUM(2 * ((doc_id*37 + 106 + t*29) % 2048)) AS BIGINT) AS y_sum,
             CAST(64 * SUM(2 * ((doc_id*37 + 159 + t*29) % 2048)) AS BIGINT) AS k_sum
      FROM (
        SELECT doc_id,
               unnest(range((2 + doc_id % 3) * (1 + doc_id % 2))) AS t
        FROM documents)
      GROUP BY doc_id)
    """,
    category="llm_multimodal",
)
def q_jpeg12_cmyk_tile_stats(spark, sf_dir):
    """EXTENDED-SEQUENTIAL JPEG decode (round-10 profile-gate closure —
    llm/jpeg12.py: SOF1, 12-bit precision with 2048 level shift, 16-bit
    DQT entries, 12-bit-wide Huffman alphabets transmitted in DHT,
    4-component CMYK interleave behind an Adobe APP14, DRI restart
    markers): per-document CMYK JPEGs of QUANT-EXACT 8x8 tiles — every
    tile level even, so DC = 8*(level-2048) is a multiple of the
    Q[0,0]=16 step and every AC is exactly zero — are encoded and
    decoded executor-side with a per-doc restart interval (1 + d%4);
    the decoded per-plane pixel sums grade against the closed-form SQL
    replay.  Any defect in the SOF1 parse, 16-bit DQT, wide-category
    entropy coding, 4-predictor separation, restart resync, or the
    2048 level shift mismatches.  The K plane is ADDITIONALLY
    re-encoded as a PROGRESSIVE (SOF2) 12-bit stream — four-scan
    successive approximation with the wide alphabets — and its decode
    must equal the sequential decode bitwise, folding the
    progressive-12 chain into the same oracle grade.  Lossy behavior on
    random 12-bit images is property-tested (tests/test_jpeg12.py)."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.jpeg12 import jpeg12_decode, jpeg12_encode
    from my_flink_1_10_2_spark.llm.jpeg_progressive import (
        jpeg_decode_gray_progressive,
        jpeg_encode_gray_progressive,
    )

    schema = (
        "media_id long, width long, height long, "
        "c_sum long, m_sum long, y_sum long, k_sum long"
    )

    def batches(it):
        import numpy as np

        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                tw, th = 2 + d % 3, 1 + d % 2  # 8px tiles across / down
                w, h = 8 * tw, 8 * th
                ones = np.ones((8, 8), dtype=np.int64)

                def plane(k):
                    tiles = np.array(
                        [2 * ((d * 37 + k * 53 + t * 29) % 2048)
                         for t in range(tw * th)],
                        dtype=np.int64,
                    ).reshape(th, tw)
                    return np.kron(tiles, ones)

                planes = [plane(k) for k in range(4)]
                payload = jpeg12_encode(planes, restart_interval=1 + d % 4)
                prec, dw, dh, dec = jpeg12_decode(payload)
                if (prec, dw, dh, len(dec)) != (12, w, h, 4):
                    raise ValueError("jpeg12 metadata did not roundtrip")
                prog = jpeg_encode_gray_progressive(
                    w, h, planes[3], precision=12
                )
                pw, ph, praw = jpeg_decode_gray_progressive(prog)
                pk = np.frombuffer(praw, dtype="<u2").reshape(ph, pw)
                if not np.array_equal(pk, dec[3]):
                    raise ValueError(
                        "progressive-12 decode diverged from sequential"
                    )
                sums = [int(p.sum(dtype=np.int64)) for p in dec]
                rows.append((d, w, h, *sums))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height",
                         "c_sum", "m_sum", "y_sum", "k_sum"],
            )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, schema)


@register(
    "q_dsir_importance_weights",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, t AS term,
             CAST(('0x' || substr(md5(t), 1, 15))::BIGINT % 64 AS BIGINT) AS b
      FROM (SELECT doc_id, unnest(str_split_regex(lower(text), '\s+')) AS t
            FROM documents)
      WHERE t != ''
    ),
    tgt_docs AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    tcnt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS t
      FROM tok JOIN tgt_docs USING (doc_id) GROUP BY b
    ),
    rcnt AS (SELECT b, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY b),
    tot AS (
      SELECT (SELECT CAST(coalesce(sum(t), 0) AS BIGINT) FROM tcnt) AS tt,
             (SELECT CAST(sum(r) AS BIGINT) FROM rcnt) AS rt
    ),
    lr AS (
      SELECT rcnt.b,
             CAST(round((ln((coalesce(tcnt.t, 0) + 1)
                            / CAST(tot.tt + 64 AS DOUBLE))
                         - ln((rcnt.r + 1) / CAST(tot.rt + 64 AS DOUBLE)))
                        * 1000000) AS BIGINT) AS lr_i
      FROM rcnt LEFT JOIN tcnt USING (b) CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(lr_i) AS BIGINT) AS weight_e6
    FROM tok JOIN lr USING (b)
    GROUP BY doc_id
    ORDER BY weight_e6 DESC, doc_id
    LIMIT 20
    """,
    category="llm_text",
)
def q_dsir_importance_weights(spark, sf_dir):
    """Data Selection with Importance Resampling (DSIR — Xie et al.
    2023, the public hashed-n-gram importance-weighting recipe): score
    every document by how much more likely its tokens are under a
    TARGET distribution (here: the corpus's English slice) than under
    the raw distribution, both modeled as Laplace-smoothed multinomials
    over 64 hashed feature buckets; the top-weighted documents are what
    a targeted-data-selection pass keeps.

    Float discipline: the log-ratio is quantized to 1e-6 integer units
    once per BUCKET (64-row relation, broadcast), so per-doc weights
    are exact BIGINT sums — engine-identical, partition-invariant.
    100 TB shape: ONE tokenize scan -> md5 bucket hash (JVM expr) ->
    (doc, lang, bucket) partial-agg shuffle, locally checkpointed so the
    bucket models, their totals and the per-doc scoring all reuse the
    one pass (Spark does not share identical subtrees — without the
    checkpoint the corpus explode ran three times in this plan) ->
    two 64-row aggregates -> broadcast hash join back -> per-doc
    partial-agg shuffle -> TakeOrdered(20).  No Python, no unpartitioned
    window, nothing driver-side beyond two scalars."""
    from my_flink_1_10_2_spark.operators.hints import dim

    docs = read(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("bigint")
                % 64
            ).alias("b"),
        )
    )
    # one corpus pass: per-(doc, lang, bucket) token counts — a
    # |docs|x64-bounded relation every downstream aggregate derives from
    db = (
        tok.groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tcnt = (
        db.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("cnt").cast("bigint").alias("t"))
    )
    rcnt = db.groupBy("b").agg(F.sum("cnt").cast("bigint").alias("r"))
    tot = rcnt.agg(F.sum("r").cast("bigint").alias("rt")).crossJoin(
        tcnt.agg(F.coalesce(F.sum("t"), F.lit(0)).cast("bigint").alias("tt"))
    )
    lr = (
        rcnt.join(tcnt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("t"), F.lit(0)) + F.lit(1))
                        / (F.col("tt") + F.lit(64)).cast("double")
                    )
                    - F.log(
                        (F.col("r") + F.lit(1))
                        / (F.col("rt") + F.lit(64)).cast("double")
                    )
                )
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("lr_i"),
        )
    )
    return (
        db.join(dim(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("lr_i")).cast("bigint").alias("weight_e6"),
        )
        .orderBy(F.col("weight_e6").desc(), "doc_id")
        .limit(20)
    )


@register(
    "q_jpeg_progressive_color_stats",
    oracle="""
    SELECT media_id, width, height, y_sum, cb_sum, cr_sum FROM (
      SELECT doc_id AS media_id,
             CAST(16 * (1 + doc_id % 3) AS BIGINT) AS width,
             CAST(16 * (1 + doc_id % 2) AS BIGINT) AS height,
             CAST(256 * SUM(2 * ((doc_id*37 + t*29) % 128)) AS BIGINT) AS y_sum,
             CAST(256 * SUM(128 + 17 * (((doc_id*5 + t*3) % 13) - 6))
                  AS BIGINT) AS cb_sum,
             CAST(256 * SUM(128 + 17 * (((doc_id*7 + t*11) % 13) - 6))
                  AS BIGINT) AS cr_sum
      FROM (
        SELECT doc_id,
               unnest(range((1 + doc_id % 3) * (1 + doc_id % 2))) AS t
        FROM documents)
      GROUP BY doc_id)
    """,
    category="llm_multimodal",
)
def q_jpeg_progressive_color_stats(spark, sf_dir):
    """PROGRESSIVE COLOR JPEG decode (the full SOF2 3-component path —
    llm/jpeg_progressive.py: interleaved DC scans with per-component
    predictors, per-component non-interleaved AC scans over each
    component's OWN block grid, both refinement passes, 4:2:0
    resampling): the q_jpeg_color_tile_stats fixtures re-encoded as
    8-scan progressive streams and decoded back; identical quantized
    coefficients keep the quant-exact tiles bit-exact, so the same
    closed-form oracle grades the whole multi-scan color reassembly."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.jpeg_color import jpeg_decode_color
    from my_flink_1_10_2_spark.llm.jpeg_progressive import (
        jpeg_encode_color_progressive,
    )

    schema = (
        "media_id long, width long, height long, "
        "y_sum long, cb_sum long, cr_sum long"
    )

    def batches(it):
        for pdf in it:
            rows = []
            import numpy as np

            for d in pdf["doc_id"]:
                d = int(d)
                tw, th = 1 + d % 3, 1 + d % 2
                w, h = 16 * tw, 16 * th
                ones = np.ones((16, 16), dtype=np.uint8)

                def plane(level):
                    tiles = np.array(
                        [level(t) for t in range(tw * th)], dtype=np.uint8
                    ).reshape(th, tw)
                    return np.kron(tiles, ones).tobytes()

                y = plane(lambda t: 2 * ((d * 37 + t * 29) % 128))
                cb = plane(lambda t: 128 + 17 * (((d * 5 + t * 3) % 13) - 6))
                cr = plane(lambda t: 128 + 17 * (((d * 7 + t * 11) % 13) - 6))
                payload = jpeg_encode_color_progressive(
                    w, h, y, cb, cr, subsampling="4:2:0"
                )
                dw, dh, dy, dcb, dcr = jpeg_decode_color(payload)
                if (dw, dh) != (w, h):
                    raise ValueError("progressive color decode dims mismatch")
                rows.append((
                    d, w, h,
                    int(np.frombuffer(dy, dtype=np.uint8).sum(dtype=np.int64)),
                    int(np.frombuffer(dcb, dtype=np.uint8).sum(dtype=np.int64)),
                    int(np.frombuffer(dcr, dtype=np.uint8).sum(dtype=np.int64)),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "y_sum", "cb_sum", "cr_sum"],
            )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, schema)


# ---------------------------------------------------------------------------
# exact-substring dedup (suffix-array-style spans, Lee et al. ACL 2022)
# ---------------------------------------------------------------------------

def _exact_substring_spans_sql(n: int) -> str:
    """Shared DuckDB CTE chain replaying duplicated_spans exactly (same
    tokenization, same 60-bit md5 gram key, same maximal-span merge)."""
    return rf"""
    WITH w AS (SELECT doc_id, str_split_regex(text, '\s+') AS words FROM documents),
    g AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(words)-{n - 1}, 0)+1)) - 1 AS pos,
             unnest(list_transform(range(1, greatest(len(words)-{n - 1}, 0)+1),
                                   i -> array_to_string(words[i:i+{n - 1}], ' '))) AS ng
      FROM w
    ),
    k AS (SELECT doc_id, pos,
                 ('0x' || substr(md5('0|' || ng), 1, 15))::BIGINT AS kk
          FROM g),
    spread AS (
      SELECT kk FROM (SELECT DISTINCT doc_id, kk FROM k)
      GROUP BY kk HAVING count(*) >= 2
    ),
    hit AS (SELECT DISTINCT doc_id, pos FROM k JOIN spread USING (kk)),
    lagd AS (SELECT doc_id, pos,
                    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
             FROM hit),
    sp AS (SELECT doc_id, pos,
                  sum(CASE WHEN prev IS NULL OR pos - prev > {n} THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY pos) AS sid
           FROM lagd),
    spans AS (
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + {n - 1} AS BIGINT) AS span_end,
             CAST(max(pos) + {n} - min(pos) AS BIGINT) AS span_tokens
      FROM sp GROUP BY doc_id, sid
    )
    """


@register(
    "q_exact_substring_spans",
    oracle=_exact_substring_spans_sql(8)
    + "SELECT doc_id, span_start, span_end, span_tokens FROM spans",
    category="llm_dedup",
)
def q_exact_substring_spans(spark, sf_dir):
    """Exact-substring duplicate spans (word-8-gram granularity): the
    maximal token ranges a suffix-array exact deduplicator (Lee et al.,
    ACL 2022) would cut from each document because the text also appears
    in >= 2 documents.  One corpus-wide shuffle keyed on an 8-byte md5
    gram digest (not the gram string), one keyed per-doc window for the
    span merge — both scale linearly with corpus size."""
    from my_flink_1_10_2_spark.llm.dedup import duplicated_spans

    return duplicated_spans(read(spark, sf_dir, "documents"), n=8, min_docs=2)


@register(
    "q_exact_substring_coverage",
    oracle=_exact_substring_spans_sql(8)
    + """,
    cov AS (SELECT doc_id, sum(span_tokens) AS covered FROM spans GROUP BY doc_id)
    SELECT w.doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
           CAST(coalesce(covered, 0) AS BIGINT) AS covered_tokens,
           CAST(coalesce(covered, 0) * 1000000 // greatest(len(words), 1) AS BIGINT)
             AS cov_frac_e6
    FROM w LEFT JOIN cov USING (doc_id)""",
    category="llm_dedup",
)
def q_exact_substring_coverage(spark, sf_dir):
    """Per-document exact-substring duplicate coverage: tokens removable
    by exact dedup (union of maximal duplicated spans) as an exact count
    and exact 1e-6-unit fraction.  Every document appears (left join,
    zero-filled) — the corpus-wide removal-rate audit that gates an
    exact-dedup pass over a 100 TB crawl."""
    from my_flink_1_10_2_spark.llm.dedup import duplicated_coverage

    return duplicated_coverage(read(spark, sf_dir, "documents"), n=8, min_docs=2)


@register(
    "q_gopher_repetition",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, length(text) AS text_chars,
             len(str_split_regex(text, '\s+')) AS n_words
      FROM documents
    ),
    l AS (
      SELECT doc_id, l, count(*) AS c
      FROM (SELECT doc_id, unnest(str_split(text, chr(10))) AS l FROM documents)
      WHERE l != '' GROUP BY doc_id, l
    ),
    ls AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN c>=2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_lines,
             sum(c*length(l)) AS line_chars,
             sum(CASE WHEN c>=2 THEN c*length(l) ELSE 0 END) AS dup_line_chars
      FROM l GROUP BY doc_id
    ),
    w AS (SELECT doc_id, str_split_regex(text, '\s+') AS words FROM documents),
    g2 AS (
      SELECT doc_id, ng, count(*) AS c FROM (
        SELECT doc_id, unnest(list_transform(range(1, greatest(len(words)-1,0)+1),
               i -> array_to_string(words[i:i+1], ' '))) AS ng FROM w) t
      GROUP BY doc_id, ng
    ),
    top2 AS (
      SELECT doc_id, c AS top2_occurrences, c*length(ng) AS top2_chars
      FROM (SELECT doc_id, ng, c,
                   row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, ng ASC) rn
            FROM g2) t
      WHERE rn = 1
    ),
    g6 AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(words)-5,0)+1)) - 1 AS pos,
             unnest(list_transform(range(1, greatest(len(words)-5,0)+1),
                    i -> array_to_string(words[i:i+5], ' '))) AS ng
      FROM w
    ),
    rep6 AS (SELECT doc_id, ng FROM g6 GROUP BY doc_id, ng HAVING count(*) >= 2),
    hit6 AS (SELECT DISTINCT g6.doc_id, pos FROM g6 JOIN rep6 USING (doc_id, ng)),
    cov6 AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN prev IS NULL THEN 6 ELSE least(6, pos-prev) END)
                  AS BIGINT) AS dup6_covered_tokens
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM hit6) t
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           coalesce(n_lines, 0) AS n_lines,
           coalesce(n_dup_lines, 0) AS n_dup_lines,
           CAST(coalesce(n_dup_lines,0)*1000000 // greatest(coalesce(n_lines,0),1)
                AS BIGINT) AS dup_line_frac_e6,
           CAST(coalesce(dup_line_chars,0)*1000000
                // greatest(coalesce(line_chars,0),1) AS BIGINT)
             AS dup_line_char_frac_e6,
           CAST(coalesce(top2_occurrences,0) AS BIGINT) AS top2_occurrences,
           CAST(coalesce(top2_chars,0)*1000000 // greatest(text_chars,1) AS BIGINT)
             AS top2_char_frac_e6,
           coalesce(dup6_covered_tokens, 0) AS dup6_covered_tokens,
           CAST(coalesce(dup6_covered_tokens,0)*1000000 // greatest(n_words,1)
                AS BIGINT) AS dup6_tok_frac_e6
    FROM base b LEFT JOIN ls USING (doc_id) LEFT JOIN top2 USING (doc_id)
    LEFT JOIN cov6 USING (doc_id)
    """,
    category="llm_text",
)
def q_gopher_repetition(spark, sf_dir):
    """Gopher §A1.1 intra-document REPETITION signals (the half
    q_gopher_quality's static rules don't cover): duplicate-line instance
    and character fractions, the top word-2-gram's character share, and
    the word-6-gram repeated-span token coverage (union of overlapping
    spans, counted once).  All fractions exact 1e-6 integer units; every
    shuffle keyed on doc or (doc, value) — see
    llm/text.py::gopher_repetition."""
    from my_flink_1_10_2_spark.llm.text import gopher_repetition

    return gopher_repetition(read(spark, sf_dir, "documents"))


@register(
    "q_g711_wav_stats",
    oracle="""
    WITH v AS (
      SELECT doc_id,
             CAST(40 + (doc_id % 4) * 20 AS BIGINT) AS n,
             ((doc_id * 53) % 1024 - 512) * 61 AS amp
      FROM documents
    ),
    mu AS (
      SELECT doc_id, n, amp,
             CASE WHEN amp < 0 THEN -1 ELSE 1 END AS s,
             least(abs(amp), 32635) + 132 AS x
      FROM v
    ),
    mu2 AS (
      SELECT doc_id, n, amp, s, x,
             CASE WHEN x < 256 THEN 0 WHEN x < 512 THEN 1
                  WHEN x < 1024 THEN 2 WHEN x < 2048 THEN 3
                  WHEN x < 4096 THEN 4 WHEN x < 8192 THEN 5
                  WHEN x < 16384 THEN 6 ELSE 7 END AS e
      FROM mu
    ),
    mud AS (
      SELECT doc_id, n, amp,
             s * (((((x >> (e + 3)) & 15) * 8 + 132) << e) - 132) AS mu_dec
      FROM mu2
    ),
    al AS (
      SELECT doc_id, CAST(floor(amp / 8.0) AS BIGINT) AS p0 FROM v
    ),
    al2 AS (
      SELECT doc_id, p0,
             CASE WHEN p0 >= 0 THEN p0 ELSE -p0 - 1 END AS pm
      FROM al
    ),
    al3 AS (
      SELECT doc_id, p0, pm,
             CASE WHEN pm <= 31 THEN 0 WHEN pm <= 63 THEN 1
                  WHEN pm <= 127 THEN 2 WHEN pm <= 255 THEN 3
                  WHEN pm <= 511 THEN 4 WHEN pm <= 1023 THEN 5
                  WHEN pm <= 2047 THEN 6 WHEN pm <= 4095 THEN 7
                  ELSE 8 END AS seg
      FROM al2
    ),
    ald AS (
      SELECT doc_id,
             CASE WHEN p0 >= 0 THEN 1 ELSE -1 END
             * CASE WHEN seg >= 8 THEN 32256
                    WHEN seg = 0 THEN (((pm >> 1) & 15) << 4) + 8
                    WHEN seg = 1 THEN (((pm >> 1) & 15) << 4) + 264
                    ELSE ((((pm >> seg) & 15) << 4) + 264) << (seg - 1)
               END AS al_dec
      FROM al3
    )
    SELECT m.doc_id AS media_id, m.n AS n_samples,
           CAST(m.mu_dec AS BIGINT) AS mu_dec,
           CAST(a.al_dec AS BIGINT) AS al_dec,
           CAST(m.n * m.mu_dec AS BIGINT) AS mu_sum,
           CAST(m.n * a.al_dec AS BIGINT) AS al_sum
    FROM mud m JOIN ald a USING (doc_id)
    """,
    category="llm_multimodal",
)
def q_g711_wav_stats(spark, sf_dir):
    """REAL G.711 mu-law AND A-law decode (llm/wav.py tags 7/6, the
    public ITU-T G.711 / Sun g711.c algorithm): per-document
    constant-amplitude PCM is companded into both WAV containers
    executor-side — fmt/fact/data chunks, per-byte segment+mantissa
    decode — and the decoded stats must equal the oracle's closed-form
    replay of the quantization (segment thresholds, mantissa shifts,
    bias) for both laws.  The closed forms were verified exhaustively
    against the codec for all 65536 16-bit inputs (tests); a defect in
    either compander or the container framing mismatches."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.wav import wav_decode, wav_encode_g711

    schema = (
        "media_id long, n_samples long, mu_dec long, al_dec long, "
        "mu_sum long, al_sum long"
    )

    def batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 40 + (d % 4) * 20
                amp = ((d * 53) % 1024 - 512) * 61
                out = {}
                for law, tag in (("mu", 7), ("a", 6)):
                    payload = wav_encode_g711([amp] * n, law=law,
                                              sample_rate=8000)
                    rate, channels, bits, dec = wav_decode(payload)
                    if (rate, channels, bits, len(dec)) != (8000, 1, 16, n):
                        raise ValueError("G.711 container metadata mismatch")
                    if min(dec) != max(dec):
                        raise ValueError("constant signal must decode constant")
                    out[law] = (dec[0], sum(dec))
                rows.append((d, n, out["mu"][0], out["a"][0],
                             out["mu"][1], out["a"][1]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "mu_dec", "al_dec",
                         "mu_sum", "al_sum"],
            )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(batches, schema)


@register(
    "q_kneser_ney_score",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      FROM tok WHERE len(t) >= 2),
    bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx,
                   CAST(count(*) AS BIGINT) AS n1p_fwd
            FROM bgc GROUP BY w1),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd FROM bgc GROUP BY w2),
    types AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bgc),
    lp AS (
      SELECT bgc.w1, bgc.w2,
             CAST(round(ln(
               greatest(CAST(c_bg AS DOUBLE) - 0.75, 0.0) / c_ctx
               + (0.75 * (CAST(n1p_fwd AS DOUBLE) / c_ctx))
                 * (CAST(n1p_bwd AS DOUBLE) / n_types)
             ) * 1000000) AS BIGINT) AS lp_i
      FROM bgc
        JOIN ctx ON ctx.w1 = bgc.w1
        JOIN cont ON cont.w2 = bgc.w2
        CROSS JOIN types)
    SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(lp_i) AS DOUBLE) / (count(*) * 1000000.0), 6) AS kn_score
    FROM bg JOIN lp ON lp.w1 = bg.w1 AND lp.w2 = bg.w2
    WHERE bg.doc_id % 7 = 0
    GROUP BY bg.doc_id
    """,
    category="llm_text",
)
def q_kneser_ney_score(spark, sf_dir):
    """Interpolated Kneser-Ney bigram score per document (Chen & Goodman
    1998 eq. 4.19, absolute discount D=0.75) — the perplexity filter the
    CCNet/KenLM recipe actually ships, one smoothing class above
    q_bigram_backoff_score's fixed interpolation:

        P_KN(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 ·)
                      + (D · N1+(w1 ·) / c(w1 ·)) · N1+(· w2) / N1+(· ·)

    so the backoff mass is the CONTINUATION probability (how many
    distinct contexts a word follows), not raw frequency — the property
    that stops "Francisco" outscoring "glasses" after "pair of".

    Float discipline: all model statistics are exact integer counts off
    one bigram-type relation; each bigram type's log-prob quantizes once
    to 1e-6 integer units via an identically-shaped IEEE expression on
    both engines; per-doc sums are exact bigints divided once.
    100 TB shape: one tokenize scan -> bigram-type partial-agg shuffle ->
    two tiny derived aggregates (per-w1, per-w2) joined back hash-to-hash
    -> per-doc aggregate.  The model tables are vocabulary-sized, the
    corpus stream is touched twice, no windows, no driver state.

    Ref parity: flink-examples streaming wordcount-style two-level agg
    (ref: flink-examples/flink-examples-streaming/src/main/java/org/
    apache/flink/streaming/examples/wordcount/WordCount.java) lifted to
    an LM-smoothing pipeline.
    """
    from my_flink_1_10_2_spark.operators.hints import dim

    docs = read(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    tok = docs.select("doc_id", toks.alias("t"))
    pair_idx = F.sequence(F.lit(0), F.size("t") - 2)
    bg = (
        tok.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # the bigram-TYPE relation is vocabulary²-bounded (the docstring's
    # "model tables"); checkpoint it lazily so the context/continuation/
    # type aggregates and the scoring join all reuse ONE corpus explode +
    # bigram shuffle (Spark shares no identical subtrees — this plan
    # previously re-ran the corpus pass four times)
    bgc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .localCheckpoint(eager=False)
    )
    ctx = bgc.groupBy("w1").agg(
        F.sum("c_bg").alias("c_ctx"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cont = bgc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    types = bgc.agg(F.count(F.lit(1)).alias("n_types"))
    lp = (
        bgc.join(ctx, "w1")
        .join(cont, "w2")
        .join(dim(types))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    F.greatest(F.col("c_bg").cast("double") - 0.75, F.lit(0.0))
                    / F.col("c_ctx")
                    + (F.lit(0.75) * (F.col("n1p_fwd").cast("double") / F.col("c_ctx")))
                    * (F.col("n1p_bwd").cast("double") / F.col("n_types"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lp_i"),
        )
    )
    scored = bg.where(F.col("doc_id") % 7 == 0).join(lp, ["w1", "w2"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum("lp_i").cast("double") / (F.count(F.lit(1)) * F.lit(1e6)), 6
        ).alias("kn_score"),
    )


@register(
    "q_temperature_mixture",
    oracle=r"""
    WITH src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    mx AS (SELECT CAST(max(n_docs) AS BIGINT) AS n_max FROM src),
    rates AS (
      SELECT source, n_docs,
             CAST(round(1000000.0 * pow(CAST(n_docs AS DOUBLE) / n_max, 0.3))
                  AS BIGINT) AS keep_ppm
      FROM src CROSS JOIN mx),
    kept AS (
      SELECT d.source, d.n_chars
      FROM documents d JOIN rates r ON r.source = d.source
      WHERE ('0x' || substr(md5('tmix|' || CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT
              % 1000000 < r.keep_ppm)
    SELECT r.source, r.n_docs, r.keep_ppm,
           CAST(count(k.source) AS BIGINT) AS n_sampled,
           CAST(coalesce(sum(k.n_chars), 0) AS BIGINT) AS sampled_chars
    FROM rates r LEFT JOIN kept k ON k.source = r.source
    GROUP BY r.source, r.n_docs, r.keep_ppm
    """,
    category="pipeline",
)
def q_temperature_mixture(spark, sf_dir):
    """Temperature-scaled mixture sampling (alpha = 0.3, the
    multilingual-corpus rebalancing rule of XLM-R / mT5: sample source i
    with probability proportional to n_i^alpha, so head sources are
    downsampled and tail sources kept whole).  Rates are normalized so
    the largest source keeps rate 1.0, then quantized to integer parts
    per million; membership is a deterministic md5 bucket of doc_id —
    re-runs and task retries reproduce the identical sample (unlike RNG
    sampling).

    Float discipline: the ONLY float op is one pow per source, rounded
    once to ppm; everything downstream is integer-exact.
    100 TB shape: one column-pruned scan for per-source counts (a
    handful of rows), broadcast the rate table back onto the corpus
    stream, scan-time filter, per-source partial agg.  No windows, no
    driver state beyond the source-cardinality rate table."""
    from my_flink_1_10_2_spark.operators.hints import dim

    docs = read(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    mx = src.agg(F.max("n_docs").alias("n_max"))
    rates = src.join(dim(mx)).select(
        "source",
        "n_docs",
        F.round(
            F.lit(1e6) * F.pow(F.col("n_docs").cast("double") / F.col("n_max"), 0.3)
        )
        .cast("bigint")
        .alias("keep_ppm"),
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("tmix|"), F.col("doc_id").cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(1000000),
    )
    kept = (
        docs.select("source", "n_chars", bucket.alias("__b"))
        .join(dim(rates.select("source", "keep_ppm")), "source")
        .where(F.col("__b") < F.col("keep_ppm"))
        .select("source", "n_chars")
    )
    agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("n_chars").cast("bigint").alias("sampled_chars"),
    )
    return rates.join(agg, "source", "left").select(
        "source",
        "n_docs",
        "keep_ppm",
        F.coalesce(F.col("n_sampled"), F.lit(0)).cast("bigint").alias("n_sampled"),
        F.coalesce(F.col("sampled_chars"), F.lit(0))
        .cast("bigint")
        .alias("sampled_chars"),
    )


def _semdedup_oracle(n_centroids: int = 8, threshold: float = 0.30, scale: int = 1000) -> str:
    """Replay of SemDeDup pruning: the fixed-centroid integer-exact
    assignment (identical CTEs to _semantic_neardup_oracle), within-
    cluster pairs over the exact threshold, drop = every pair's higher
    vec_id, then a per-cluster retention report."""
    score = "-(list_dot_product(vi, cv) / sqrt(list_dot_product(cv, cv)))"
    return f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * {scale})) AS vi
      FROM embeddings
    ),
    cents AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, vi AS cv
      FROM (SELECT vec_id, vi FROM corpus ORDER BY vec_id LIMIT {n_centroids})
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, c AS centroid FROM (
        SELECT corpus.vec_id, cents.c,
               row_number() OVER (PARTITION BY corpus.vec_id
                 ORDER BY {score}, c) AS rn
        FROM corpus CROSS JOIN cents) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst, a.centroid
      FROM assign a
        JOIN assign b ON a.centroid = b.centroid AND a.vec_id < b.vec_id
        JOIN corpus va ON va.vec_id = a.vec_id
        JOIN corpus vb ON vb.vec_id = b.vec_id
      WHERE list_cosine_similarity(va.v, vb.v) >= {threshold}
    ),
    sizes AS (SELECT centroid, CAST(count(*) AS BIGINT) AS n_vectors
              FROM assign GROUP BY centroid),
    dr AS (SELECT centroid, CAST(count(DISTINCT dst) AS BIGINT) AS n_dropped
           FROM pairs GROUP BY centroid)
    SELECT CAST(s.centroid AS BIGINT) AS centroid, s.n_vectors,
           CAST(coalesce(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
           CAST(s.n_vectors - coalesce(dr.n_dropped, 0) AS BIGINT) AS n_kept
    FROM sizes s LEFT JOIN dr ON dr.centroid = s.centroid
    """


@register(
    "q_semdedup_prune",
    oracle=_semdedup_oracle(),
    category="llm_dedup",
)
def q_semdedup_prune(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings with a coarse quantizer,
    then PRUNING — within each cluster, any vector whose cosine to a
    lower-id cluster-mate clears the threshold is dropped, keeping one
    representative per semantic-duplicate group.  This is the decision
    layer above q_semantic_neardup_ivf's pair stream: the output is the
    per-cluster retention report a curation run ships (cluster size,
    dropped, kept).

    Determinism: the keep rule is purely ordinal (smallest vec_id per
    duplicate pair survives), the quantizer is integer-exact, and the
    only float comparison is the same exact-cosine threshold the graded
    pair operator uses — the whole prune replays in SQL.
    100 TB shape: one shuffle keyed on centroid; pair arithmetic is
    sum-of-cluster-size² (the SemDeDup paper's point — clusters bound
    the blowup); the report is cluster-cardinality-sized."""
    from my_flink_1_10_2_spark.llm.similarity import (
        _assign_int,
        int_vec,
        kmeans_centroids_int,
    )

    emb = read(spark, sf_dir, "embeddings")
    cents = kmeans_centroids_int(emb, 8, iterations=0, scale=1000)
    bucketed = _assign_int(
        emb.withColumn("__vi", int_vec(F.col("embedding"), 1000)), cents
    ).drop("__vi")
    sizes = bucketed.groupBy("centroid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    pairs = D.semantic_neardup_pairs_ivf(emb, threshold=0.30, n_centroids=8)
    dr = pairs.groupBy("centroid").agg(
        F.countDistinct("dst").cast("bigint").alias("n_dropped")
    )
    return sizes.join(dr, "centroid", "left").select(
        F.col("centroid").cast("bigint").alias("centroid"),
        "n_vectors",
        F.coalesce(F.col("n_dropped"), F.lit(0)).cast("bigint").alias("n_dropped"),
        (F.col("n_vectors") - F.coalesce(F.col("n_dropped"), F.lit(0)))
        .cast("bigint")
        .alias("n_kept"),
    )


@register(
    "q_y4m_video_stats",
    oracle="""
    WITH geo AS (
      SELECT doc_id AS d,
             2 * (2 + doc_id % 3) AS w,
             2 * (2 + doc_id % 2) AS h,
             3 + doc_id % 4 AS nf
      FROM documents
    ),
    geo2 AS (
      SELECT d, w, h, nf, w * h AS ysz,
             CASE WHEN d % 2 = 0 THEN (w // 2) * (h // 2) ELSE w * h END AS csz
      FROM geo
    ),
    sf AS (SELECT d, ysz, csz, unnest(range(0, nf, 2)) AS f FROM geo2),
    ys AS (
      SELECT d, CAST(sum((d*13 + f*31 + i*7) % 256) AS BIGINT) AS y_sum,
             CAST(min((d*13 + f*31 + i*7) % 256) AS BIGINT) AS y_min,
             CAST(max((d*13 + f*31 + i*7) % 256) AS BIGINT) AS y_max
      FROM (SELECT d, f, unnest(range(ysz)) AS i FROM sf) GROUP BY d
    ),
    us AS (
      SELECT d, CAST(sum((d*5 + f*11 + i*3) % 256) AS BIGINT) AS u_sum
      FROM (SELECT d, f, unnest(range(csz)) AS i FROM sf) GROUP BY d
    ),
    vs AS (
      SELECT d, CAST(sum((d*3 + f*17 + i*5) % 256) AS BIGINT) AS v_sum
      FROM (SELECT d, f, unnest(range(csz)) AS i FROM sf) GROUP BY d
    )
    SELECT geo2.d AS media_id,
           CAST(geo2.nf AS BIGINT) AS n_frames,
           CAST((geo2.nf + 1) // 2 AS BIGINT) AS n_sampled,
           ys.y_sum, ys.y_min, ys.y_max, us.u_sum, vs.v_sum
    FROM geo2 JOIN ys ON ys.d = geo2.d
      JOIN us ON us.d = geo2.d JOIN vs ON vs.d = geo2.d
    """,
    category="llm_multimodal",
)
def q_y4m_video_stats(spark, sf_dir):
    """YUV4MPEG2 raw-video container graded end to end (llm/y4m.py):
    per-document .y4m streams of closed-form planar frames are ENCODED
    executor-side (even docs 4:2:0 subsampled chroma, odd docs 4:4:4 —
    both plane geometries exercised), every SECOND frame is kept by the
    decoder's sampling contract (skipped frames seeked past, never
    materialized), and the decoded plane statistics must match the SQL
    replay of the pixel recipe bitwise.  A defect anywhere in the
    header/param parse, FRAME framing, plane slicing, or subsampling
    arithmetic mismatches the oracle.  Arrow mapInPandas, per-video
    parallel — linear scale-out like the other codec operators."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.y4m import y4m_decode, y4m_encode

    def batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 2 * (2 + d % 3), 2 * (2 + d % 2)
                nf = 3 + d % 4
                chroma = "420jpeg" if d % 2 == 0 else "444"
                csz = (w // 2) * (h // 2) if d % 2 == 0 else w * h
                frames = [
                    (
                        bytes((d * 13 + f * 31 + i * 7) % 256 for i in range(w * h)),
                        bytes((d * 5 + f * 11 + i * 3) % 256 for i in range(csz)),
                        bytes((d * 3 + f * 17 + i * 5) % 256 for i in range(csz)),
                    )
                    for f in range(nf)
                ]
                payload = y4m_encode(w, h, frames, chroma=chroma)
                dw, dh, dc, n_total, sampled = y4m_decode(payload, every=2)
                if (dw, dh, dc, n_total) != (w, h, chroma, nf):
                    raise ValueError("y4m metadata did not roundtrip")
                ycat = b"".join(s[0] for s in sampled)
                rows.append(
                    (
                        d, nf, len(sampled),
                        sum(ycat), min(ycat), max(ycat),
                        sum(sum(s[1]) for s in sampled),
                        sum(sum(s[2]) for s in sampled),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "n_frames", "n_sampled",
                        "y_sum", "y_min", "y_max", "u_sum", "v_sum",
                    ],
                )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(
        batches,
        "media_id long, n_frames long, n_sampled long, y_sum long, "
        "y_min long, y_max long, u_sum long, v_sum long",
    )


@register(
    "q_hard_negatives_blas",
    oracle="""
    WITH a AS (SELECT vec_id AS anchor_id, label AS a_label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS a_vec
               FROM embeddings WHERE vec_id % 25 = 0),
    scored AS (
      SELECT a.anchor_id, e.vec_id,
             list_cosine_similarity(a.a_vec,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
      FROM embeddings e CROSS JOIN a
      WHERE e.label <> a.a_label AND e.vec_id <> a.anchor_id
    )
    SELECT anchor_id, vec_id, round(sim, 9) AS sim, rank FROM (
      SELECT anchor_id, vec_id, sim,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    category="llm_similarity",
)
def q_hard_negatives_blas(spark, sf_dir):
    """Hard-negative mining, single-kernel variant (DPR / Contriever
    recipe): for each anchor embedding, the 3 most-similar vectors with
    a DIFFERENT label.  Complements q_hard_negative_mining (which loops
    per label group, one top-k retrieval per label): here the label
    constraint lives INSIDE one scoring kernel (llm/similarity.py::
    hard_negatives) — a single corpus pass for ALL labels, no
    label-domain driver loop, which is the shape to prefer when the
    label domain is large.  Filtering an unlabeled top-k afterwards
    would return negatives among the best, not the best among
    negatives.
    Anchor matrix broadcast, corpus streamed through one BLAS matmul
    per Arrow batch, partition-local top-k — the corpus never joins
    against itself, so the same plan holds when the corpus is 100 TB
    and the anchor set is training-batch-sized."""
    emb = read(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") % 25 == 0)
    out = S.hard_negatives(emb, anchors, k=3)
    return out.withColumn("sim", F.round("sim", 9))


@register(
    "q_gif_anim_stats",
    oracle="""
    WITH geo AS (
      SELECT doc_id AS d,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h,
             2 + doc_id % 3 AS nf
      FROM documents
    ),
    px AS (
      SELECT d, nf, (d + f*5 + i*3) % 8 AS j
      FROM (SELECT d, nf, w, h, unnest(range(0, nf, 2)) AS f FROM geo),
           LATERAL (SELECT unnest(range(w * h)) AS i)
    )
    SELECT d AS media_id,
           CAST(nf AS BIGINT) AS n_frames,
           CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
           CAST(sum(j) AS BIGINT) AS idx_sum,
           CAST(sum((d*11 + j*29) % 256) AS BIGINT) AS r_sum,
           CAST(sum((d*17 + j*13) % 256) AS BIGINT) AS g_sum,
           CAST(sum((d*7 + j*37) % 256) AS BIGINT) AS b_sum
    FROM px GROUP BY d, nf
    """,
    category="llm_multimodal",
)
def q_gif_anim_stats(spark, sf_dir):
    """GIF89a animation codec graded end to end (llm/gif.py: REAL LZW
    with variable code widths, CLEAR/EOI, 4096-entry resets, plus the
    4-pass interlace — odd docs encode interlaced, even docs
    sequential).  Per-document animations of closed-form palette frames
    are encoded AND decoded executor-side; every second frame of the
    decode feeds palette-mapped RGB sums that must match the SQL replay
    of the pixel recipe bitwise.  A defect anywhere in the LZW bit
    packing, sub-block framing, palette layout, or interlace ordering
    mismatches the oracle.  Arrow mapInPandas, per-image parallel —
    the same linear scale-out as the PNG/JPEG/Y4M codec operators."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.gif import gif_decode, gif_encode

    def batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, nf = 4 + d % 5, 3 + d % 4, 2 + d % 3
                palette = [
                    ((d*11 + j*29) % 256, (d*17 + j*13) % 256, (d*7 + j*37) % 256)
                    for j in range(8)
                ]
                frames = [
                    bytes((d + f*5 + i*3) % 8 for i in range(w * h))
                    for f in range(nf)
                ]
                payload = gif_encode(
                    w, h, frames, palette, interlace=bool(d % 2)
                )
                dw, dh, dpal, dframes = gif_decode(payload)
                if (dw, dh, len(dframes)) != (w, h, nf):
                    raise ValueError("GIF metadata did not roundtrip")
                sampled = dframes[::2]
                idx_sum = r_sum = g_sum = b_sum = 0
                for fr in sampled:
                    for j in fr:
                        idx_sum += j
                        r, g, b = dpal[j]
                        r_sum += r
                        g_sum += g
                        b_sum += b
                rows.append(
                    (d, nf, len(sampled), idx_sum, r_sum, g_sum, b_sum)
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "n_frames", "n_sampled",
                        "idx_sum", "r_sum", "g_sum", "b_sum",
                    ],
                )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(
        batches,
        "media_id long, n_frames long, n_sampled long, idx_sum long, "
        "r_sum long, g_sum long, b_sum long",
    )


@register(
    "q_winnowing_fingerprints",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(range(len(t) - 3)) AS pos,
             list_transform(range(len(t) - 3),
                            i -> array_to_string(list_slice(t, i + 1, i + 4), ' ')) AS gs
      FROM toks WHERE len(t) >= 4),
    keyed AS (
      SELECT doc_id, pos,
             ('0x' || substr(md5(gs[pos + 1]), 1, 10))::BIGINT * 1048576
               + (1048575 - pos) AS key
      FROM grams),
    wins AS (
      SELECT doc_id, pos,
             min(key) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sel,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM keyed),
    selected AS (
      SELECT DISTINCT doc_id, sel FROM wins WHERE rn >= 5),
    ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM keyed GROUP BY doc_id),
    fp AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
             CAST(sum(sel // 1048576) AS BIGINT) AS fp_hash_sum
      FROM selected GROUP BY doc_id)
    SELECT ng.doc_id, ng.n_grams, fp.n_fps, fp.fp_hash_sum
    FROM ng JOIN fp ON fp.doc_id = ng.doc_id
    """,
    category="llm_dedup",
)
def q_winnowing_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD 2003 —
    the MOSS scheme): 4-word-gram hashes, window-5 local minima with the
    rightmost-tie rule, selected via ONE integer window-min over a
    hash+inverted-position packed key.  Guarantees any >= 8-token shared
    substring between documents shares a fingerprint, at ~1/3 the
    density of all-grams — the positional dedup index between exact
    rolling hashes (q_fingerprint) and full exact-substring spans
    (q_exact_substring_spans).  Keyed per-document windows only; the
    oracle replays the identical packing arithmetic."""
    out = D.winnowing_fingerprints(read(spark, sf_dir, "documents"))
    return out


_MULTISCAN_PATTERNS = ["a", "an", "scan", "table", "agg", "fast value"]


@register(
    "q_blocklist_multiscan",
    oracle="""
    SELECT doc_id, pattern,
           CAST((strlen(text) - strlen(replace(text, pattern, '')))
                // strlen(pattern) AS BIGINT) AS n_matches
    FROM documents,
         unnest(['a', 'an', 'scan', 'table', 'agg', 'fast value']) AS p(pattern)
    """,
    category="llm_text",
)
def q_blocklist_multiscan(spark, sf_dir):
    """Aho-Corasick multi-pattern scan (Aho & Corasick, CACM 1975 — the
    one-pass blocklist matcher): per-(document, pattern) occurrence
    counts for 6 patterns in a SINGLE automaton pass per document,
    O(doc + matches) regardless of pattern count.  The pattern set nests
    ('an' inside 'scan', 'a' inside everything) so the output/failure
    links are on the graded path, and every pattern is border-free so
    same-pattern occurrences cannot overlap — which makes the oracle's
    replace-arithmetic count exact.  Arrow mapInPandas, automaton built
    once per worker; at 100 TB the blocklist is the broadcast-sized
    side and the corpus streams through one scan."""
    from my_flink_1_10_2_spark.llm.multiscan import multiscan_counts

    docs = read(spark, sf_dir, "documents")
    return multiscan_counts(docs, _MULTISCAN_PATTERNS)


@register(
    "q_set_similarity_join",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(t, i, i + 2), ' ') AS tok
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks
            WHERE len(t) >= 3)),
    dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY tok),
    ordered AS (
      SELECT s.doc_id,
             array_agg(s.tok ORDER BY d.df, s.tok) AS toks,
             CAST(count(*) AS BIGINT) AS sz
      FROM sh s JOIN dfq d ON d.tok = s.tok GROUP BY s.doc_id),
    prefixes AS (
      SELECT doc_id AS pid, toks, sz,
             unnest(list_slice(toks, 1, sz - CAST(ceil(sz * 0.5) AS BIGINT) + 1))
               AS ptok
      FROM ordered),
    cand AS (
      SELECT a.pid AS src, b.pid AS dst,
             a.toks AS a_toks, b.toks AS b_toks, a.sz AS a_sz, b.sz AS b_sz
      FROM prefixes a JOIN prefixes b ON a.ptok = b.ptok AND a.pid < b.pid)
    SELECT DISTINCT src, dst,
           round(CAST(len(list_intersect(a_toks, b_toks)) AS DOUBLE)
                 / (a_sz + b_sz - len(list_intersect(a_toks, b_toks))), 9)
             AS jaccard
    FROM cand
    WHERE CAST(len(list_intersect(a_toks, b_toks)) AS DOUBLE)
          / (a_sz + b_sz - len(list_intersect(a_toks, b_toks))) >= 0.5
    """,
    category="llm_dedup",
)
def q_set_similarity_join(spark, sf_dir):
    """All-pairs set-similarity self-join with prefix filtering
    (ICDE 2006 / the WWW 2007 all-pairs recipe; see
    llm/dedup.py::set_similarity_join): exact 3-gram-shingle Jaccard
    >= 0.5 pairs WITHOUT a cross join — candidates only through an
    equi-join on rarest-first prefix shingles, whose length
    |x| - ceil(t·|x|) + 1 is what bounds the candidate set.  This is
    the exact-verification complement to MinHash-LSH
    (q_minhash_lsh_pairs): same problem, zero false negatives, prefix
    filter instead of probabilistic bands.  The oracle replays the
    identical ordering, prefix arithmetic, and verification."""
    out = D.set_similarity_join(read(spark, sf_dir, "documents"), threshold=0.5)
    return out


def _greedy_gen_oracle(steps: int = 8) -> str:
    """Unrolled argmax walk: s0 = the corpus's most frequent token; each
    s{i+1} = argmax_w2 c(s{i}, w2), ties to the lexicographically
    smallest w2."""
    ctes = [
        r"""tok AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents)""",
        """uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w)""",
        """bgc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
               unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
        FROM tok WHERE len(t) >= 2) GROUP BY w1, w2)""",
        """amax AS (
      SELECT w1, w2 AS nxt, c FROM (
        SELECT w1, w2, c,
               row_number() OVER (PARTITION BY w1 ORDER BY c DESC, w2) AS rn
        FROM bgc) WHERE rn = 1)""",
        """s0 AS (
      SELECT 0 AS step, w AS token, c AS cnt FROM (
        SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rn
        FROM uni) WHERE rn = 1)""",
    ]
    for i in range(steps):
        ctes.append(
            f"""s{i + 1} AS (
      SELECT {i + 1} AS step, a.nxt AS token, a.c AS cnt
      FROM s{i} JOIN amax a ON a.w1 = s{i}.token)"""
        )
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(steps + 1)
    )
    return f"""
    WITH {','.join(ctes)}
    SELECT step, token, cnt FROM ({union}) ORDER BY step
    """


@register(
    "q_greedy_generation",
    oracle=_greedy_gen_oracle(),
    category="llm_text",
)
def q_greedy_generation(spark, sf_dir):
    """Greedy (argmax) decoding from the corpus's own bigram LM: start
    at the most frequent token and take 8 steps of
    next = argmax_w2 c(cur, w2) (ties to the smallest w2) — the
    deterministic decode loop that closes the train->score->GENERATE
    triangle the scoring operators (q_unigram_logprob,
    q_kneser_ney_score) leave open.  The per-context argmax relation is
    vocabulary-sized (one groupBy + per-key top-1); the 8-step walk is
    8 joins against that broadcast-sized relation — no corpus rescan
    per step.  The oracle unrolls the identical walk as 8 chained CTEs.
    Output: (step, token, cnt) where cnt is the supporting count."""
    from my_flink_1_10_2_spark.operators.hints import dim
    from my_flink_1_10_2_spark.operators.rank import top_n

    docs = read(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    tok = docs.select(toks.alias("t"))
    uni = (
        tok.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    bg = tok.where(F.size("t") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    amax = (
        top_n(bgc, ["w1"], [F.col("c").desc(), F.col("w2")], 1, ascending=True,
              rank_col=None)
        .select("w1", F.col("w2").alias("nxt"), "c")
    )
    seed = (
        uni.orderBy(F.col("c").desc(), "w")
        .limit(1)
        .select(F.lit(0).cast("int").alias("step"), F.col("w").alias("token"),
                F.col("c").alias("cnt"))
    )
    steps = [seed]
    cur = seed
    for i in range(8):
        cur = (
            cur.select(F.col("token").alias("w1"))
            .join(dim(amax), "w1")
            .select(
                F.lit(i + 1).cast("int").alias("step"),
                F.col("nxt").alias("token"),
                F.col("c").alias("cnt"),
            )
        )
        steps.append(cur)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionAll(s)
    return out.select(
        F.col("step").cast("bigint").alias("step"), "token", "cnt"
    )


@register(
    "q_bmp_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS media_id,
             CAST(5 + doc_id % 6 AS BIGINT) AS width,
             CAST(4 + doc_id % 4 AS BIGINT) AS height,
             i, doc_id AS d
      FROM (SELECT doc_id,
                   unnest(range((5 + doc_id % 6) * (4 + doc_id % 4))) AS i
            FROM documents)
    )
    SELECT media_id, width, height,
           CAST(sum((d*7 + i*13) % 256) AS BIGINT) AS r_sum,
           CAST(sum((d*3 + i*5) % 256) AS BIGINT) AS g_sum,
           CAST(sum((d*11 + i*17) % 256) AS BIGINT) AS b_sum,
           CAST(min((d*7 + i*13) % 256) AS BIGINT) AS r_min,
           CAST(max((d*7 + i*13) % 256) AS BIGINT) AS r_max
    FROM px GROUP BY media_id, width, height
    """,
    category="llm_multimodal",
)
def q_bmp_pixel_stats(spark, sf_dir):
    """BMP/DIB codec graded end to end (llm/bmp.py: 24-bit BI_RGB,
    bottom-up BGR rows, 4-byte row padding — the layout every legacy
    scanner/OCR corpus ships): per-document bitmaps of closed-form RGB
    pixels are encoded AND decoded executor-side (odd widths exercise
    the row padding; the BGR swap and bottom-up inversion are both on
    the graded path) and the decoded channel statistics must match the
    SQL replay of the pixel recipe bitwise.  Fourth independent image
    container over the same grading harness (PNG/JPEG/GIF/BMP)."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.bmp import bmp_decode, bmp_encode

    def batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 5 + d % 6, 4 + d % 4
                img = [
                    bytes(
                        v
                        for x in range(w)
                        for v in (
                            (d*7 + (y*w + x)*13) % 256,
                            (d*3 + (y*w + x)*5) % 256,
                            (d*11 + (y*w + x)*17) % 256,
                        )
                    )
                    for y in range(h)
                ]
                payload = bmp_encode(w, h, img)
                dw, dh, dec = bmp_decode(payload)
                if (dw, dh) != (w, h) or dec != img:
                    raise ValueError("BMP roundtrip mismatch")
                rs = [v for row in dec for v in row[0::3]]
                gs = [v for row in dec for v in row[1::3]]
                bs = [v for row in dec for v in row[2::3]]
                rows.append(
                    (d, w, h, sum(rs), sum(gs), sum(bs), min(rs), max(rs))
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "width", "height",
                        "r_sum", "g_sum", "b_sum", "r_min", "r_max",
                    ],
                )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(
        batches,
        "media_id long, width long, height long, r_sum long, g_sum long, "
        "b_sum long, r_min long, r_max long",
    )


@register(
    "q_tiff_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 7 AS BIGINT) AS width,
             CAST(3 + doc_id % 5 AS BIGINT) AS height,
             i, doc_id AS d
      FROM (SELECT doc_id,
                   unnest(range((4 + doc_id % 7) * (3 + doc_id % 5))) AS i
            FROM documents)
    )
    SELECT media_id, width, height,
           CAST(sum((d*5 + i*19) % 256) AS BIGINT) AS r_sum,
           CAST(sum((d*13 + (i // 4)*7) % 256) AS BIGINT) AS g_sum,
           CAST(sum((d + i*23) % 256) AS BIGINT) AS b_sum
    FROM px GROUP BY media_id, width, height
    """,
    category="llm_multimodal",
)
def q_tiff_pixel_stats(spark, sf_dir):
    """TIFF codec graded end to end (llm/tiff.py: TIFF 6.0 IFD tag walk
    + strip-based RGB + REAL PackBits RLE): per-document images of
    closed-form pixels are encoded with PackBits compression in 4-row
    strips (the green channel recipe repeats every 4 pixels, forcing
    genuine RLE runs through the compressor) and decoded back; channel
    statistics must match the SQL replay bitwise.  Fifth independent
    image container over the same harness (PNG/JPEG/GIF/BMP/TIFF), and
    the first with a tag-directory structure: a defect in the IFD
    offsets, strip accounting, or run-length coding mismatches the
    oracle."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.tiff import tiff_decode, tiff_encode

    def batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 7, 3 + d % 5
                img = [
                    bytes(
                        v
                        for x in range(w)
                        for v in (
                            (d*5 + (y*w + x)*19) % 256,
                            (d*13 + ((y*w + x) // 4)*7) % 256,
                            (d + (y*w + x)*23) % 256,
                        )
                    )
                    for y in range(h)
                ]
                payload = tiff_encode(w, h, img, compression="packbits",
                                      rows_per_strip=4)
                dw, dh, dec = tiff_decode(payload)
                if (dw, dh) != (w, h) or dec != img:
                    raise ValueError("TIFF roundtrip mismatch")
                rs = sum(v for row in dec for v in row[0::3])
                gs = sum(v for row in dec for v in row[1::3])
                bs = sum(v for row in dec for v in row[2::3])
                rows.append((d, w, h, rs, gs, bs))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "width", "height",
                             "r_sum", "g_sum", "b_sum"],
                )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(
        batches,
        "media_id long, width long, height long, "
        "r_sum long, g_sum long, b_sum long",
    )


@register(
    "q_aiff_audio_stats",
    oracle="""
    WITH s AS (
      SELECT doc_id AS media_id,
             CAST(30 + doc_id % 50 AS BIGINT) AS n_samples,
             ((doc_id * 37 + i * 11) % 4096 - 2048) AS v
      FROM (SELECT doc_id, unnest(range(30 + doc_id % 50)) AS i
            FROM documents)
    )
    SELECT media_id, n_samples,
           CAST(sum(v) AS BIGINT) AS sample_sum,
           CAST(min(v) AS BIGINT) AS sample_min,
           CAST(max(v) AS BIGINT) AS sample_max,
           CAST(sum(abs(v)) AS BIGINT) AS abs_sum
    FROM s GROUP BY media_id, n_samples
    """,
    category="llm_multimodal",
)
def q_aiff_audio_stats(spark, sf_dir):
    """AIFF codec graded end to end (llm/aiff.py: IFF chunk walk,
    big-endian PCM frames, hand-built 80-bit extended-precision sample
    rate — the conversion naive readers get wrong): per-document
    closed-form 16-bit sample streams encode to AIFF and decode back
    executor-side; the sample statistics and rate/frame metadata must
    match the SQL replay bitwise.  Second independent audio container
    over the same harness (RIFF/WAV little-endian vs IFF/AIFF
    big-endian), pinning the sample ground truth container-free."""
    import pandas as pd

    from my_flink_1_10_2_spark.llm.aiff import aiff_decode, aiff_encode

    def batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 30 + d % 50
                samples = [((d * 37 + i * 11) % 4096) - 2048 for i in range(n)]
                payload = aiff_encode(samples, sample_rate=8000)
                rate, ch, bits, dec = aiff_decode(payload)
                if (rate, ch, bits, len(dec)) != (8000, 1, 16, n):
                    raise ValueError("AIFF metadata did not roundtrip")
                if dec != samples:
                    raise ValueError("AIFF samples did not roundtrip")
                rows.append(
                    (d, n, sum(dec), min(dec), max(dec),
                     sum(abs(v) for v in dec))
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "n_samples", "sample_sum",
                             "sample_min", "sample_max", "abs_sum"],
                )

    docs = read(spark, sf_dir, "documents")
    return _cpu_spread(docs.select("doc_id")).mapInPandas(
        batches,
        "media_id long, n_samples long, sample_sum long, "
        "sample_min long, sample_max long, abs_sum long",
    )
