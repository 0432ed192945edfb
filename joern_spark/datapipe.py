"""Large-scale training-data pipeline operators over the documents /
embeddings / events tables.

Every operator is a pure DataFrame function designed for the 100 TB case:

* JVM-side expressions only (md5 / split / slice / aggregate / zip_with) —
  no Python in the hot path;
* shuffles only on the keys the semantics require (shingle hash, band hash,
  label), all partial-aggregated map-side first;
* the near-dup joins key on 8-gram shingles / LSH band hashes, whose
  cardinality is bounded by real duplication — not O(n²);
* brute-force KNN restricts the probe side (small) and broadcasts it against
  the corpus, the standard "small probes × huge corpus" shape.

Each operator is paired with an equivalent DuckDB SQL oracle (same hash
functions — md5 — so results match bit-for-bit) in ``DATA_QUERIES``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SHINGLE_W = 8      # words per shingle
N_PERM = 16        # minhash permutations
BAND_R = 4         # rows per LSH band → 4 bands


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _words(df: DataFrame) -> DataFrame:
    return df.withColumn("w", F.split(F.trim(F.col("text")), r"\s+"))


def _shingles(df: DataFrame) -> DataFrame:
    """(doc_id, s) — 8-word shingles; pos count = len(w) - 7."""
    w = _words(df).select("doc_id", "w")
    return (w.select("doc_id", "w", F.posexplode("w").alias("pos", "_tok"))
            .filter(F.col("pos") <= F.size("w") - SHINGLE_W)
            .select("doc_id",
                    F.concat_ws(" ", F.slice(F.col("w"), F.col("pos") + 1,
                                             SHINGLE_W)).alias("s")))


# --------------------------------------------------------------------------- #
# Deduplication
# --------------------------------------------------------------------------- #

def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 groups with >1 member. Map-side partial agg; shuffle
    keyed on the 128-bit hash → uniform, skew-free."""
    return (_docs(spark, sf_dir)
            .groupBy(F.md5("text").alias("text_hash"))
            .agg(F.count("*").alias("dup_count"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("dup_count") > 1))


EXACT_DUP_SQL = """
SELECT md5(text) AS text_hash, count(*) AS dup_count,
       min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def shingle_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram near-dup: doc pairs sharing >= 3 distinct 8-word shingles.
    The join key is the shingle itself — at web scale hot shingles
    (boilerplate) are the skew risk; AQE skew-join splitting handles them,
    and the distinct() before the self-join caps per-doc fanout."""
    sh = _shingles(_docs(spark, sf_dir)).distinct()
    a = sh.alias("a")
    b = sh.alias("b")
    return (a.join(b, (F.col("a.s") == F.col("b.s"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("shared_shingles"))
            .filter(F.col("shared_shingles") >= 3))


SHINGLE_DUP_SQL = f"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {SHINGLE_W - 1}], ' ') AS s
  FROM words, unnest(generate_series(1, len(w) - {SHINGLE_W - 1})) AS t(i)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_shingles
FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 3
"""


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-permutation minhash over 8-word shingles. Permutation i =
    lexicographic min of md5(i || ':' || shingle) — identical in any engine
    with md5, which is what makes the oracle bit-exact. One shuffle
    (groupBy doc_id), all 16 mins computed in the same partial aggregate."""
    sh = _shingles(_docs(spark, sf_dir)).distinct()
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}")
            for i in range(N_PERM)]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_cols():
    bands = []
    for b in range(N_PERM // BAND_R):
        cols = [f"h{b * BAND_R + r}" for r in range(BAND_R)]
        bands.append((b, cols))
    return bands


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: band-bucket join (4 bands × 4 rows), then the
    signature-agreement estimate filters candidates at >= 0.5 similarity.
    Band hash is the join key → duplicate clusters co-locate, everything else
    spreads uniformly."""
    sig = minhash_signatures(spark, sf_dir).cache()
    cand = None
    for b, cols in _band_cols():
        bh = (sig.select("doc_id",
                         F.md5(F.concat_ws("|", *[F.col(c) for c in cols]))
                         .alias("band_hash")))
        a, c = bh.alias("a"), bh.alias("b")
        p = (a.join(c, (F.col("a.band_hash") == F.col("b.band_hash"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b")))
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    agree = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(N_PERM)
    )
    return (cand.join(sa, cand["doc_a"] == F.col("sa.doc_id"))
            .join(sb, cand["doc_b"] == F.col("sb.doc_id"))
            .select("doc_a", "doc_b",
                    (agree / F.lit(N_PERM)).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= 0.5)
            .withColumn("est_jaccard", F.round("est_jaccard", 4)))


def _minhash_sql_core() -> str:
    mins = ", ".join(
        f"min(md5('{i}:' || s)) AS h{i}" for i in range(N_PERM))
    return f"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {SHINGLE_W - 1}], ' ') AS s
  FROM words, unnest(generate_series(1, len(w) - {SHINGLE_W - 1})) AS t(i)
), sig AS (
  SELECT doc_id, {mins} FROM sh GROUP BY doc_id
)"""


def minhash_lsh_sql() -> str:
    band_sel = []
    for b, cols in _band_cols():
        band_sel.append(
            "SELECT doc_id, md5(" + " || '|' || ".join(cols) + ") AS band_hash "
            "FROM sig")
    bands_union = " UNION ALL ".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM ({s}) a "
        f"JOIN ({s}) b ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id"
        for s in band_sel)
    agree = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(N_PERM))
    return _minhash_sql_core() + f"""
, cand AS (SELECT DISTINCT doc_a, doc_b FROM ({bands_union}))
SELECT doc_a, doc_b,
       round(CAST(({agree}) AS DOUBLE) / {N_PERM}, 4) AS est_jaccard
FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
          JOIN sig sb ON cand.doc_b = sb.doc_id
WHERE CAST(({agree}) AS DOUBLE) / {N_PERM} >= 0.5
"""


def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document over word tokens (xxhash64 token hashes,
    bitwise majority vote). Pure JVM expressions — the 64 bit-sums are one
    partial aggregate; no oracle (xxhash64 is Spark-specific), driver records
    the rows-only check."""
    toks = (_words(_docs(spark, sf_dir))
            .select("doc_id", F.explode("w").alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2 ** b if b < 63 else -(2 ** 63)).cast("long")
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash")).orderBy("doc_id")


# --------------------------------------------------------------------------- #
# Text analysis
# --------------------------------------------------------------------------- #

def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per doc — pure projection, no
    shuffle, fully pushed-down scan of (doc_id, text)."""
    d = _words(_docs(spark, sf_dir))
    bpe = F.size(F.split(F.trim(F.col("text")), r"[\s\p{Punct}]+"))
    return d.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.length("text").alias("len_chars"),
    )


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       len(regexp_split_to_array(trim(text), '[\s[:punct:]]+')) AS n_bpe_tokens,
       len(text) AS len_chars
FROM documents
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: length, mean word length, stopword ratio —
    single-pass projection + one cheap agg-free formula per row."""
    d = _words(_docs(spark, sf_dir))
    nw = F.size("w")
    stop_hits = sum(
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(f" {s} "), F.lit(""))))
        / F.lit(len(s) + 2)
        for s in ("the", "and", "of")
    )
    return d.select(
        "doc_id",
        nw.alias("n_words"),
        F.round((F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                 / nw).cast("double"), 4).alias("avg_word_len"),
        F.round((stop_hits / nw).cast("double"), 4).alias("stopword_ratio"),
    )


QUALITY_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
       round(CAST(len(replace(text, ' ', '')) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\s+')), 4) AS avg_word_len,
       round(CAST( (len(text) - len(replace(text, ' the ', ''))) / 5
                 + (len(text) - len(replace(text, ' and ', ''))) / 5
                 + (len(text) - len(replace(text, ' of ', ''))) / 4 AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\s+')), 4) AS stopword_ratio
FROM documents
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID from stopword-family hits; deterministic
    tie-break. Projection only."""
    d = _docs(spark, sf_dir)

    def hits(*kws):
        return sum(
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(f" {k} "), F.lit(""))))
            / F.lit(len(k) + 2)
            for k in kws
        )

    en = hits("the", "and", "with")
    es = hits("el", "la", "de")
    fr = hits("le", "la", "et")
    pred = (F.when((en >= es) & (en >= fr), "en")
            .when(es >= fr, "es").otherwise("fr"))
    return d.select("doc_id", F.col("lang").alias("tagged_lang"),
                    pred.alias("pred_lang"))


def _sql_hits(*kws):
    return " + ".join(
        f"(len(text) - len(replace(text, ' {k} ', ''))) / {len(k) + 2}"
        for k in kws)


LANG_ID_SQL = f"""
SELECT doc_id, lang AS tagged_lang,
  CASE WHEN ({_sql_hits('the', 'and', 'with')}) >= ({_sql_hits('el', 'la', 'de')})
        AND ({_sql_hits('the', 'and', 'with')}) >= ({_sql_hits('le', 'la', 'et')})
       THEN 'en'
       WHEN ({_sql_hits('el', 'la', 'de')}) >= ({_sql_hits('le', 'la', 'et')})
       THEN 'es' ELSE 'fr' END AS pred_lang
FROM documents
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized md5 content fingerprint (dedup/lineage key)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))).alias("fp"),
    )


FINGERPRINT_SQL = r"""
SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
FROM documents
"""


# --------------------------------------------------------------------------- #
# Embedding similarity search
# --------------------------------------------------------------------------- #

def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0).cast("double"), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def knn_bruteforce(spark: SparkSession, sf_dir: str, n_probes: int = 8,
                   k: int = 3) -> DataFrame:
    """Exact cosine top-k for a small probe set against the whole corpus —
    broadcast the probes (tiny) against the corpus scan: one pass, no
    shuffle except the final per-probe top-k."""
    from pyspark.sql import Window
    e = _embs(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    probes = e.filter(F.col("vec_id") < n_probes) \
        .select(F.col("vec_id").alias("probe_id"), F.col("v").alias("pv"))
    sim = (e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
           .select("probe_id", "vec_id", _cosine(F.col("pv"), F.col("v")).alias("sim")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("probe_id", F.col("rnk").cast("long").alias("rnk"),
                    F.col("vec_id").alias("neighbor_id"),
                    F.round("sim", 3).alias("sim")))


KNN_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 8),
sim AS (
  SELECT probe_id, vec_id,
         list_cosine_similarity(pv, v) AS sim
  FROM e, probes WHERE vec_id <> probe_id
), ranked AS (
  SELECT probe_id, vec_id, sim,
         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM sim
)
SELECT probe_id, rnk, vec_id AS neighbor_id, round(sim, 3) AS sim
FROM ranked WHERE rnk <= 3
"""


def knn_lsh(spark: SparkSession, sf_dir: str, n_probes: int = 8,
            k: int = 3, n_planes: int = 8) -> DataFrame:
    """Approximate KNN via random-hyperplane LSH buckets: corpus is hashed
    once into sign-pattern buckets (deterministic planes derived from
    dimension parity — no RNG, resume-safe), probes only compare within
    their bucket. The scale path: bucket key is the shuffle key; bucket
    population is ~n/2^planes. Rows-only check (LSH recall is approximate
    by design)."""
    from pyspark.sql import Window
    e = _embs(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    # plane p = alternating ±1 with period (p+2): deterministic pseudo-planes
    sig = None
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(F.col("v"),
                       F.transform(F.sequence(F.lit(0), F.size("v") - 1),
                                   lambda i: F.when((i / (p + 2)).cast("int") % 2 == 0,
                                                    F.lit(1.0)).otherwise(F.lit(-1.0))),
                       lambda x, s: x * s),
            F.lit(0.0).cast("double"), lambda acc, x: acc + x)
        bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = bit if sig is None else sig * 2 + bit
    eb = e.withColumn("bucket", sig)
    probes = eb.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv"), "bucket")
    sim = (eb.join(F.broadcast(probes), "bucket")
           .filter(F.col("vec_id") != F.col("probe_id"))
           .select("probe_id", "vec_id", _cosine(F.col("pv"), F.col("v")).alias("sim")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("probe_id", F.col("rnk").cast("long").alias("rnk"),
                    F.col("vec_id").alias("neighbor_id"),
                    F.round("sim", 3).alias("sim")))


def label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label aggregate over embeddings (sum of components) — partial-agg
    friendly groupBy on the (small-cardinality) label key."""
    e = _embs(spark, sf_dir)
    comp_sum = F.aggregate(F.transform("embedding", lambda x: x.cast("double")),
                           F.lit(0.0).cast("double"), lambda acc, x: acc + x)
    return (e.select(F.col("label").cast("long").alias("label"),
                     comp_sum.alias("cs"))
            .groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("cs"), 4).alias("avg_comp_sum")))


CENTROID_SQL = """
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
       round(avg(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')), 4)
         AS avg_comp_sum
FROM embeddings GROUP BY 1
"""


# --------------------------------------------------------------------------- #
# Events (batch view of the streaming-shaped table)
# --------------------------------------------------------------------------- #

def events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type rollup — the batch equivalent of the windowed streaming
    agg in joern_spark.streaming."""
    return (_events(spark, sf_dir)
            .groupBy(F.col("event_type"),
                     F.col("ts").cast("date").cast("string").alias("day"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


EVENTS_DAILY_SQL = """
SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------- #
# Multimodal columns — opaque binary blobs + typed metadata, decoded via an
# Arrow-batched mapInPandas stage. The testdata ships no real media, so the
# per-mime DECODE step is a deterministic STUB (clearly marked below); the
# Spark-side plumbing — binary column, output schema, batch shape,
# partition-local decoder reuse — is the real contract and is what scales.
# --------------------------------------------------------------------------- #

def _decode_stub(mime: str, blob: bytes) -> tuple[int, int]:
    """STUB decoder. A real deployment dispatches per mime type:
    ``image/* → PIL.Image.open``, ``audio/* → soundfile/librosa``,
    ``video/* → av frame sampling`` — none of those codecs exist in this
    container, so every branch degrades to the same deterministic fake
    (dimensions derived from the byte length), keeping tests/oracles exact.
    """
    n = len(blob)
    if mime.startswith(("image/", "audio/", "video/")):
        # codec call would go here; deterministic fake instead of
        # NotImplementedError so the pipeline shape stays testable
        return n % 640 + 1, n % 480 + 1
    raise NotImplementedError(f"unknown modality: {mime}")


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, mime, n_bytes, header_hex, width, height).

    text is cast to an opaque binary blob (the stand-in for stored media
    bytes) with a deterministic fake mime; feature extraction runs as
    mapInPandas so the decoder is instantiated once per partition and fed
    Arrow batches — the same shape a real image/audio featurizer needs.
    """
    import pandas as pd

    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    src = _docs(spark, sf_dir).select(
        "doc_id",
        F.element_at(mimes, (F.col("doc_id") % 3 + 1).cast("int")).alias("mime"),
        F.encode("text", "utf-8").alias("blob"))

    schema = ("doc_id long, mime string, n_bytes long, header_hex string, "
              "width int, height int")

    def extract(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                blob = bytes(t.blob)
                w, h = _decode_stub(t.mime, blob)
                rows.append((t.doc_id, t.mime, len(blob), blob[:4].hex(), w, h))
            yield pd.DataFrame(rows, columns=["doc_id", "mime", "n_bytes",
                                              "header_hex", "width", "height"])

    return src.mapInPandas(extract, schema=schema)


MULTIMODAL_SQL = """
WITH b AS (
  SELECT doc_id,
         ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 AS INT) + 1] AS mime,
         encode(text) AS blob
  FROM documents
)
SELECT doc_id, mime, octet_length(blob) AS n_bytes,
       lower(substr(hex(blob), 1, 8)) AS header_hex,
       CAST(octet_length(blob) % 640 + 1 AS INT) AS width,
       CAST(octet_length(blob) % 480 + 1 AS INT) AS height
FROM b
"""


# --------------------------------------------------------------------------- #
# Registry: name -> (fn, oracle_sql | None)
# --------------------------------------------------------------------------- #

DATA_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "dedup_exact": (exact_dup_groups, EXACT_DUP_SQL),
    "dedup_shingle_pairs": (shingle_dup_pairs, SHINGLE_DUP_SQL),
    "dedup_minhash_lsh": (minhash_lsh_pairs, minhash_lsh_sql()),
    "dedup_simhash": (simhash64, None),
    "text_token_stats": (token_stats, TOKEN_STATS_SQL),
    "text_quality": (quality_scores, QUALITY_SQL),
    "text_lang_id": (lang_id, LANG_ID_SQL),
    "text_fingerprint": (doc_fingerprint, FINGERPRINT_SQL),
    "ann_knn_bruteforce": (knn_bruteforce, KNN_SQL),
    "ann_knn_lsh": (knn_lsh, None),
    "emb_label_stats": (label_centroid_stats, CENTROID_SQL),
    "events_daily_rollup": (events_daily, EVENTS_DAILY_SQL),
    "mm_blob_features": (multimodal_features, MULTIMODAL_SQL),
}
