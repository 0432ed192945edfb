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


SHINGLE_DF_CAP = 50  # drop shingles present in more than this many docs


def shingle_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram near-dup: doc pairs sharing >= 3 distinct 8-word shingles.
    The join key is the shingle itself — at web scale hot shingles
    (boilerplate headers/footers) are the scale killer: a shingle shared by
    d documents yields d^2/2 pairs, which no AQE split can shrink. Shingles
    with document frequency > SHINGLE_DF_CAP are therefore excluded BEFORE
    the self-join (they carry no dedup signal — near-dup pairs share many
    rare shingles); the hot set is tiny at any scale → broadcast anti-join.
    Residual skew under the cap is AQE's skew-join split."""
    sh = _shingles(_docs(spark, sf_dir)).distinct()
    hot = (sh.groupBy("s").agg(F.count("*").alias("df"))
           .filter(F.col("df") > SHINGLE_DF_CAP)
           .select("s"))
    sh = sh.join(F.broadcast(hot), "s", "left_anti")
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
), cold AS (
  SELECT * FROM sh WHERE s NOT IN (
    SELECT s FROM sh GROUP BY s HAVING count(*) > {SHINGLE_DF_CAP})
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_shingles
FROM cold a JOIN cold b ON a.s = b.s AND a.doc_id < b.doc_id
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


_HEX = "0123456789abcdef"
_POPCNT4 = "0112122312232334"  # popcount lookup for a 4-bit value
SIMHASH_BANDS = 4              # 4 bands x 16 bits for Hamming bucketing
SIMHASH_HAM_MAX = 3            # near-dup threshold on 64-bit Hamming distance


def _hexdigit(col):
    """hex char -> 0..15 — portable across Spark and DuckDB (instr trick)."""
    return F.expr(f"instr('{_HEX}', {col}) - 1")


def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document over word tokens: token bits come from
    the first 16 hex chars of md5(token) (same value in any engine → the
    oracle is bit-exact), bitwise majority vote, emitted as a 16-char hex
    string. One partial aggregate (64 conditional sums), shuffle only on
    doc_id; NO global sort — the output is an unordered relation."""
    toks = (_words(_docs(spark, sf_dir))
            .select("doc_id", F.explode("w").alias("tok"))
            .withColumn("h", F.substring(F.md5("tok"), 1, 16)))
    for p in range(16):
        toks = toks.withColumn(f"d{p}", _hexdigit(f"substring(h, {p + 1}, 1)"))
    sums = [
        F.sum(F.when(F.shiftright(F.col(f"d{p}"), k).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"b{p}_{k}")
        for p in range(16) for k in range(4)
    ]
    agg = toks.groupBy("doc_id").agg(*sums)
    digits = []
    for p in range(16):
        v = None
        for k in range(4):
            bit = F.when(F.col(f"b{p}_{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
            v = bit if v is None else v + bit
        digits.append(F.substring(F.lit(_HEX), 1, 16).substr(v + 1, F.lit(1)))
    return agg.select("doc_id", F.concat(*digits).alias("simhash"))


def _simhash_sql_core() -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN ((instr('{_HEX}', substr(h, {p + 1}, 1)) - 1) >> {k}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS b{p}_{k}"
        for p in range(16) for k in range(4))
    digits = ", ".join(
        "substr('" + _HEX + "', ("
        + " + ".join(f"(CASE WHEN b{p}_{k} > 0 THEN {1 << k} ELSE 0 END)"
                     for k in range(4))
        + ") + 1, 1)"
        for p in range(16))
    return f"""
WITH toks AS (
  SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents)
), bits AS (
  SELECT doc_id, {bit_sums} FROM toks GROUP BY doc_id
), sig AS (
  SELECT doc_id, concat({digits}) AS simhash FROM bits
)"""


SIMHASH_SQL = _simhash_sql_core() + "\nSELECT doc_id, simhash FROM sig"


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing: candidates bucket on 16-bit bands (a pair
    within Hamming distance 3 of 64 bits agrees exactly on at least one of
    the 4 bands — pigeonhole), then the true Hamming distance filters at
    <= SIMHASH_HAM_MAX. Band value is the join key → no all-pairs join; the
    verify join re-reads only the candidate rows."""
    sig = simhash64(spark, sf_dir).cache()
    cand = None
    for b in range(SIMHASH_BANDS):
        band = sig.select("doc_id",
                          F.substring("simhash", b * 4 + 1, 4).alias("band"))
        a, c = band.alias("a"), band.alias("b")
        p = (a.join(c, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b")))
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    j = cand.join(sa, "doc_a").join(sb, "doc_b")
    ham = None
    for p in range(16):
        va = _hexdigit(f"substring(ha, {p + 1}, 1)")
        vb = _hexdigit(f"substring(hb, {p + 1}, 1)")
        x = (va.bitwiseOR(vb) - va.bitwiseAND(vb))  # xor via | minus &
        pc = F.substring(F.lit(_POPCNT4), 1, 16).substr(x + 1, F.lit(1)).cast("int")
        ham = pc if ham is None else ham + pc
    return (j.select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= SIMHASH_HAM_MAX))


def simhash_pairs_sql() -> str:
    bands = " UNION ALL ".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"FROM band{b} a JOIN band{b} b "
        f"ON a.band = b.band AND a.doc_id < b.doc_id"
        for b in range(SIMHASH_BANDS))
    band_ctes = ", ".join(
        f"band{b} AS (SELECT doc_id, substr(simhash, {b * 4 + 1}, 4) AS band FROM sig)"
        for b in range(SIMHASH_BANDS))
    ham = " + ".join(
        f"CAST(substr('{_POPCNT4}', "
        f"((va{p} | vb{p}) - (va{p} & vb{p})) + 1, 1) AS BIGINT)"
        for p in range(16))
    digits = ", ".join(
        f"instr('{_HEX}', substr(sa.simhash, {p + 1}, 1)) - 1 AS va{p}, "
        f"instr('{_HEX}', substr(sb.simhash, {p + 1}, 1)) - 1 AS vb{p}"
        for p in range(16))
    return _simhash_sql_core() + f"""
, {band_ctes}
, cand AS (SELECT DISTINCT doc_a, doc_b FROM ({bands}))
, digits AS (
  SELECT cand.doc_a, cand.doc_b, {digits}
  FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
            JOIN sig sb ON cand.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, ({ham}) AS hamming
FROM digits WHERE ({ham}) <= {SIMHASH_HAM_MAX}
"""


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


# LSH geometry: L independent hash tables of `n_planes` hyperplanes each,
# distance-1 multi-probe within every table, union of candidates. Per-table
# hit probability for a true neighbor with per-plane flip probability q is
# P(<=1 flip) = (1-q)^p + p*q*(1-q)^(p-1); L independent tables union to
# 1-(1-P)^L. The fixture corpus is near-uniform (max cosine ~0.4 → q≈0.4),
# the worst case for hyperplane LSH, so one 4-plane table lands ~0.45
# recall; L=4 tables union to ~0.9 (measured by ann_knn_lsh_recall and
# floor-asserted in tests/test_datapipe.py). At scale n_planes grows as
# log2(n_vectors / target_bucket), keeping per-bucket population ~constant,
# and candidate count stays L*(planes+1)*target_bucket per probe; the index
# (vector exploded into L (table, bucket) rows) is the standard L-fold
# space-for-recall trade of multi-table LSH.
N_PLANES = 4
N_TABLES = 4


def _lsh_signature(n_planes: int, table: int):
    """Sign-pattern bucket signature over column `v` for one hash table,
    from deterministic md5-derived hyperplanes: plane p's sign at dimension
    i is -1 iff the first hex char of md5('table:p:i') is >= '8' — unbiased
    pseudo-random planes, identical in any engine with md5 (resume-safe,
    oracle-exact). The projection is integer-valued (components quantized
    at 1e3) so its sign never depends on floating-point summation order."""
    sig = None
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.transform(F.sequence(F.lit(0), F.size("v") - 1),
                            lambda i: F.when(
                                F.substring(F.md5(F.concat(F.lit(f"{table}:{p}:"),
                                                           i.cast("string"))), 1, 1)
                                .isin(*"89abcdef"), F.lit(-1)).otherwise(F.lit(1))),
                lambda x, s: F.round(x * 1000).cast("long") * s),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = bit if sig is None else sig * 2 + bit
    return sig.cast("long")


def _lsh_buckets(e: DataFrame, n_planes: int = N_PLANES,
                 n_tables: int = N_TABLES) -> DataFrame:
    """Adds `buckets`: array of one signature per hash table (length L)."""
    return e.withColumn(
        "buckets", F.array(*[_lsh_signature(n_planes, t) for t in range(n_tables)]))


def knn_lsh(spark: SparkSession, sf_dir: str, n_probes: int = 8,
            k: int = 3, n_planes: int = N_PLANES,
            n_tables: int = N_TABLES) -> DataFrame:
    """Approximate KNN via L-table random-hyperplane LSH with multi-probe:
    each probe searches, per table, its own bucket plus every bucket at
    Hamming distance 1 (n_planes+1 buckets); candidates union across
    tables and dedup before the cosine. (tbl, bucket) is the join key →
    per-bucket population ~n/2^planes; probes are tiny → broadcast."""
    from pyspark.sql import Window
    e = _embs(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    eb = _lsh_buckets(e, n_planes, n_tables)
    ebe = eb.select("vec_id", "v", F.posexplode("buckets").alias("tbl", "bucket"))
    flips = F.array(F.lit(0), *[F.lit(1 << b) for b in range(n_planes)])
    probes = (eb.filter(F.col("vec_id") < n_probes)
              .select(F.col("vec_id").alias("probe_id"), F.col("v").alias("pv"),
                      F.posexplode("buckets").alias("tbl", "b0"))
              .select("probe_id", "pv", "tbl",
                      F.explode(F.transform(
                          flips, lambda m: F.col("b0").bitwiseXOR(m.cast("long"))))
                      .alias("bucket")))
    # dedup the candidate pair BEFORE the cosine — a pair found by several
    # tables is scored once (pv/v are identical per pair, so the arbitrary
    # row dropDuplicates keeps is value-deterministic)
    cand = (ebe.join(F.broadcast(probes), ["tbl", "bucket"])
            .filter(F.col("vec_id") != F.col("probe_id"))
            .dropDuplicates(["probe_id", "vec_id"]))
    sim = cand.select("probe_id", "vec_id",
                      _cosine(F.col("pv"), F.col("v")).alias("sim"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("probe_id", F.col("rnk").cast("long").alias("rnk"),
                    F.col("vec_id").alias("neighbor_id"),
                    F.round("sim", 3).alias("sim")))


def _lsh_sql_core(n_planes: int = N_PLANES, n_tables: int = N_TABLES) -> str:
    """DuckDB mirror of _lsh_buckets: per-vector array of L signatures,
    exploded to (tbl, bucket) rows."""
    tbl_exprs = []
    for t in range(n_tables):
        planes = []
        for p in range(n_planes):
            planes.append(
                "(SELECT sum(CAST(round(v[i + 1] * 1000) AS BIGINT) * "
                f"(CASE WHEN substr(md5('{t}:{p}:' || i), 1, 1) IN "
                "('8','9','a','b','c','d','e','f') THEN -1 ELSE 1 END)) "
                "FROM unnest(generate_series(0, len(v) - 1)) AS t(i))")
        bits = " + ".join(
            f"(CASE WHEN ({proj}) >= 0 THEN {1 << (n_planes - 1 - p)} ELSE 0 END)"
            for p, proj in enumerate(planes))
        tbl_exprs.append(f"({bits})")
    buckets = ", ".join(tbl_exprs)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
eb AS (SELECT vec_id, v, [{buckets}] AS buckets FROM e),
ebe AS (SELECT vec_id, v, g.t AS tbl, buckets[g.t + 1] AS bucket
        FROM eb, generate_series(0, {n_tables - 1}) AS g(t))"""


def knn_lsh_sql(n_probes: int = 8, k: int = 3, n_planes: int = N_PLANES,
                n_tables: int = N_TABLES) -> str:
    flips = ", ".join(["0"] + [str(1 << b) for b in range(n_planes)])
    return _lsh_sql_core(n_planes, n_tables) + f"""
, probes AS (
  SELECT vec_id AS probe_id, v AS pv, tbl, xor(bucket, m) AS bucket
  FROM ebe, unnest([{flips}]) AS f(m) WHERE vec_id < {n_probes}
), sim AS (
  SELECT DISTINCT probe_id, vec_id, list_cosine_similarity(pv, v) AS sim
  FROM ebe JOIN probes USING (tbl, bucket) WHERE vec_id <> probe_id
), ranked AS (
  SELECT probe_id, vec_id, sim,
         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM sim
)
SELECT probe_id, rnk, vec_id AS neighbor_id, round(sim, 3) AS sim
FROM ranked WHERE rnk <= {k}
"""


def knn_lsh_recall(spark: SparkSession, sf_dir: str, n_probes: int = 8,
                   k: int = 3) -> DataFrame:
    """Measured recall@k of the LSH index vs exact brute force, per probe —
    the quality row the approximate path is judged by (basis points, so the
    oracle compare is float-free)."""
    lsh = knn_lsh(spark, sf_dir, n_probes=n_probes, k=k).select(
        "probe_id", "neighbor_id")
    brute = knn_bruteforce(spark, sf_dir, n_probes=n_probes, k=k).select(
        "probe_id", "neighbor_id")
    hits = (brute.join(lsh, ["probe_id", "neighbor_id"], "left_semi")
            .groupBy("probe_id").agg(F.count("*").alias("found")))
    base = brute.groupBy("probe_id").agg(F.count("*").alias("expected"))
    return (base.join(hits, "probe_id", "left").fillna(0, ["found"])
            .select("probe_id", F.col("expected").cast("long").alias("expected"),
                    F.col("found").cast("long").alias("found"),
                    F.round(10000 * F.col("found") / F.col("expected"))
                    .cast("long").alias("recall_bp")))


def knn_lsh_recall_sql(n_probes: int = 8, k: int = 3) -> str:
    return f"""
WITH lsh AS ({knn_lsh_sql(n_probes, k)}),
brute AS ({KNN_SQL}),
hits AS (
  SELECT b.probe_id, count(*) AS found
  FROM brute b JOIN lsh l ON b.probe_id = l.probe_id
                         AND b.neighbor_id = l.neighbor_id
  GROUP BY 1
), base AS (SELECT probe_id, count(*) AS expected FROM brute GROUP BY 1)
SELECT base.probe_id, expected, coalesce(found, 0) AS found,
       CAST(round(10000.0 * coalesce(found, 0) / expected) AS BIGINT) AS recall_bp
FROM base LEFT JOIN hits ON base.probe_id = hits.probe_id
"""


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
            # metadata is vectorized batch-level; only the (stand-in for a)
            # codec call is per-row, because real decoders are per-row
            blobs = [bytes(b) for b in pdf["blob"]]
            n_bytes = pd.Series([len(b) for b in blobs], dtype="int64")
            header_hex = pd.Series([b[:4].hex() for b in blobs])
            wh = [_decode_stub(m, b) for m, b in zip(pdf["mime"], blobs)]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "mime": pdf["mime"].values,
                "n_bytes": n_bytes,
                "header_hex": header_hex,
                "width": pd.Series([w for w, _ in wh], dtype="int32"),
                "height": pd.Series([h for _, h in wh], dtype="int32"),
            })

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
    "dedup_simhash": (simhash64, SIMHASH_SQL),
    "dedup_simhash_pairs": (simhash_pairs, simhash_pairs_sql()),
    "text_token_stats": (token_stats, TOKEN_STATS_SQL),
    "text_quality": (quality_scores, QUALITY_SQL),
    "text_lang_id": (lang_id, LANG_ID_SQL),
    "text_fingerprint": (doc_fingerprint, FINGERPRINT_SQL),
    "ann_knn_bruteforce": (knn_bruteforce, KNN_SQL),
    "ann_knn_lsh": (knn_lsh, knn_lsh_sql()),
    "ann_knn_lsh_recall": (knn_lsh_recall, knn_lsh_recall_sql()),
    "emb_label_stats": (label_centroid_stats, CENTROID_SQL),
    "events_daily_rollup": (events_daily, EVENTS_DAILY_SQL),
    "mm_blob_features": (multimodal_features, MULTIMODAL_SQL),
}
