"""Training-data pipeline extras — SURVEY.md §2 J28–J34, J37.

The second half of the large-scale curation toolbox: eval-set
contamination detection, intra-document repetition filtering, mixture
sampling, shard planning, context-window chunking, embedding
quantization, and deterministic per-group reservoir sampling.

Each operator is a reusable KERNEL over caller-supplied DataFrames plus a
thin contract binding it to the corpus tables — the kernels are what a
user composes into their own pipeline, and what the planted-case unit
tests (tests/test_training_extras.py) exercise on adversarial micro
frames the corpus doesn't contain.

Determinism discipline (shared with training_ops.py): every sampling /
thresholding decision is pure integer arithmetic on ids — multiplicative
hashing with Knuth's 2654435761 — so both engines derive bit-identical
decisions with no RNG and no float compares. Chunk/scale math that must
produce doubles (J34's quantization scale) runs the SAME op sequence on
the same operands in both engines, which IEEE-754 makes exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from silvia_spark.io import load_table, managed_persist
from silvia_spark.registry import contract

# Knuth multiplicative hash — the shared deterministic "randomness" for
# J28/J31/J32: h(id) = (id * 2654435761) mod 2^32 is a fixed bijection of
# ids with good avalanche on the low bits we bucket by, and it is plain
# integer arithmetic both engines evaluate identically.
_KNUTH = 2_654_435_761


def knuth_draw(id_col: Column | str, mod: int) -> Column:
    """Deterministic pseudo-uniform draw in [0, mod): the Knuth
    multiplicative hash of an integer id, reduced mod ``mod``. Plain
    integer arithmetic — identical in Spark, DuckDB, and Python."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (c * F.lit(_KNUTH)) % F.lit(mod)


def shingle_tokens(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, g): one row per DISTINCT n-token shingle per doc of
    ``docs(doc_id, text)``. Zero shuffle — per-row transform + explode.

    Docs with fewer than ``n`` tokens yield zero shingles (the guard
    matters: ``sequence(0, size-n)`` DESCENDS when size < n, and the
    resulting ``slice(w, 0, n)`` raises INVALID_PARAMETER_VALUE.START —
    this is an exported kernel, so caller-supplied frames may contain
    docs shorter than the corpus's 10-token minimum)."""
    w = F.split(F.lower("text"), " ")
    sh = F.when(
        F.size(w) >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)))),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(sh).alias("g"))


# --- J28: deterministic per-group reservoir sample ----------------------------

_J28_ORACLE = f"""
WITH h AS (
  SELECT doc_id, source, (doc_id * {_KNUTH}) % 4294967296 AS hk
  FROM documents
), r AS (
  SELECT source, doc_id, hk,
         row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
  FROM h
)
SELECT source, doc_id, hk, rn
FROM r WHERE rn <= 3
ORDER BY source, rn
"""


def reservoir_sample(df: DataFrame, group_col: str, id_col: str,
                     k: int) -> DataFrame:
    """Deterministic per-group k-sample of ``df``: rank rows inside each
    group by the Knuth hash of their integer id (id as tiebreak) and keep
    the k smallest. Equivalent in distribution to seeded reservoir
    sampling, but rerun-stable and engine-portable. Output: (group, id,
    hk, rn). rn<=k plans WindowGroupLimit — map-side truncation."""
    h = df.select(group_col, id_col,
                  knuth_draw(id_col, 4_294_967_296).alias("hk"))
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy("hk", id_col))
    return (h.withColumn("rn", rn).where(F.col("rn") <= k)
            .select(group_col, id_col, "hk", "rn"))


@contract("sample_reservoir_group", oracle=_J28_ORACLE)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source k=3 uniform sample, reservoir-equivalent but fully
    deterministic: rank docs inside each source by the Knuth hash of
    their id and keep the 3 smallest. Hash-ranking IS reservoir sampling
    with a fixed seed — same marginal uniformity, but rerun-stable and
    oracle-checkable, which `rand()` never is. 100 TB: rn<=3 plans as
    WindowGroupLimit, so each map task truncates to its local top-3
    before the source-keyed exchange — the shuffle carries k rows per
    source per task, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return (reservoir_sample(d, "source", "doc_id", 3)
            .orderBy("source", "rn"))


# --- J29: eval-set contamination detection ------------------------------------

# Eval split: doc_id ≡ 0 (mod 97) — a deterministic stand-in for "the
# benchmark set"; everything else is the training split.
_J29_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+4], ' ')
                        for i in generate_series(1, len(w)-4)]) AS sh
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
), tok AS (
  SELECT doc_id, unnest(sh) AS g FROM s
), hits AS (
  SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc
  FROM (SELECT * FROM tok WHERE doc_id % 97 <> 0) t
  JOIN (SELECT * FROM tok WHERE doc_id % 97 = 0) e USING (g)
  GROUP BY t.doc_id, e.doc_id
)
SELECT train_doc, count(*) AS n_eval_hits
FROM hits GROUP BY train_doc
ORDER BY n_eval_hits DESC, train_doc
"""


def contamination_scan(train: DataFrame, eval_: DataFrame,
                       n: int = 5) -> DataFrame:
    """Training docs sharing ≥ 1 n-token shingle with any eval doc.
    Inputs are (doc_id, text) frames; output (train_doc, n_eval_hits)
    with n_eval_hits = distinct eval docs hit. The candidate join is
    keyed on the shingle itself — df_train(g)·df_eval(g) pairs per
    shingle, and the eval side is the benchmark set (tiny), so the join
    behaves like a broadcast filter of the corpus."""
    t = shingle_tokens(train, n)
    e = (shingle_tokens(eval_, n)
         .withColumnRenamed("doc_id", "eval_doc"))
    return (
        t.join(e, "g")
        .groupBy(F.col("doc_id").alias("train_doc"))
        .agg(F.count_distinct("eval_doc").alias("n_eval_hits"))
    )


@contract("text_contamination", oracle=_J29_ORACLE)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: training docs sharing at least one
    5-token shingle with any eval-split doc, with the count of distinct
    eval docs hit. The shingle inverted index joins train-side tokens to
    eval-side tokens on the shingle itself — candidates are bounded by
    df_train(g)·df_eval(g) per shingle, and the EVAL side is the tiny
    one (the benchmark), so at 100 TB this behaves like a broadcast-
    filter of the corpus by the eval shingle set, never a corpus
    self-join. The decontamination action (dropping the hits) is a left
    anti join on train_doc — the scan is the hard part pinned here."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        contamination_scan(d.where(F.col("doc_id") % 97 != 0),
                           d.where(F.col("doc_id") % 97 == 0))
        .orderBy(F.col("n_eval_hits").desc(), "train_doc")
    )


# --- J30: intra-document repetition filter ------------------------------------

_J30_ORACLE = """
WITH g AS (
  SELECT doc_id, len(w) - 1 AS total_ngrams,
         len(list_distinct([array_to_string(w[i:i+1], ' ')
                            for i in generate_series(1, len(w)-1)]))
           AS distinct_ngrams
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
  WHERE len(w) >= 2
)
SELECT doc_id, total_ngrams, distinct_ngrams
FROM g
WHERE distinct_ngrams * 20 < total_ngrams * 19
ORDER BY doc_id
"""


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """Per-doc n-gram repetition counts over ``docs(doc_id, text)``:
    (doc_id, total_ngrams, distinct_ngrams), docs shorter than n tokens
    excluded. Pure per-row map — no shuffle exists."""
    w = F.split(F.lower("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)))
    return (
        docs.where(F.size(w) >= n)
        .select("doc_id",
                (F.size(w) - (n - 1)).alias("total_ngrams"),
                F.size(F.array_distinct(sh)).alias("distinct_ngrams"))
    )


@contract("text_repetition_filter", oracle=_J30_ORACLE)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: docs where more than 5% of bigram
    occurrences are repeats (distinct < 0.95·total) — the boilerplate /
    looping-text signal every pretraining filter stack carries (flags
    ~20% of this corpus; 3-grams on a 30-word vocabulary almost never
    repeat, so bigrams are the discriminating order here). The test
    cross-multiplies integers (distinct·20 < total·19): no ratio, no
    float, exact in both engines. Per-doc work only — a zero-shuffle
    map over the corpus. 100 TB: scales as scan throughput; nothing
    global exists in this contract."""
    d = load_table(spark, sf_dir, "documents")
    return (
        repetition_stats(d, 2)
        .where(F.col("distinct_ngrams") * 20 < F.col("total_ngrams") * 19)
        .orderBy("doc_id")
    )


# --- J31: mixture sampling with per-source rates ------------------------------

_J31_ORACLE = f"""
WITH rated AS (
  SELECT doc_id, source, n_chars,
         100 + (CAST(regexp_extract(source, '\\d+') AS BIGINT) * 37) % 900
           AS rate_permille,
         (doc_id * {_KNUTH}) % 1000 AS draw
  FROM documents
)
SELECT source, rate_permille,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN draw < rate_permille THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN draw < rate_permille THEN n_chars ELSE 0 END)
            AS BIGINT) AS chars_kept
FROM rated
GROUP BY source, rate_permille
ORDER BY source
"""


@contract("data_mix_sample", oracle=_J31_ORACLE)
def data_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling: each source gets a deterministic keep-rate
    (100–999 permille, derived from the source number) and docs are kept
    when their id-hash lands under it — exactly how a production mixer
    reweights sources (up/down-sampling web vs books vs code) while
    staying reproducible across reruns and engines. The draw is integer
    permille vs integer rate: no float compare. 100 TB: embarrassingly
    parallel scan + one tiny per-source aggregate; changing mixture
    weights is a constant edit, not a reshuffle."""
    d = load_table(spark, sf_dir, "documents")
    rate = (F.lit(100)
            + (F.regexp_extract("source", r"\d+", 0).cast("bigint")
               * 37) % 900).alias("rate_permille")
    draw = knuth_draw("doc_id", 1000).alias("draw")
    kept = F.col("draw") < F.col("rate_permille")
    return (
        d.select("source", "doc_id", "n_chars", rate, draw)
        .groupBy("source", "rate_permille")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
             F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
             .alias("chars_kept"))
        .orderBy("source")
    )


# --- J32: balanced shard assignment -------------------------------------------

_N_SHARDS = 16

_J32_ORACLE = f"""
SELECT (doc_id * {_KNUTH}) % {_N_SHARDS} AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM documents
GROUP BY shard_id
ORDER BY shard_id
"""


@contract("shard_assign_balanced", oracle=_J32_ORACLE)
def shard_assign_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard planning for the training-set writer: hash-assign every doc
    to one of 16 shards and report per-shard row/byte totals — the audit
    a writer runs BEFORE committing a layout, to prove no shard is skewed.
    The id hash (not doc_id % N) decorrelates shard from insertion order,
    so sequential id ranges spread evenly. 100 TB: this aggregate is the
    planning pass; the write itself is `repartition(N_SHARDS, hash)` +
    partitioned parquet (A6/A10 pin that sink), and the same hash keeps
    planner and writer in agreement."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(knuth_draw("doc_id", _N_SHARDS).alias("shard_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.min("doc_id").alias("min_doc"),
             F.max("doc_id").alias("max_doc"))
        .orderBy("shard_id")
    )


# --- J33: context-window chunking ---------------------------------------------

_CHUNK, _STRIDE = 64, 48

_J33_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), c AS (
  SELECT doc_id, len(w) AS n, unnest(generate_series(0, len(w)-1, {_STRIDE}))
           AS chunk_start, w
  FROM t
)
SELECT doc_id,
       CAST(chunk_start / {_STRIDE} AS INT) AS chunk_idx,
       chunk_start,
       least({_CHUNK}, n - chunk_start) AS chunk_tokens,
       md5(array_to_string(w[chunk_start+1 : chunk_start+{_CHUNK}], ' '))
         AS chunk_md5
FROM c
ORDER BY doc_id, chunk_idx
"""


def chunk_windows(docs: DataFrame, chunk: int = _CHUNK,
                  stride: int = _STRIDE) -> DataFrame:
    """Split every doc of ``docs(doc_id, text)`` into ``chunk``-token
    windows on a ``stride``-token step: one row per (doc, window) with
    the window's token count and an md5 of its joined tokens (content
    pin). 1→N Generate, zero shuffle."""
    w = F.split(F.lower("text"), " ")
    t = docs.select("doc_id", w.alias("w"), F.size(w).alias("n"))
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    return (
        t.select("doc_id", "n", "w", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            (F.col("chunk_start") / stride).cast("int").alias("chunk_idx"),
            "chunk_start",
            F.least(F.lit(chunk), F.col("n") - F.col("chunk_start"))
            .alias("chunk_tokens"),
            F.md5(F.concat_ws(
                " ", F.slice(F.col("w"), F.col("chunk_start") + 1, chunk)))
            .alias("chunk_md5"))
    )


@contract("doc_chunk_windows", oracle=_J33_ORACLE)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every doc into 64-token windows on
    a 48-token stride (16-token overlap) — the tokenize-and-pack
    precursor every pretraining pipeline runs. One row per (doc, chunk)
    via sequence+posexplode; the chunk CONTENT is pinned by an md5 over
    the joined token slice, so the hash check proves byte-identical
    chunk boundaries in both engines, not just counts. 100 TB:
    embarrassingly parallel 1→N row generation, zero shuffle; output
    row count is ~n_tokens/stride per doc, and the slice never copies
    the whole doc per chunk in the vectorized reader."""
    d = load_table(spark, sf_dir, "documents")
    return chunk_windows(d, _CHUNK, _STRIDE).orderBy("doc_id", "chunk_idx")


# --- J34: int8 embedding quantization -----------------------------------------

_J34_ORACLE = """
WITH q AS (
  SELECT vec_id, len(embedding) AS n_dims,
         CAST(list_max([abs(x) for x in embedding]) AS DOUBLE) / 127.0
           AS scale,
         embedding
  FROM embeddings
)
SELECT vec_id, n_dims, scale,
       CAST(CASE WHEN scale = 0 THEN 0 ELSE
         list_sum([CAST(floor(embedding[i] / scale + 0.5) AS BIGINT) * i
                   for i in generate_series(1, len(embedding))])
       END AS BIGINT) AS checksum
FROM q
ORDER BY vec_id
"""


def quantize_int8(vecs: DataFrame) -> DataFrame:
    """Symmetric int8 quantization summary of ``vecs(vec_id, embedding)``:
    per-vector scale = max|x|/127 and the position-weighted checksum
    Σ floor(x_i/scale + 0.5)·i — exact integers pinning every quantized
    value and its position without emitting an array column. Explicit
    half-up formula: native round() half-tie behavior differs across
    engines; floor(x+0.5) cannot."""
    emb = F.col("embedding")
    scaled = vecs.withColumn(
        "scale",
        F.array_max(F.transform(emb, lambda x: F.abs(x)))
        .cast("double") / F.lit(127.0))
    q = F.zip_with(
        emb, F.sequence(F.lit(1), F.size(emb)),
        lambda x, i: F.floor(x.cast("double") / F.col("scale") + 0.5)
        .cast("bigint") * i)
    checksum = (F.when(F.col("scale") == 0, F.lit(0))
                .otherwise(F.aggregate(q, F.lit(0).cast("bigint"),
                                       lambda acc, v: acc + v))
                .cast("bigint").alias("checksum"))
    return scaled.select("vec_id", F.size(emb).alias("n_dims"), "scale",
                         checksum)


@contract("embed_quantize_int8", oracle=_J34_ORACLE)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    scale = max|x|/127, q_i = half-up-round(x_i/scale) — the storage
    transform behind every int8 ANN index. The contract hashes a
    position-weighted checksum Σ q_i·i (exact integers) plus the scale,
    so quantized VALUES and dimension ORDER are both pinned without
    emitting an array column (driver canonicalizer constraint). Rounding
    is the explicit floor(x+0.5) formula in BOTH engines — native round()
    disagrees across engines at .5 ties (half-up vs banker's), the
    formula cannot. float→double widening is IEEE-exact, so identical op
    sequences give identical bits. 100 TB: zero-shuffle map; the Arrow
    kernel path (K6) takes over when throughput matters, this expression
    form is the semantics reference."""
    e = load_table(spark, sf_dir, "embeddings")
    return quantize_int8(e).orderBy("vec_id")


# --- J37: token-entropy quality score ----------------------------------------

# Shannon entropy of the per-doc token distribution. The per-term doubles
# are bit-identical across engines (same (c*1.0)/n division order, and ln
# agrees bitwise on this value range — the M4 tf-idf contract pins that);
# each term is then EXPLICITLY quantized to the 1e-15 grid via
# round(term·1e15)→BIGINT — the identical double op sequence in both
# engines — and summed as exact integers, so the total is independent of
# partition merge order AND of engine decimal internals. (A
# DECIMAL(38,18) cast is NOT engine-portable: Spark converts through the
# double's shortest decimal string while DuckDB scales by 1e18 in
# floating point, so the trailing digits can disagree.) The grid's
# ≤5e-16/term quantization error is the same on both sides and nine
# orders below the 6-dp rounding margin.
_J37_ORACLE = """
WITH tok AS (
  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens,
         unnest(string_split(lower(text), ' ')) AS w
  FROM documents
), cnt AS (
  SELECT doc_id, n_tokens, w, count(*) AS c
  FROM tok GROUP BY doc_id, n_tokens, w
)
SELECT doc_id, n_tokens,
       round(CAST(sum(CAST(round(-((c * 1.0 / n_tokens)
                                   * ln(c * 1.0 / n_tokens)) * 1e15)
                           AS BIGINT)) AS DOUBLE) / 1e15, 6) AS entropy
FROM cnt
GROUP BY doc_id, n_tokens
ORDER BY doc_id
"""


@contract("text_entropy_quality", oracle=_J37_ORACLE)
def text_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token Shannon entropy (nats, 6 dp) — the distribution-shape
    quality signal: looping/boilerplate text collapses entropy toward 0
    while J30's repetition filter only sees bigram DISTINCTNESS; filter
    stacks carry both. Plan: explode → (doc, token) count → per-doc sum,
    with n_tokens carried from the pre-explode projection so no window
    pass exists. The entropy terms are doubles (bit-identical across
    engines — same division shape, ln pinned by M4) quantized to the
    1e-15 grid and summed as exact BIGINTs — the long-grid-sum
    discipline (functions/numeric.py): commutative, hash-stable at any
    partitioning, and free of engine decimal-cast internals. 100 TB:
    two partial-agg exchanges keyed (doc, token) then (doc) — both
    bounded by vocabulary fan-out, no global state."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    tok = base.select("doc_id", F.size("ws").alias("n_tokens"),
                      F.explode("ws").alias("w"))
    cnt = (tok.groupBy("doc_id", "n_tokens", "w")
           .agg(F.count(F.lit(1)).alias("c")))
    p = F.col("c") * F.lit(1.0) / F.col("n_tokens")
    term_q = F.round((-(p * F.log(p))) * F.lit(1e15)).cast("bigint")
    return (cnt.groupBy("doc_id", "n_tokens")
            .agg(F.round(F.sum(term_q).cast("double") / F.lit(1e15), 6)
                 .alias("entropy"))
            .orderBy("doc_id"))


# --- J38: deterministic weighted priority sample ------------------------------

# Efraimidis–Spirakis weighted sampling as an exponential race: each doc
# draws Exp(weight) via -ln(u)/w with u derived from the Knuth hash of its
# id — selection probability proportional to weight (n_chars here), fully
# deterministic, and both engines evaluate the identical double op
# sequence (ln bit-agreement pinned by M4/J37).
_J38_ORACLE = f"""
SELECT doc_id, source, n_chars,
       round(-ln((((doc_id * {_KNUTH}) % 4294967296) + 0.5)
                 / 4294967296.0) / n_chars, 6) AS priority
FROM documents
ORDER BY -ln((((doc_id * {_KNUTH}) % 4294967296) + 0.5)
             / 4294967296.0) / n_chars, doc_id
LIMIT 20
"""


@contract("sample_weighted_priority", oracle=_J38_ORACLE)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional top-20 sample (weight = n_chars): the
    exponential-race form of Efraimidis–Spirakis A-ES — doc i survives
    with probability ∝ w_i because the k smallest Exp(w) draws win the
    race. The draw is -ln(u)/w with u a Knuth-hash uniform of doc_id, so
    the sample is rerun-stable, engine-portable, and oracle-checkable —
    none of which rand() gives. Complements J28 (uniform per-group
    reservoir) and J31 (per-source Bernoulli rates): this is the
    QUALITY-weighted pull real mixture builders run. 100 TB: pure
    projection + TakeOrderedAndProject — per-partition top-20 merge on
    the driver, zero shuffle of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    u = ((knuth_draw("doc_id", 4_294_967_296) + F.lit(0.5))
         / F.lit(4_294_967_296.0))
    prio = (-F.log(u)) / F.col("n_chars")
    return (d.select("doc_id", "source", "n_chars",
                     prio.alias("prio_raw"))
            .orderBy("prio_raw", "doc_id")
            .limit(20)
            .select("doc_id", "source", "n_chars",
                    F.round("prio_raw", 6).alias("priority")))


# --- J42: unigram-LM negative log-likelihood scoring --------------------------

# Per-token-type term computed once on the vocabulary (it depends only on
# (c, N)), quantized to the 1e-15 grid BIGINT like J37, then summed per
# doc — both engines derive identical doubles (same division shape, ln
# pinned by M4/J37) and identical grid longs.
_J42_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
  FROM documents
), lm AS (
  SELECT w, count(*) AS c FROM tok GROUP BY w
), n AS (SELECT sum(c) AS n FROM lm)
SELECT t.doc_id, count(*) AS n_tok,
       round(CAST(sum(CAST(round(-ln(lm.c * 1.0 / (SELECT n FROM n))
                                 * 1e15) AS BIGINT)) AS DOUBLE)
             / 1e15 / count(*), 6) AS avg_nll
FROM tok t JOIN lm ON t.w = lm.w
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@contract("text_unigram_logprob", oracle=_J42_ORACLE)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fluency scoring — the CCNet/RedPajama-class perplexity
    filter reduced to its SQL-expressible core: score every document by
    the average negative log-likelihood of its tokens under the corpus's
    own unigram language model (low avg_nll ⇒ stopword-like common text,
    high ⇒ rare-token soup; curation stacks cut both tails). Complements
    J37's entropy (distribution SHAPE within the doc) with a
    corpus-relative signal: a doc of globally-rare tokens can have
    identical entropy to one of common tokens but very different NLL.

    Two passes over the corpus BY DESIGN (the standard LM-scoring
    shape, whitelisted in the plans-suite scan guard): pass 1 builds
    the language model — token-keyed partial→final counts (map-side
    partials absorb stopword skew; no token-partitioned window exists
    anywhere, which would put all of 'the' in one task) — plus the
    total as a scalar aggregate of the persisted vocab frame, broadcast
    back as a 1-row cross join (r14: the full-frame window it replaces
    funnelled the whole VOCAB-sized aggregate through one partition,
    guide §2.5; the cache barrier keeps the corpus tokenized once
    despite the double reference); pass 2
    re-tokenizes and joins the broadcast LM, so the per-doc aggregate
    rides one doc_id exchange. The per-type NLL term is quantized
    (×1e15 → BIGINT) on the vocabulary BEFORE the join, so the per-doc
    sum is an exact long sum — J37's grid discipline. At 100 TB the LM
    is a reusable artifact: persist pass 1's output and re-score any
    corpus against it."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id",
                    F.explode(F.split(F.lower("text"), " ")).alias("w"))
    cnt = managed_persist(
        toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")),
        "text_unigram_logprob.lm")
    lm = cnt.crossJoin(F.broadcast(cnt.agg(F.sum("c").alias("n"))))
    g = F.round(-F.log(F.col("c") * 1.0 / F.col("n")) * 1e15).cast("bigint")
    scored = toks.join(F.broadcast(lm.select("w", g.alias("g"))), "w")
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tok"),
                 F.round((F.sum("g").cast("double") / F.lit(1e15))
                         / F.count(F.lit(1)), 6).alias("avg_nll"))
            .orderBy("doc_id"))
