"""Near-duplicate detection over ``documents`` (BASELINE north-star):
n-gram Jaccard via shingle posting lists, MinHash+LSH banding, and
SimHash with nibble-blocked Hamming pairing. All candidate generation is
equi-join based (posting lists / band buckets / nibble blocks) — never an
all-pairs cross product — so each scheme survives a 100 TB corpus: cost
is Σ bucket², tuned by shingle rarity / band count / nibble width.

Cross-engine determinism: shingle and token hashes are md5-prefix int64s
(see text.hex_hash); MinHash permutations are integer LCG draws; Jaccard
thresholds compare integers (2·∩ ≥ ∪); emitted ratios are floor-scaled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_python_airflow_bigquery_spark.dims import values_dim
from etl_python_airflow_bigquery_spark.operators.checkpoints import (
    iter_checkpoint,
)
from etl_python_airflow_bigquery_spark.queries import register
from etl_python_airflow_bigquery_spark.queries.text import _hex_hash_sql, hex_hash
from etl_python_airflow_bigquery_spark.tables import load_table, rebalance

# Word-3-gram shingles per doc, stored as distinct md5-prefix int64
# hashes — the posting-list joins shuffle 8-byte ints, not strings
# (~2.5x faster at sf0.1; the hash is identical in both engines, so a
# collision — ~1e-6 at 1e6 shingles — would affect both sides equally).
_SHINGLES_SQL = f"""
sh AS (
    SELECT DISTINCT doc_id,
           {_hex_hash_sql("w[g.i] || ' ' || w[g.i+1] || ' ' || w[g.i+2]")} AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
         LATERAL unnest(generate_series(1, len(d.w) - 2)) AS g(i)
    WHERE len(d.w) >= 3
),
tam AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
"""


def _verify_jaccard(candidatos: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs as a MAP step: each
    doc's full shingle set rides along once as a sorted int64 array and
    the intersection computes per pair with array_intersect inside
    codegen (set sizes fall out of the array lengths). The posting
    re-join alternative shuffles |candidates|·|d| rows — quadratically
    worse whenever candidates ≫ true pairs. Keeps pairs at J ≥ 0.5
    (integer test 2·∩ ≥ ∪) with the floor-scaled ratio."""
    arr = sh.groupBy("doc_id").agg(F.sort_array(F.collect_list("s")).alias("arr"))
    return _verify_jaccard_arrays(candidatos, arr)


def _verify_jaccard_arrays(candidatos: DataFrame, arr: DataFrame) -> DataFrame:
    """``_verify_jaccard`` taking the per-doc shingle ARRAYS directly —
    for callers that already hold (doc_id, arr) frames (the dedup-state
    classify probes stored ``conjuntos`` arrays; its batch side
    aggregates arrays once for the table append). Re-exploding those to
    posting rows just so the row form could re-aggregate them cost an
    extra explode + full shuffle + collect_list per classify (guide
    §2.4: the arrays ARE the map-side aggregate). array_intersect and
    size() never depend on element order, so sortedness of ``arr`` does
    not affect the verified answer."""
    aa = arr.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
    ab = arr.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
    scored = (
        candidatos.select("doc_a", "doc_b")
        .join(aa, "doc_a")
        .join(ab, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("long").alias("c"),
            F.size("arr_a").cast("long").alias("na"),
            F.size("arr_b").cast("long").alias("nb"),
        )
    )
    return scored.where(
        2 * F.col("c") >= F.col("na") + F.col("nb") - F.col("c")
    ).select(
        "doc_a",
        "doc_b",
        (
            F.floor(
                F.col("c").cast("double")
                * 1000
                / (F.col("na") + F.col("nb") - F.col("c"))
            )
            / 1000
        ).alias("jaccard"),
    )


# session-scoped postings cache: every dedup-family query consumes the
# SAME distinct (doc_id, shingle) frame, so one checkpoint serves them
# all within a session (a production pipeline computes postings once and
# persists them — this is that, locally). Keyed by Spark applicationId +
# resolved dir; sf_dir contents are immutable within a session (true for
# testdata, probe replicas, and the per-test tmp dirs). Small FIFO cap —
# evicted frames free their checkpoint blocks on GC.
_SHINGLES_CACHE: dict[tuple[str, str], DataFrame] = {}
_SHINGLES_CACHE_MAX = 8
# same contract for the verified near-dup PAIR list: dedup_ngram_jaccard
# is both a report (the pair query) and the edge generator for
# dedup_clusters / corpus_desduplicado / fuga_particiones — one
# materialization serves all of them within a session
_PARES_CACHE: dict[tuple[str, str], DataFrame] = {}


def clear_session_caches() -> None:
    """Drop the session-scoped materialization caches. bench.py calls
    this before EVERY timed repetition: its per-query numbers are
    documented as plan cost with no result caching, and without the
    clear a cached pair frame would report a near-zero fake. Pipeline
    consumers (driver sim, chained dedup→clusters→rollup runs) keep the
    reuse."""
    _SHINGLES_CACHE.clear()
    _PARES_CACHE.clear()
    # the lang-ID prediction cache follows the same contract (text.py);
    # cleared here so every timed-harness / block-purging caller that
    # already calls this function covers it too
    from etl_python_airflow_bigquery_spark.queries.text import (
        clear_lang_pred_cache,
    )

    clear_lang_pred_cache()
    # the k-means fit cache too (similarity.py): seven consumers share
    # one Lloyd fit per dataset in a session; timed harnesses must pay
    # the fit per rep
    from etl_python_airflow_bigquery_spark.queries.similarity import (
        clear_kmeans_cache,
        clear_probes_cache,
    )

    clear_kmeans_cache()
    # ...and the 2-probe frame cache (six hierarchical consumers)
    clear_probes_cache()
    # ...and the stored-index cache (serving.py): a timed serve-path
    # measurement must pay its build
    from etl_python_airflow_bigquery_spark.queries import serving

    serving.clear_session_caches()


def shingle_postings(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, shingle-hash) postings from a documents FRAME —
    the one shingle definition (see _SHINGLES_SQL for the hashing
    rationale), frame-shaped so the persistent dedup state
    (operators/dedup_state.py) can shingle an arriving batch without
    the sf_dir-keyed cache."""
    return (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3),"
                    " i -> CAST(conv(substring(md5("
                    "concat_ws(' ', w[i], w[i+1], w[i+2])), 1, 15), 16, 10)"
                    " AS BIGINT))"
                )
            ).alias("s"),
        )
        .distinct()
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle-hash) postings; see _SHINGLES_SQL for
    the hashing rationale.

    Two execution choices that matter at both ends of the scale axis:
    ``rebalance`` spreads the CPU-bound md5 shingling across cores when
    the scan is a single tiny split (no-op at production split counts),
    and ``localCheckpoint`` materializes the postings ONCE — every
    consumer (rarity ranking, prefix join, verification arrays, MinHash
    signatures) branches from this frame, and without the checkpoint
    Spark recomputes the explode+hash per branch. At cluster scale the
    same role is played by persisting the postings (executor
    memory+disk); the blocks are freed when the frame is GC'd."""
    import os as _os

    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    hit = _SHINGLES_CACHE.get(key)
    if hit is not None:
        return hit
    docs = rebalance(load_table(spark, sf_dir, "documents"))
    out = shingle_postings(docs).localCheckpoint(eager=False)
    while len(_SHINGLES_CACHE) >= _SHINGLES_CACHE_MAX:
        _SHINGLES_CACHE.pop(next(iter(_SHINGLES_CACHE)))
    _SHINGLES_CACHE[key] = out
    return out


# --------------------------------------------------------------------------
# n-gram Jaccard — exact near-dup via shingle posting lists
# --------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       floor(CAST(i.c AS DOUBLE) * 1000 / (ta.n + tb.n - i.c)) / 1000 AS jaccard
FROM inter i
JOIN tam ta ON ta.doc_id = i.doc_a
JOIN tam tb ON tb.doc_id = i.doc_b
WHERE 2 * i.c >= (ta.n + tb.n - i.c)
"""


def pares_jaccard_prefijo(sh: DataFrame, arr: DataFrame | None = None) -> DataFrame:
    """The PPJoin prefix-filtered exact-Jaccard pair engine over a
    shingle-posting FRAME (doc_id, s) — factored from
    ``dedup_ngram_jaccard`` (whose docstring carries the filter
    derivations) so the persistent dedup state can run the SAME exact
    engine over a batch's postings. Returns verified pairs
    (doc_a < doc_b, jaccard) at J ≥ 0.5.

    ``arr``: optionally the per-doc (doc_id, arr) shingle arrays of the
    SAME postings — callers that already materialize that aggregate (the
    dedup-state build persists it as the ``conjuntos`` table) pass it so
    the verify step joins it directly instead of re-aggregating ``sh``
    (one exchange + collect_list of the full posting mass saved)."""
    df_s = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # one shuffle on doc_id serves both the rarity rank and the set size
    w_rank = Window.partitionBy("doc_id").orderBy("df", "s")
    w_all = Window.partitionBy("doc_id")
    ranked = sh.join(df_s, "s").select(
        "doc_id",
        "s",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    # τ = 0.5 ⇒ prefix length = n − ⌈n/2⌉ + 1 = n//2 + 1
    prefix = ranked.where(F.col("rn") <= F.floor(F.col("n") / 2) + 1)
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "s",
        F.col("rn").alias("rn_a"), F.col("n").alias("na"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), "s",
        F.col("rn").alias("rn_b"), F.col("n").alias("nb"),
    )
    # required overlap for J ≥ τ: o ≥ ⌈τ·(na+nb)/(1+τ)⌉ = ⌈(na+nb)/3⌉.
    o_min = -F.floor(-(F.col("na") + F.col("nb")) / 3)
    candidatos = (
        pa.join(pb, "s")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter: J ≤ min/max, so min(na,nb) ≥ τ·max(na,nb)
            & (2 * F.least(F.col("na"), F.col("nb"))
               >= F.greatest(F.col("na"), F.col("nb")))
            # positional filter (PPJoin): matching at global ranks
            # (rn_a, rn_b) bounds the remaining overlap by
            # min(na−rn_a, nb−rn_b)+1 — for the pair's FIRST match this
            # bound is exact-safe, so a pair where NO match passes
            # cannot reach τ.
            & (F.least(F.col("na") - F.col("rn_a"), F.col("nb") - F.col("rn_b"))
               + 1 >= o_min)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    if arr is not None:
        return _verify_jaccard_arrays(candidatos, arr)
    return _verify_jaccard(candidatos, sh)


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE, ops=("DD4",), bench=True,
          driver=False)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard near-dup with PREFIX FILTERING (the
    All-Pairs/PPJoin candidate scheme): shingles get a global rarity
    order (ascending document frequency df, hash tie-break). A pair with
    J ≥ τ must overlap in ≥ ⌈τ·|d|⌉ shingles of EACH side, so the two
    docs' PREFIXES — each doc's first |d| − ⌈τ·|d|⌉ + 1 shingles in that
    order — must intersect. Candidates therefore come from a self-join
    on prefix postings only; the integer test 2·∩ ≥ ∪ then verifies on
    FULL sets. Same exact answer as the naive posting-list join (same
    oracle), but candidate volume tracks true duplicates, not per-shingle
    df² — the clone-heavy 10× probe drops from 141× to near-linear,
    because a high-df shingle enters a prefix only when a doc has few
    rarer shingles, i.e. when it is genuinely near-duplicate material."""
    import os as _os

    _key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    _hit = _PARES_CACHE.get(_key)
    if _hit is not None:
        return _hit
    sh = _shingles(spark, sf_dir)
    out = pares_jaccard_prefijo(sh).localCheckpoint(eager=False)
    while len(_PARES_CACHE) >= _SHINGLES_CACHE_MAX:
        _PARES_CACHE.pop(next(iter(_PARES_CACHE)))
    _PARES_CACHE[_key] = out
    return out


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

_N_PERM = 16
_BAND_ROWS = 4
_MERSENNE = 2147483647


def _perm_params() -> list[tuple[int, int, int]]:
    """Deterministic (i, a, b) LCG draws for the 16 permutations —
    embedded literally in BOTH engines' plans."""
    out = []
    for i in range(1, _N_PERM + 1):
        a = (1103515245 * i + 12345) % (_MERSENNE - 1) + 1
        b = (1103515245 * (i + 100) + 54321) % _MERSENNE
        out.append((i, a, b))
    return out


_PERMS_SQL = "perms(i, a, b) AS (VALUES " + ", ".join(
    f"({i}, {a}, {b})" for i, a, b in _perm_params()
) + ")"

_BANDS = [(b, list(range(b * _BAND_ROWS + 1, (b + 1) * _BAND_ROWS + 1))) for b in range(_N_PERM // _BAND_ROWS)]

_MINSIG_SQL = f"""
h0 AS (
    SELECT doc_id, s % {_MERSENNE} AS h FROM sh
),
minh AS (
    SELECT h0.doc_id, p.i, min((p.a * h0.h + p.b) % {_MERSENNE}) AS mh
    FROM h0 CROSS JOIN perms p
    GROUP BY 1, 2
),
firmas AS (
    SELECT doc_id,
           {", ".join(f"min(mh) FILTER (i = {i}) AS m{i}" for i in range(1, _N_PERM + 1))}
    FROM minh GROUP BY 1
),
baldes AS (
    {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS banda, md5("
        + " || ',' || ".join(f"CAST(m{i} AS VARCHAR)" for i in cols)
        + ") AS clave FROM firmas"
        for b, cols in _BANDS
    )}
)
"""

_MINHASH_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
{_PERMS_SQL},
{_MINSIG_SQL.strip()},
candidatos AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM baldes a
    JOIN baldes b ON a.banda = b.banda AND a.clave = b.clave
                 AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS c
    FROM candidatos c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       floor(CAST(i.c AS DOUBLE) * 1000 / (ta.n + tb.n - i.c)) / 1000 AS jaccard
FROM inter i
JOIN tam ta ON ta.doc_id = i.doc_a
JOIN tam tb ON tb.doc_id = i.doc_b
WHERE 2 * i.c >= (ta.n + tb.n - i.c)
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE, ops=("DD2",), bench=True,
          driver=False)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup (the public shingle→minhash→band→bucket-join
    scheme): 16 LCG permutations → 4 bands of 4 rows; docs colliding in
    any band become candidates via an equi join on (band, band-key);
    exact Jaccard then verifies at 0.5 via the map-side array-intersect
    step shared with ``dedup_ngram_jaccard``. At scale only signatures
    (16 ints/doc) shuffle for candidate generation — the full shingle
    sets are touched again only for the verified candidates."""
    sh = _shingles(spark, sf_dir)
    return _verify_jaccard(_lsh_candidatos(sh), sh)


def _lsh_candidatos(sh: DataFrame) -> DataFrame:
    """Banding candidate pairs from the postings frame (the pre-
    verification half of dedup_minhash_lsh, factored out so the recall
    calibration below can measure banding capture BEFORE the Jaccard
    filter)."""
    h0 = sh.select("doc_id", (F.col("s") % _MERSENNE).alias("h"))
    # All 16 permuted minima in ONE aggregation pass (single shuffle on
    # doc_id, map-side combinable) — a perms-dim cross join + pivot would
    # add a 16x row blowup plus two extra shuffles for the same numbers.
    firmas = h0.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _MERSENNE).alias(str(i))
            for i, a, b in _perm_params()
        ]
    )
    # One stack() projection emits all 4 (band, key) rows per doc — a
    # 4-way unionByName would recompute the signature aggregation per
    # branch.
    stack_args: list = []
    for b, cols in _BANDS:
        stack_args.append(F.lit(b))
        stack_args.append(
            F.md5(F.concat_ws(",", *[F.col(str(i)).cast("string") for i in cols]))
        )
    baldes = firmas.select(
        "doc_id",
        F.stack(F.lit(len(_BANDS)), *stack_args).alias("banda", "clave"),
    )
    a = baldes.select(F.col("doc_id").alias("doc_a"), "banda", "clave")
    b = baldes.select(F.col("doc_id").alias("doc_b"), "banda", "clave")
    return (
        a.join(b, ["banda", "clave"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# --------------------------------------------------------------------------
# SimHash — 16-bit signatures + nibble-blocked Hamming pairs
# --------------------------------------------------------------------------

_N_BITS = 32

_SIMHASH_SQL = f"""
palabras AS (
    SELECT d.doc_id, g.w AS palabra
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
         LATERAL unnest(d.ws) AS g(w)
),
wh AS (
    SELECT doc_id, {_hex_hash_sql("palabra")} AS h FROM palabras
),
bits AS (
    SELECT w.doc_id, b.b,
           sum(CASE WHEN (w.h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
    FROM wh w CROSS JOIN generate_series(0, {_N_BITS - 1}) b(b)
    GROUP BY 1, 2
),
firmas AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY 1
)
"""

_SIMHASH_ORACLE = f"""
WITH {_SIMHASH_SQL.strip()}
SELECT doc_id, simhash FROM firmas
"""


def _simhash_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = rebalance(load_table(spark, sf_dir, "documents"))
    wh = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("palabra")
    ).select("doc_id", hex_hash(F.col("palabra")).alias("h"))
    bits_dim = spark.range(_N_BITS).select(F.col("id").cast("int").alias("b"))
    bits = (
        wh.crossJoin(F.broadcast(bits_dim))
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                F.when(F.expr("(h >> b) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
            ).alias("s")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(F.lit(0).cast("bigint")))
        .cast("bigint")
        .alias("simhash")
    )


@register("dedup_simhash", oracle=_SIMHASH_ORACLE, ops=("DD3",), driver=False)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash (Charikar): each token hash votes ±1
    on every bit position; the sign vector packs into an int. Token
    hashing and voting are one explode + two grouped sums — linear,
    shuffle only on doc_id."""
    return _simhash_frames(spark, sf_dir)


_SIMHASH_PAIRS_ORACLE = f"""
WITH {_SIMHASH_SQL.strip()},
nibbles AS (
    SELECT doc_id, simhash, k.k, (simhash >> (k.k * 8)) & 255 AS nib
    FROM firmas CROSS JOIN generate_series(0, 3) k(k)
),
candidatos AS (
    SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                    b.doc_id AS doc_b, b.simhash AS sh_b
    FROM nibbles a
    JOIN nibbles b ON a.k = b.k AND a.nib = b.nib AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM candidatos
WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


@register("dedup_simhash_pairs", oracle=_SIMHASH_PAIRS_ORACLE, ops=("DD3",))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing: signatures split into 4 bytes; by
    pigeonhole, any pair at Hamming ≤ 3 shares at least one aligned
    byte, so candidates come from an equi join on (position, byte)
    and the exact Hamming test filters. Signature-only shuffles — the
    token-level data never re-enters."""
    firmas = _simhash_frames(spark, sf_dir)
    k = spark.range(4).select(F.col("id").cast("int").alias("k"))
    nibbles = firmas.crossJoin(F.broadcast(k)).select(
        "doc_id", "simhash", "k", F.expr("shiftright(simhash, k * 8) & 255").alias("nib")
    )
    a = nibbles.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "k", "nib"
    )
    b = nibbles.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "k", "nib"
    )
    candidatos = (
        a.join(b, ["k", "nib"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "sh_a", "doc_b", "sh_b")
        .distinct()
    )
    hamming = F.expr("bit_count(sh_a ^ sh_b)")
    return candidatos.where(hamming <= 3).select(
        "doc_a", "doc_b", hamming.cast("bigint").alias("hamming")
    )


# --------------------------------------------------------------------------
# Frequency-capped Jaccard — the corpus-scale variant
# --------------------------------------------------------------------------

_DF_CAP = 20

_CAPPED_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
raras AS (
    SELECT s FROM sh GROUP BY s HAVING count(*) <= {_DF_CAP}
),
candidatos AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sh a
    JOIN raras r ON a.s = r.s
    JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS c
    FROM candidatos c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       floor(CAST(i.c AS DOUBLE) * 1000 / (ta.n + tb.n - i.c)) / 1000 AS jaccard
FROM inter i
JOIN tam ta ON ta.doc_id = i.doc_a
JOIN tam tb ON tb.doc_id = i.doc_b
WHERE 2 * i.c >= (ta.n + tb.n - i.c)
"""


@register("dedup_jaccard_capped", oracle=_CAPPED_ORACLE, ops=("DD4",), driver=False)
def dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped Jaccard (the 100 TB form of dedup_ngram_jaccard,
    SCALING.md known-limits): candidate pairs may only form through
    shingles appearing in ≤20 docs, capping the posting-list self-join
    at O(cap²) per shingle — stop-shingle blowup is impossible by
    construction. Verification still uses the FULL shingle sets, so any
    surviving pair's Jaccard is exact; pairs whose overlap is entirely
    stop-shingles are the documented recall tradeoff."""
    sh = _shingles(spark, sf_dir)
    tam = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    raras = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= _DF_CAP)
        .select("s")
    )
    rare_postings = sh.join(raras, "s")
    a = rare_postings.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    candidatos = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sha = sh.select(F.col("doc_id").alias("doc_a"), "s")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        candidatos.join(sha, "doc_a")
        .join(shb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ta = tam.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    tb = tam.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(ta), "doc_a")
        .join(F.broadcast(tb), "doc_b")
        .where(2 * F.col("c") >= F.col("na") + F.col("nb") - F.col("c"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(
                    F.col("c").cast("double")
                    * 1000
                    / (F.col("na") + F.col("nb") - F.col("c"))
                )
                / 1000
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Threshold sweep — dedup aggressiveness curve over the exact pairs
# --------------------------------------------------------------------------

_UMBRALES = (500, 600, 700, 800, 900, 1000)

_CURVA_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pares AS (
    SELECT CAST(floor(CAST(i.c AS DOUBLE) * 1000 / (ta.n + tb.n - i.c))
                AS BIGINT) AS milli,
           i.doc_a, i.doc_b
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.doc_a
    JOIN tam tb ON tb.doc_id = i.doc_b
    WHERE 2 * i.c >= (ta.n + tb.n - i.c)
),
umbrales(tau) AS (VALUES {", ".join(f"({t})" for t in _UMBRALES)})
SELECT CAST(u.tau AS BIGINT) AS tau_mili,
       CAST((SELECT count(*) FROM pares p WHERE p.milli >= u.tau)
            AS BIGINT) AS pares,
       CAST((SELECT count(DISTINCT d)
             FROM (SELECT milli, doc_a AS d FROM pares
                   UNION SELECT milli, doc_b FROM pares) x
             WHERE x.milli >= u.tau) AS BIGINT) AS docs_implicados,
       CAST((SELECT count(DISTINCT p.doc_b) FROM pares p
             WHERE p.milli >= u.tau) AS BIGINT) AS eliminacion_max
FROM umbrales u
"""


@register("curva_umbral_dedup", oracle=_CURVA_ORACLE, ops=("DD4", "A8", "J11"),
          bench=True, driver=False)
def curva_umbral_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP THRESHOLD SWEEP — the curve a curation team reads before
    committing to a Jaccard cutoff: for each candidate τ (500-1000
    milli), how many exact-Jaccard pairs survive, how many documents
    they implicate, and the pairwise removal UPPER BOUND (drop the
    higher doc_id of every pair — an overestimate whenever clusters
    chain, which is exactly what comparing it against
    `corpus_desduplicado`'s realized CC-based removal reveals). Too-low
    τ removes distinct documents that merely share boilerplate; too-high
    τ leaves true near-dups in; the sweep shows where THIS corpus's
    knee sits instead of importing another corpus's folklore constant.

    Shape: the verified pair frame (τ ≥ 0.5, prefix-filtered,
    session-shared with the whole dedup family) is the only expensive
    input; the sweep itself is a 6-row broadcast grid joined with
    pair-grain rows — two bounded aggregations and a 6-row output at
    any corpus size."""
    pares = dedup_ngram_jaccard(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        F.round(F.col("jaccard") * 1000).cast("long").alias("milli"),
    )
    grid = values_dim(spark, [(t,) for t in _UMBRALES], ["tau"])
    por_par = (
        F.broadcast(grid)
        .join(pares, F.col("milli") >= F.col("tau"), "left")
        .groupBy("tau")
        .agg(
            F.count("doc_a").cast("bigint").alias("pares"),
            F.countDistinct("doc_b").cast("bigint").alias("eliminacion_max"),
        )
    )
    docs = pares.select("milli", F.col("doc_a").alias("d")).union(
        pares.select("milli", F.col("doc_b").alias("d"))
    ).distinct()
    por_doc = (
        F.broadcast(grid)
        .join(docs, F.col("milli") >= F.col("tau"), "left")
        .groupBy("tau")
        .agg(F.countDistinct("d").cast("bigint").alias("docs_implicados"))
    )
    return por_par.join(por_doc, "tau").select(
        F.col("tau").cast("bigint").alias("tau_mili"),
        "pares",
        "docs_implicados",
        "eliminacion_max",
    )


# --------------------------------------------------------------------------
# LSH empirical recall — the ANN dedup path audited against exact
# --------------------------------------------------------------------------

_COBERTURA_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
{_PERMS_SQL},
{_MINSIG_SQL.strip()},
inter_todo AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
exactos AS (
    SELECT i.doc_a, i.doc_b,
           CAST(floor(CAST(i.c AS DOUBLE) * 1000 / (ta.n + tb.n - i.c))
                AS BIGINT) AS milli
    FROM inter_todo i
    JOIN tam ta ON ta.doc_id = i.doc_a
    JOIN tam tb ON tb.doc_id = i.doc_b
    WHERE 2 * i.c >= (ta.n + tb.n - i.c)
),
candidatos AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM baldes a
    JOIN baldes b ON a.banda = b.banda AND a.clave = b.clave
                 AND a.doc_id < b.doc_id
),
marcado AS (
    SELECT e.milli // 100 * 100 AS banda,
           CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hallado
    FROM exactos e
    LEFT JOIN candidatos c
      ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
)
SELECT CAST(banda AS BIGINT) AS banda_mili,
       CAST(count(*) AS BIGINT) AS exactos,
       CAST(sum(hallado) AS BIGINT) AS hallados,
       CAST(1000 * sum(hallado) // count(*) AS BIGINT) AS recall_mili
FROM marcado GROUP BY 1
"""


@register("cobertura_lsh", oracle=_COBERTURA_ORACLE, ops=("DD2", "DD4", "A8"),
          bench=True)
def cobertura_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL LSH RECALL BY TRUE SIMILARITY — the audit that closes
    the loop between the two dedup families: every exact near-dup pair
    (prefix-filtered exact Jaccard, J ≥ 0.5) is checked for membership
    in the MinHash banding's candidate set, and recall is reported PER
    TRUE-SIMILARITY BAND (500-599 … 900-999, 1000 milli). Where
    `calibracion_lsh` predicts the 1−(1−s^r)^b S-curve from theory,
    this measures the curve the 4×4 banding actually achieved on THIS
    corpus — high-J bands should sit near 1000 and the near-threshold
    band is where the two diverge; a gap bigger than the theory's at
    high J means the signature permutations, not the banding math, are
    the problem. (Any candidate with true J ≥ τ survives verification
    by construction, so candidate membership IS found-by-LSH for these
    rows.)

    Shape: both pair generators are the session-shared dedup frames
    (one shingle materialization feeds the prefix join and the
    signature banding); the membership check is one pair-keyed left
    join; output is ≤6 bands."""
    sh = _shingles(spark, sf_dir)
    exactos = dedup_ngram_jaccard(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        F.round(F.col("jaccard") * 1000).cast("long").alias("milli"),
    )
    candidatos = _lsh_candidatos(sh).withColumn("hallado", F.lit(1))
    marcado = exactos.join(candidatos, ["doc_a", "doc_b"], "left").select(
        F.expr("(milli div 100) * 100").alias("banda"),
        F.coalesce("hallado", F.lit(0)).alias("hallado"),
    )
    return marcado.groupBy("banda").agg(
        F.count(F.lit(1)).cast("bigint").alias("exactos"),
        F.sum("hallado").cast("bigint").alias("hallados"),
        F.expr("CAST((1000 * sum(hallado)) div count(1) AS BIGINT)").alias(
            "recall_mili"
        ),
    ).select(
        F.col("banda").cast("bigint").alias("banda_mili"),
        "exactos",
        "hallados",
        "recall_mili",
    )


# --------------------------------------------------------------------------
# Dedup clustering — connected components over near-dup pairs
# --------------------------------------------------------------------------

_CLUSTER_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_SQL.strip()},
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
aristas AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.doc_a
    JOIN tam tb ON tb.doc_id = i.doc_b
    WHERE 2 * i.c >= (ta.n + tb.n - i.c)
),
sym AS (SELECT doc_a AS a, doc_b AS b FROM aristas
        UNION SELECT doc_b, doc_a FROM aristas),
nodos AS (SELECT DISTINCT a AS n FROM sym),
reach(n, m) AS (
    SELECT n, n FROM nodos
    UNION
    SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
),
comp AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n)
SELECT doc_id, cluster_id, doc_id = cluster_id AS representante
FROM comp
"""


# Driver-state guard for the CC fast path below: under this many
# SYMMETRIC edges (2x the undirected pair count) the component labels
# compute on the driver in one collect; past it the distributed
# propagate+shortcut loop runs. Near-dup edge lists track TRUE
# duplicates (the prefix filter keeps candidates near-linear), so even
# the clone-heavy 10x replica sits thousands of times under this cap —
# but a 100 TB corpus with a pathological duplicate mass still has the
# distributed path, same answer.
_CC_COLLECT_CAP = 200_000


def propagate_min_labels(sym: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Distributed connected components via min-label propagation WITH
    POINTER JUMPING over a symmetric edge list (src, dst). Each round:

    1. propagate — label = min(label, neighbors' labels): one shuffled
       join+groupBy, the standard large-graph CC shape;
    2. shortcut — label = label(label): labels self-join, the
       pointer-jumping step of Shiloach-Vishkin-style CC. Labels are
       always node ids, so chasing one hop per round halves the
       remaining pointer depth — convergence drops from O(diameter) to
       O(log diameter) rounds, which is what makes a 20-round cap safe
       for ANY real component (a diameter-1M chain converges in ~20
       propagate+shortcut rounds).

    iter_checkpoint truncates the growing lineage each round
    (localCheckpoint by default; reliable+replayable when
    SPARK_GRAFT_CHECKPOINT_DIR is set — executor loss mid-iteration then
    replays from the checkpoint store instead of failing the job).

    Correctness of the stop condition is unchanged by shortcutting: we
    stop only when a PROPAGATE step changes nothing, i.e. at a fixed
    point of plain min-propagation, where every label equals its
    component minimum. The cap remains a loud safety bound: on the
    pathological non-convergence it raises instead of returning wrong
    cluster_ids."""
    # SMALL-GRAPH FAST PATH (guide §2.4/§5 — the near-dup edge list is
    # bounded by true duplicate pairs, orders of magnitude below the
    # corpus): when the edge list fits under the driver cap, collect it
    # once and run union-find-by-min-root — the same min-label fixed
    # point, bit for bit (the per-cell applyInPandas CC in
    # similarity.py uses the identical algebra), for ONE job instead of
    # rounds × (2 joins + checkpoint + count) ≈ 10-18 scheduled jobs.
    # The result returns as a LocalRelation, so downstream joins against
    # the labels BROADCAST instead of shuffling. Past the cap the
    # distributed propagate+shortcut loop below runs unchanged — the
    # 100 TB regime, where the edge list may be data-sized (the
    # _PROBE_COLLECT_CAP dispatch discipline).
    #
    # The edge list materializes ONCE (eager checkpoint) BEFORE the
    # capped collect: when the true edge count is under the cap —
    # every measured dataset — CollectLimit's scale-up loop never
    # satisfies its limit, so collecting the raw lineage would run
    # log(partitions) sequential jobs that each re-execute the pair
    # chain (r15 A/B: the "collect first, checkpoint on the over-cap
    # branch" variant DOUBLED the fold wall, 10 → 21 s at sf0.1).
    sym = iter_checkpoint(sym)
    filas = sym.limit(_CC_COLLECT_CAP + 1).collect()
    if len(filas) <= _CC_COLLECT_CAP:
        parent: dict[int, int] = {}

        def _find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for fila in filas:
            s, d = int(fila["src"]), int(fila["dst"])
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = _find(s), _find(d)
            if rs != rd:
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo
        # ONE slice at parallelize time: the frame is ≤ _CC_COLLECT_CAP
        # rows by construction, and the default parallelization spread
        # it over defaultParallelism pickled slices — every task over
        # the frame then paid one Python-worker partition evaluation
        # per core (measured: a 4.5k-row table write read 2.8 s at 32
        # slices, 0.33 s at one; a coalesce(1) on top was WORSE, 4.7 s,
        # one task walking all 32 python partitions sequentially), and
        # a downstream table write produced one near-empty file per
        # core (guide §6: small files hurt twice).
        from etl_python_airflow_bigquery_spark.functions import local_df

        return local_df(
            sym.sparkSession,
            [(n, _find(n)) for n in parent],
            "doc_id BIGINT, cluster_id BIGINT",
        )
    labels = sym.select(F.col("src").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    changed = -1
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster_id").alias("vecino_min"))
        )
        # the OLD label rides along as `viejo`, so the convergence count
        # below is a filter over the checkpointed frame — not an extra
        # join job per round. Labels are monotone non-increasing
        # (propagate takes a min including self; the jump follows the
        # label to ITS label, which is ≤ it), so old-vs-new equality is
        # exactly the propagate fixed point the docstring's stop
        # condition requires.
        propagated = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.col("cluster_id").alias("viejo"),
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("vecino_min"), F.col("cluster_id")),
            ).alias("cluster_id"),
        )
        # pointer jump: follow the label's own label one hop
        jumped = (
            propagated.alias("a")
            .join(
                propagated.select(
                    F.col("doc_id").alias("b_id"),
                    F.col("cluster_id").alias("b_cluster"),
                ),
                F.col("a.cluster_id") == F.col("b_id"),
                "left",
            )
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("a.viejo").alias("viejo"),
                F.coalesce(F.col("b_cluster"), F.col("a.cluster_id")).alias(
                    "cluster_id"
                ),
            )
        )
        jumped = iter_checkpoint(jumped)
        changed = jumped.where(F.col("cluster_id") != F.col("viejo")).count()
        labels = jumped.select("doc_id", "cluster_id")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            "propagate_min_labels: did not converge within "
            f"{max_rounds} rounds; component diameter exceeds the cap"
        )
    return labels


@register("dedup_clusters", oracle=_CLUSTER_ORACLE, ops=("DD4", "DD2"),
          driver=False)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ENDGAME: near-dup pairs (Jaccard ≥ 0.5) form a graph;
    connected components assign every duplicate family one cluster_id
    (its minimum doc_id) so exactly one representative survives —
    transitively: if A≈B and B≈C, all three dedupe together even when
    A and C don't pair directly.

    Distributed algorithm: iterative min-label propagation over the
    symmetric edge list (each round: label = min(label, neighbors'
    labels); converges in O(diameter) rounds ≈ O(log n) for near-dup
    families). Each round is one shuffled join+groupBy — the standard
    large-graph CC shape, no driver-side graph. The driver loop only
    checks the SCALAR converged-count per round. Oracle: DuckDB
    recursive-CTE transitive closure.

    Edge generation REUSES the prefix-filtered exact-Jaccard plan
    (``dedup_ngram_jaccard``) — round 1 built edges with the naive
    posting self-join, which was the same quadratic-in-df shape the
    prefix filter retired; the pair set is identical (both exact at
    τ = 0.5), so the oracle is unchanged."""
    aristas = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    sym = aristas.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        aristas.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = propagate_min_labels(sym)
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("representante"),
    )


# --------------------------------------------------------------------------
# Family-size distribution — the "template blob" audit over the clusters
# --------------------------------------------------------------------------


def _familias_tamanos_oracle() -> str:
    from etl_python_airflow_bigquery_spark.functions import _log2_ladder

    comp_ctes = _CLUSTER_ORACLE.split("WITH RECURSIVE", 1)[1].rsplit(
        "SELECT doc_id", 1
    )[0].strip().rstrip(",")
    return f"""
WITH RECURSIVE {comp_ctes},
tamf AS (SELECT cluster_id, count(*) AS tam FROM comp GROUP BY 1),
sing AS (
    SELECT count(*) AS s FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM comp c WHERE c.doc_id = d.doc_id)
)
SELECT CAST({_log2_ladder("tam")} AS INT) AS banda_log2,
       CAST(count(*) AS BIGINT) AS familias,
       CAST(sum(tam) AS BIGINT) AS docs,
       CAST(max(tam) AS BIGINT) AS tam_max,
       CAST(min(tam) AS BIGINT) AS tam_min
FROM tamf GROUP BY 1
UNION ALL
SELECT 0, CAST(s AS BIGINT), CAST(s AS BIGINT),
       CAST(1 AS BIGINT), CAST(1 AS BIGINT)
FROM sing WHERE s > 0"""


@register("tamanos_familias", oracle=_familias_tamanos_oracle(),
          ops=("DD4", "A1"), bench=True, driver=False)
def tamanos_familias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUP FAMILY-SIZE DISTRIBUTION, log2-banded — the audit that
    reads the dedup graph's SHAPE before anyone trusts its output: a
    corpus whose mass sits in a few giant bands is template/boilerplate
    blob material (one mirror dominating the crawl), while a healthy
    near-dup profile is singleton-heavy with a thin geometric tail —
    and the band histogram is exactly what sizes the retention win
    corpus_desduplicado will realize (docs − familias per band = rows
    removed). Singleton docs (no near-dup edge at all) report as band
    0 via an anti join against the cluster map — they never enter the
    label propagation, so the audit is complete over the corpus, not
    just the connected part. Reuses the session-shared cluster build
    (dedup_clusters ← the prefix-filtered pair engine); its own work is
    a families-sized roll-up + one broadcast anti join. Oracle: the
    recursive-CTE closure + the same banding ladder."""
    from etl_python_airflow_bigquery_spark.functions import _log2_ladder

    clusters = dedup_clusters(spark, sf_dir).localCheckpoint(eager=False)
    tamf = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("tam"))
    bandas = tamf.groupBy(
        F.expr(_log2_ladder("tam")).cast("int").alias("banda_log2")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("familias"),
        F.sum("tam").cast("bigint").alias("docs"),
        F.max("tam").cast("bigint").alias("tam_max"),
        F.min("tam").cast("bigint").alias("tam_min"),
    )
    docs = load_table(spark, sf_dir, "documents")
    sing = (
        docs.select("doc_id")
        .join(F.broadcast(clusters.select("doc_id")), "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") > 0)
        .select(
            F.lit(0).cast("int").alias("banda_log2"),
            F.col("s").cast("bigint").alias("familias"),
            F.col("s").cast("bigint").alias("docs"),
            F.lit(1).cast("bigint").alias("tam_max"),
            F.lit(1).cast("bigint").alias("tam_min"),
        )
    )
    return bandas.unionByName(sing)


# --------------------------------------------------------------------------
# Incremental dedup — the daily-ingest shape: batch probes the index
# --------------------------------------------------------------------------

_INCREMENTAL_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
nuevos AS (
    SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0
),
corpus AS (
    SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 != 0
),
exacto AS (
    SELECT n.doc_id, min(c.doc_id) AS dup
    FROM nuevos n JOIN corpus c ON c.h = n.h
    GROUP BY 1
),
inter AS (
    SELECT a.doc_id AS nuevo, b.doc_id AS viejo, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s
    WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
    GROUP BY 1, 2
),
cercano AS (
    SELECT i.nuevo AS doc_id, min(i.viejo) AS dup
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.nuevo
    JOIN tam tb ON tb.doc_id = i.viejo
    WHERE 2 * i.c >= ta.n + tb.n - i.c
    GROUP BY 1
)
SELECT n.doc_id,
       CASE WHEN e.dup IS NOT NULL THEN 'exacto'
            WHEN c2.dup IS NOT NULL THEN 'cercano'
            ELSE 'nuevo' END AS estado,
       CAST(coalesce(e.dup, c2.dup) AS BIGINT) AS dup_de
FROM nuevos n
LEFT JOIN exacto e ON e.doc_id = n.doc_id
LEFT JOIN cercano c2 ON c2.doc_id = n.doc_id
"""


@register("dedup_incremental", oracle=_INCREMENTAL_ORACLE,
          ops=("DD1", "DD4", "J2"), driver=False)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the shape a daily ingest actually runs at
    100 TB: the NEW BATCH (here every 10th doc_id) probes the existing
    corpus's indexes instead of re-deduplicating everything. Two tiers,
    cheapest first: (1) exact — the batch's text hashes equi-join the
    corpus hash index; (2) near — the batch's shingle postings equi-join
    the CORPUS posting index (cost ∝ batch postings × df, never
    corpus²), candidates verified with the map-side exact-Jaccard
    arrays. Each new doc lands as 'exacto' (byte-identical to dup_de),
    'cercano' (J ≥ 0.5 with dup_de), or 'nuevo'. The posting and hash
    indexes are exactly what `dedup_ngram_jaccard` / `dedup_exact`
    maintain — this op is their read path."""
    docs = load_table(spark, sf_dir, "documents")
    es_nuevo = F.col("doc_id") % 10 == 0
    nuevos = docs.where(es_nuevo).select("doc_id", F.md5("text").alias("h"))
    corpus = docs.where(~es_nuevo).select(
        F.col("doc_id").alias("viejo"), F.md5("text").alias("h")
    )
    exacto = (
        nuevos.join(corpus, "h")
        .groupBy("doc_id")
        .agg(F.min("viejo").alias("dup_exacto"))
    )

    sh = _shingles(spark, sf_dir)
    shn = sh.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("doc_a"), "s"
    )
    shc = sh.where(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("doc_b"), "s"
    )
    candidatos = shn.join(shc, "s").select("doc_a", "doc_b").distinct()
    verificados = _verify_jaccard(candidatos, sh)
    cercano = verificados.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.min("doc_b").alias("dup_cercano")
    )

    out = (
        nuevos.select("doc_id")
        .join(exacto, "doc_id", "left")
        .join(cercano, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.when(F.col("dup_exacto").isNotNull(), F.lit("exacto"))
        .when(F.col("dup_cercano").isNotNull(), F.lit("cercano"))
        .otherwise(F.lit("nuevo"))
        .alias("estado"),
        F.coalesce("dup_exacto", "dup_cercano").cast("bigint").alias("dup_de"),
    )


# --------------------------------------------------------------------------
# Dedup ENDGAME application — the deduplicated corpus itself
# --------------------------------------------------------------------------

_CORPUS_DEDUP_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_SQL.strip()},
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
aristas AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.doc_a
    JOIN tam tb ON tb.doc_id = i.doc_b
    WHERE 2 * i.c >= (ta.n + tb.n - i.c)
),
sym AS (SELECT doc_a AS a, doc_b AS b FROM aristas
        UNION SELECT doc_b, doc_a FROM aristas),
nodos AS (SELECT DISTINCT a AS n FROM sym),
reach(n, m) AS (
    SELECT n, n FROM nodos
    UNION
    SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
),
comp AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
descartados AS (SELECT doc_id FROM comp WHERE doc_id != cluster_id)
SELECT d.source, d.lang,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS tokens,
       CAST((SELECT count(*) FROM descartados) AS BIGINT) AS docs_descartados
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM descartados)
GROUP BY 1, 2
"""


@register("dedup_estado_incremental", oracle=_INCREMENTAL_ORACLE,
          ops=("DD1", "DD4", "J2"), driver=True, bench=True)
def dedup_estado_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_incremental`` SERVED FROM THE PERSISTENT DEDUP STATE
    (operators/dedup_state.py — the third stored-index family): the
    established world (doc_id % 10 != 0) is built ONCE into stored
    hash/posting/array/label tables, and the batch (every 10th doc)
    probes those tables stats-pruned to its own values instead of
    rebuilding corpus-side frames inline. The prefix-filter engine is
    exact, so the classification hash-matches the inline row's oracle
    bit for bit — the strongest possible statement that the stored
    read path changed only the SCAN shape, not the answer. Cold
    contract: the build runs inside the call (bench honesty), like the
    other serving rows."""
    import tempfile as _tempfile

    from etl_python_airflow_bigquery_spark.operators.dedup_state import (
        build_dedup_state,
        ingest_dedup_state,
    )

    import shutil as _shutil

    docs = load_table(spark, sf_dir, "documents")
    path = _tempfile.mkdtemp(prefix="dedup_state_")
    try:
        build_dedup_state(spark, docs.where(F.col("doc_id") % 10 != 0), path)
        # materialize BEFORE the cleanup (localCheckpoint severs the
        # lineage from the state tables) so the returned frame survives
        # the rmtree — ADVICE r13: repeated bench/correctness runs were
        # leaking corpus-sized temp state dirs per invocation
        return ingest_dedup_state(
            spark, docs.where(F.col("doc_id") % 10 == 0), path
        ).localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(path, ignore_errors=True)


_CLASIFICACION_PINADA_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
lote AS (
    SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 20 = 10
),
corpus_ayer AS (
    SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 != 0
),
corpus_hoy AS (
    SELECT doc_id, md5(text) AS h FROM documents
    WHERE doc_id % 10 != 0 OR doc_id % 20 = 0
),
exacto_a AS (
    SELECT l.doc_id, min(c.doc_id) AS dup
    FROM lote l JOIN corpus_ayer c ON c.h = l.h GROUP BY 1
),
exacto_h AS (
    SELECT l.doc_id, min(c.doc_id) AS dup
    FROM lote l JOIN corpus_hoy c ON c.h = l.h GROUP BY 1
),
inter_a AS (
    SELECT a.doc_id AS nuevo, b.doc_id AS viejo, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s
    WHERE a.doc_id % 20 = 10 AND b.doc_id % 10 != 0
    GROUP BY 1, 2
),
inter_h AS (
    SELECT a.doc_id AS nuevo, b.doc_id AS viejo, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s
    WHERE a.doc_id % 20 = 10
      AND (b.doc_id % 10 != 0 OR b.doc_id % 20 = 0)
    GROUP BY 1, 2
),
cercano_a AS (
    SELECT i.nuevo AS doc_id, min(i.viejo) AS dup
    FROM inter_a i
    JOIN tam ta ON ta.doc_id = i.nuevo
    JOIN tam tb ON tb.doc_id = i.viejo
    WHERE 2 * i.c >= ta.n + tb.n - i.c
    GROUP BY 1
),
cercano_h AS (
    SELECT i.nuevo AS doc_id, min(i.viejo) AS dup
    FROM inter_h i
    JOIN tam ta ON ta.doc_id = i.nuevo
    JOIN tam tb ON tb.doc_id = i.viejo
    WHERE 2 * i.c >= ta.n + tb.n - i.c
    GROUP BY 1
)
SELECT l.doc_id,
       CASE WHEN ea.dup IS NOT NULL THEN 'exacto'
            WHEN ca.dup IS NOT NULL THEN 'cercano'
            ELSE 'nuevo' END AS estado_ayer,
       CAST(coalesce(ea.dup, ca.dup) AS BIGINT) AS dup_ayer,
       CASE WHEN eh.dup IS NOT NULL THEN 'exacto'
            WHEN ch.dup IS NOT NULL THEN 'cercano'
            ELSE 'nuevo' END AS estado_hoy,
       CAST(coalesce(eh.dup, ch.dup) AS BIGINT) AS dup_hoy
FROM lote l
LEFT JOIN exacto_a ea ON ea.doc_id = l.doc_id
LEFT JOIN cercano_a ca ON ca.doc_id = l.doc_id
LEFT JOIN exacto_h eh ON eh.doc_id = l.doc_id
LEFT JOIN cercano_h ch ON ch.doc_id = l.doc_id
"""


# bench=False deliberately (the busqueda_bm25_indexada precedent): the
# row's cold contract stacks FOUR lifecycle stages (build + fenced
# ingest + two classifications ≈ 65 s at sf0.1, flat at 10× — measured
# in BASELINE.md round-14), and the shared machinery is already
# regression-gated by dedup_estado_incremental's bench row; this row's
# unique surface (the pinned read path) is value-checked by its driver
# seat + the 3-SF oracle.
@register("dedup_clasificacion_pinada", oracle=_CLASIFICACION_PINADA_ORACLE,
          ops=("DD1", "DD4", "J2"), driver=True, bench=False)
def dedup_clasificacion_pinada(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TRAVEL CLASSIFICATION AUDIT over the persistent dedup state
    (VERDICT r13 #8): the established world (doc_id % 10 != 0) builds
    the stored state, the snapshot is PINNED (``pin_dedup_version`` —
    tags as GC roots, the contract every index family shares), batch A
    (doc_id % 20 == 0) folds in via the fenced ingest, and THEN batch B
    (doc_id % 20 == 10) is classified twice from the same store:
    against the PINNED pre-A snapshot ("what would yesterday's memory
    have said") and against the current snapshot. Output per B-doc:
    (estado_ayer, dup_ayer, estado_hoy, dup_hoy) — rows whose verdicts
    differ are exactly the docs whose duplicates arrived IN batch A,
    the provenance question a classification audit answers. Oracle:
    both classifications replayed inline against the two corpus
    predicates; the pinned read path changing only the SNAPSHOT, never
    the algebra, is the claim the hash match pins."""
    import shutil as _shutil
    import tempfile as _tempfile

    from etl_python_airflow_bigquery_spark.operators.dedup_state import (
        build_dedup_state,
        classify_dedup_state,
        ingest_dedup_state,
        pin_dedup_version,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = _tempfile.mkdtemp(prefix="dedup_pin_")
    try:
        build_dedup_state(spark, docs.where(F.col("doc_id") % 10 != 0), path)
        pins = pin_dedup_version(path, "ayer")
        ingest_dedup_state(
            spark, docs.where(F.col("doc_id") % 20 == 0), path,
            txn=("clasificacion_pinada", 0),
        )
        lote_b = docs.where(F.col("doc_id") % 20 == 10)
        ayer = classify_dedup_state(spark, lote_b, path, pins=pins).select(
            "doc_id",
            F.col("estado").alias("estado_ayer"),
            F.col("dup_de").alias("dup_ayer"),
        )
        hoy = classify_dedup_state(spark, lote_b, path).select(
            "doc_id",
            F.col("estado").alias("estado_hoy"),
            F.col("dup_de").alias("dup_hoy"),
        )
        return ayer.join(hoy, "doc_id").localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(path, ignore_errors=True)


_INGESTA_MULTILOTE_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
lotes AS (
    SELECT doc_id, md5(text) AS h,
           CASE WHEN doc_id % 30 = 0 THEN 1
                WHEN doc_id % 30 = 10 THEN 2
                ELSE 3 END AS lote
    FROM documents WHERE doc_id % 10 = 0
),
visibles AS (
    SELECT doc_id, md5(text) AS h, 0 AS lote
    FROM documents WHERE doc_id % 10 != 0
    UNION ALL
    SELECT doc_id, h, lote FROM lotes
),
exacto AS (
    SELECT l.doc_id, min(v.doc_id) AS dup
    FROM lotes l JOIN visibles v ON v.h = l.h AND v.lote < l.lote
    GROUP BY 1
),
inter AS (
    SELECT a.doc_id AS nuevo, b.doc_id AS viejo, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s
    WHERE a.doc_id % 10 = 0
      AND (b.doc_id % 10 != 0
           OR (CASE WHEN b.doc_id % 30 = 0 THEN 1
                    WHEN b.doc_id % 30 = 10 THEN 2 ELSE 3 END)
              < (CASE WHEN a.doc_id % 30 = 0 THEN 1
                      WHEN a.doc_id % 30 = 10 THEN 2 ELSE 3 END))
    GROUP BY 1, 2
),
cercano AS (
    SELECT i.nuevo AS doc_id, min(i.viejo) AS dup
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.nuevo
    JOIN tam tb ON tb.doc_id = i.viejo
    WHERE 2 * i.c >= ta.n + tb.n - i.c
    GROUP BY 1
)
SELECT CAST(l.lote AS INT) AS lote, l.doc_id,
       CASE WHEN e.dup IS NOT NULL THEN 'exacto'
            WHEN c2.dup IS NOT NULL THEN 'cercano'
            ELSE 'nuevo' END AS estado,
       CAST(coalesce(e.dup, c2.dup) AS BIGINT) AS dup_de
FROM lotes l
LEFT JOIN exacto e ON e.doc_id = l.doc_id
LEFT JOIN cercano c2 ON c2.doc_id = l.doc_id
"""


# bench=False by the dedup_clasificacion_pinada precedent: the row's
# cold contract stacks a full state build ahead of the fold, and the
# amortization claim itself is measured where it's legible — the
# families.dedup_state bench entry times the SAME two lotes folded
# sequentially and as one multi call against prebuilt states, so the
# plan-constant saving reads directly without the build in the way.
@register("dedup_ingesta_multilote", oracle=_INGESTA_MULTILOTE_ORACLE,
          ops=("DD1", "DD4", "J2"), driver=False, bench=False)
def dedup_ingesta_multilote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-BATCH dedup-state fold (``ingest_dedup_state_lotes``): the
    %10 batch arrives as THREE ordered lotes (doc_id % 30 ∈ {0,10,20}
    → lotes 1..3) folded into the stored state in ONE call — one
    classification plan, one label fold, one commit set, instead of
    three of each. The amortization target is the ~17 s per-call plan
    constant that dominates realistic batch sizes (VERDICT r13).

    Per-doc verdicts are SEQUENTIAL semantics: a lote-2 doc sees the
    established corpus plus lote 1, never lote 3 — the oracle replays
    that visibility rule inline (partners visible iff corpus or
    strictly-earlier lote), so the value-hash match pins the collapsed
    plan to the k-sequential-ingest answer."""
    import shutil as _shutil
    import tempfile as _tempfile

    from etl_python_airflow_bigquery_spark.operators.dedup_state import (
        build_dedup_state,
        ingest_dedup_state_lotes,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = _tempfile.mkdtemp(prefix="dedup_multilote_")
    try:
        build_dedup_state(spark, docs.where(F.col("doc_id") % 10 != 0), path)
        lotes = docs.where(F.col("doc_id") % 10 == 0).withColumn(
            "lote",
            F.when(F.col("doc_id") % 30 == 0, F.lit(1))
            .when(F.col("doc_id") % 30 == 10, F.lit(2))
            .otherwise(F.lit(3)),
        )
        return ingest_dedup_state_lotes(
            spark, lotes, path, txn=("ingesta_multilote", 0)
        ).localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(path, ignore_errors=True)


@register("corpus_desduplicado", oracle=_CORPUS_DEDUP_ORACLE,
          ops=("DD4", "J7", "A1"), driver=False, bench=True)
def corpus_desduplicado(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's OUTPUT, not just its pair list: near-dup
    families collapse to one representative (min doc_id via connected
    components) and the surviving corpus rolls up per (source, lang)
    with its token budget — what a training run actually consumes, and
    the audit row (docs_descartados) curation dashboards track. Shape:
    the cluster labels (a doc_id → cluster_id map, tiny next to the
    corpus) anti-join the documents scan; at 100 TB the discard set
    broadcasts and the big side is touched once."""
    clusters = dedup_clusters(spark, sf_dir)
    # the discard set is tiny (non-representative near-dups) but its
    # lineage is the whole cluster pipeline — materialize it ONCE so the
    # audit count and the anti-join don't re-run label propagation
    descartados = (
        clusters.where(~F.col("representante"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    n_desc = descartados.count()
    docs = load_table(spark, sf_dir, "documents")
    vivos = docs.join(F.broadcast(descartados), "doc_id", "left_anti")
    return vivos.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tokens"),
        F.lit(n_desc).cast("bigint").alias("docs_descartados"),
    )


# --------------------------------------------------------------------------
# Record linkage — blocked fuzzy matching (the entity-resolution shape)
# --------------------------------------------------------------------------

_VINCULACION_ORACLE = """
WITH p AS (
    SELECT doc_id, lang,
           split_part(text, ' ', 1) AS tok1,
           split_part(text, ' ', 2) AS tok2,
           substring(text, 1, 40) AS firma
    FROM documents
    WHERE length(text) > 0
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
       CAST(levenshtein(a.firma, b.firma) AS INT) AS distancia
FROM p a JOIN p b
  ON a.lang = b.lang AND a.tok1 = b.tok1 AND a.tok2 = b.tok2
     AND a.doc_id < b.doc_id
WHERE levenshtein(a.firma, b.firma) <= 10
"""


@register("vinculacion_registros", oracle=_VINCULACION_ORACLE,
          ops=("DD4", "J1"), driver=False)
def vinculacion_registros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage / entity resolution: find document pairs whose
    40-char signatures are within Levenshtein distance 10, using the
    classic BLOCKING-key design — candidates form only inside
    (lang, first-bigram) blocks via an equi self-join, never an
    all-pairs cross product, and the edit-distance refine runs map-side
    on candidates only. Spark's 3-arg ``levenshtein(l, r, threshold)``
    caps the DP band at the threshold (O(len*k), returns -1 above it),
    so even the refine cost is bounded per pair.

    Scale: candidate volume is SUM(block^2) over (lang, tok1, tok2)
    blocks — proportional to real near-duplicate density, not corpus
    size^2. A pathologically common first bigram is the skew risk; the
    mitigation (widen the block key with a length band, or salt the hot
    block through operators/skew.py) is the same playbook as the
    posting-list dedup family above.
    """
    docs = load_table(spark, sf_dir, "documents")
    p = docs.where(F.length("text") > 0).select(
        "doc_id",
        "lang",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("tok1"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("tok2"),
        F.substring("text", 1, 40).alias("firma"),
    )
    a, b = p.alias("a"), p.alias("b")
    # threshold-capped distance: -1 above the cap, exact value below it
    dist = F.levenshtein(F.col("a.firma"), F.col("b.firma"), 10)
    return (
        a.join(
            b,
            on=[
                F.col("a.lang") == F.col("b.lang"),
                F.col("a.tok1") == F.col("b.tok1"),
                F.col("a.tok2") == F.col("b.tok2"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .where(dist >= 0)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang"),
            dist.cast("int").alias("distancia"),
        )
    )


# --------------------------------------------------------------------------
# LSH recall calibration — observed banding capture per similarity band
# --------------------------------------------------------------------------

_CALIBRACION_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
{_PERMS_SQL},
{_MINSIG_SQL.strip()},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM baldes a
    JOIN baldes b ON a.banda = b.banda AND a.clave = b.clave
                 AND a.doc_id < b.doc_id
),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
verdaderos AS (
    SELECT i.doc_a, i.doc_b,
           floor(CAST(i.c AS DOUBLE) * 1000 / (ta.n + tb.n - i.c)) / 1000
               AS jaccard
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.doc_a
    JOIN tam tb ON tb.doc_id = i.doc_b
    WHERE 2 * i.c >= (ta.n + tb.n - i.c)
)
SELECT CAST(CAST(floor(v.jaccard * 1000 + 0.5) AS BIGINT) // 100 AS INT)
           AS banda_similitud,
       CAST(count(*) AS BIGINT) AS pares_verdaderos,
       CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS pares_capturados,
       CAST((1000 * sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS captura_mili
FROM verdaderos v
LEFT JOIN cand c ON c.doc_a = v.doc_a AND c.doc_b = v.doc_b
GROUP BY 1
"""


@register("calibracion_lsh", oracle=_CALIBRACION_ORACLE, ops=("DD2", "A3"),
          driver=False)
def calibracion_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH RECALL CALIBRATION — the index-quality audit every LSH
    deployment needs before trusting its parameters: for each true
    near-dup similarity band (J in [0.5,0.6), [0.6,0.7), …), what
    fraction did the 4×4 MinHash banding actually CAPTURE as
    candidates? The observed curve is the empirical S-curve
    1−(1−s^r)^b that picks b and r; a capture dip in the [0.5,0.6)
    band is the quantitative signal to add bands before relying on
    banding alone. Ground truth = the exact prefix-filtered Jaccard
    pairs (the session-cached pair frame); candidates = the factored
    banding half of dedup_minhash_lsh, measured BEFORE verification.
    The similarity band recovers the integer milli value
    (floor(j·1000 + 0.5)) before bucketing, so band edges are
    float-proof in both engines."""
    sh = _shingles(spark, sf_dir)
    verdaderos = dedup_ngram_jaccard(spark, sf_dir)
    cand = _lsh_candidatos(sh).withColumn("cap", F.lit(1))
    banda = F.expr(
        "CAST(CAST(floor(jaccard * 1000 + 0.5) AS BIGINT) div 100 AS INT)"
    )
    return (
        verdaderos.join(cand, ["doc_a", "doc_b"], "left")
        .groupBy(banda.alias("banda_similitud"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pares_verdaderos"),
            F.sum(F.coalesce(F.col("cap"), F.lit(0)))
            .cast("bigint")
            .alias("pares_capturados"),
            F.expr(
                "CAST((1000 * sum(coalesce(cap, 0))) div count(*) AS BIGINT)"
            ).alias("captura_mili"),
        )
    )


# --------------------------------------------------------------------------
# Incremental connected components — merge new edges into stored labels
# --------------------------------------------------------------------------


def cc_incremental(labels: DataFrame, aristas_nuevas: DataFrame) -> DataFrame:
    """INCREMENTAL CC: fold a new batch's near-dup edges into STORED
    cluster labels without re-clustering the corpus. Correctness rests
    on the star-contraction property: a component's stored labels form
    a STAR (every doc points at the component minimum), and a star plus
    the new edges has exactly the same connected components as the full
    original graph plus the new edges — so propagation runs over
    O(|labels| + |new edges|) star/batch edges, never the historical
    pair set. New batches can therefore MERGE two old clusters through
    a bridge doc, attach to one, or found their own, all transitively
    correct; convergence is fast because stars have diameter 2 (the
    pointer-jumping cap applies unchanged).

    Inputs: ``labels`` (doc_id, cluster_id) — the stored assignment;
    ``aristas_nuevas`` (src, dst) — undirected new-edge list (batch ↔
    batch and batch ↔ corpus pairs from the dedup_incremental probe).
    Returns the updated (doc_id, cluster_id, representante) frame.
    Pairs with TxTable.changes(): the daily pipeline probes the index
    with the delta (dedup_incremental), feeds the verified pairs here,
    and commits the updated label table — the dedup ENDGAME at
    O(batch), closing the loop corpus_desduplicado runs globally."""
    stars = labels.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("src"), F.col("cluster_id").alias("dst")
    )
    nuevos = aristas_nuevas.select("src", "dst")
    sym_half = stars.unionByName(nuevos)
    sym = sym_half.unionByName(
        sym_half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # isolated stored singletons and isolated new docs never appear in an
    # edge; re-attach them after propagation with their own label
    todos = labels.select("doc_id").unionByName(
        aristas_nuevas.select(F.col("src").alias("doc_id"))
    ).unionByName(
        aristas_nuevas.select(F.col("dst").alias("doc_id"))
    ).distinct()
    propagados = propagate_min_labels(sym)
    return (
        todos.join(propagados, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn(
            "representante", F.col("doc_id") == F.col("cluster_id")
        )
    )


@register("dedup_clusters_incremental", oracle=_CLUSTER_ORACLE,
          ops=("DD4", "DD2"), driver=False)
def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL clustering path measured against the FULL
    recluster's own oracle: the corpus splits into an established world
    (doc_id % 10 ≠ 0, clustered first) and today's batch (every 10th
    doc); the batch's pairs fold into the stored labels via
    :func:`cc_incremental` (star contraction) — and because the star
    merge is EXACT, the result must hash-match `dedup_clusters`' full
    recluster bit for bit, which is precisely what this row's oracle
    (the unchanged full-recluster SQL) checks. The strongest possible
    correctness statement for the incremental path: not 'close', not
    'rows-only' — the same answer.

    Cost shape: the stored world pays its own clustering once
    (amortized across days in production); the daily increment is
    O(batch pairs + labels) — the pair set partitions into old×old
    (consumed by the stored clustering) and anything-touching-batch
    (the increment)."""
    pares = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    viejo_a = F.col("doc_a") % 10 != 0
    viejo_b = F.col("doc_b") % 10 != 0
    pares_viejos = pares.where(viejo_a & viejo_b)
    pares_lote = pares.where(~(viejo_a & viejo_b))
    sym_viejo = pares_viejos.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pares_viejos.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    etiquetas_viejas = propagate_min_labels(sym_viejo).select(
        "doc_id", "cluster_id"
    )
    actualizado = cc_incremental(
        etiquetas_viejas,
        pares_lote.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    )
    # match dedup_clusters' surface: only docs that belong to a pair
    # (old-world singletons enter etiquetas_viejas only through edges,
    # so the union of both edge sets IS the full pair membership)
    con_pares = (
        pares.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pares.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    return actualizado.join(con_pares, "doc_id").select(
        "doc_id", "cluster_id", "representante"
    )


# --------------------------------------------------------------------------
# Leakage-safe split assignment — the FIX for what fuga_particiones finds
# --------------------------------------------------------------------------
# fuga_particiones AUDITS train/test contamination (near-dup pairs that
# straddle a naive per-doc split); this operator is the corresponding
# fix: assign splits per duplicate FAMILY (the dedup_clusters component,
# singletons being their own family), so every near-dup lands on the
# same side by construction. The output carries its own guard column:
# the count of near-dup pairs crossing splits, provably zero.

_FAMILIAS_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_SQL.strip()},
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
aristas AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.doc_a
    JOIN tam tb ON tb.doc_id = i.doc_b
    WHERE 2 * i.c >= (ta.n + tb.n - i.c)
),
sym AS (SELECT doc_a AS a, doc_b AS b FROM aristas
        UNION SELECT doc_b, doc_a FROM aristas),
nodos AS (SELECT DISTINCT a AS n FROM sym),
reach(n, m) AS (
    SELECT n, n FROM nodos
    UNION
    SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
),
comp AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
asig AS (
    SELECT d.doc_id,
           coalesce(c.cluster_id, d.doc_id) AS familia,
           coalesce(len(string_split(d.text, ' ')), 0) AS toks,
           CASE WHEN {_hex_hash_sql("CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)", 10)} < 8
                THEN 'train'
                WHEN {_hex_hash_sql("CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)", 10)} = 8
                THEN 'val' ELSE 'test' END AS particion
    FROM documents d LEFT JOIN comp c USING (doc_id)
),
cruz AS (
    SELECT CAST(count(*) AS BIGINT) AS pares_cruzados
    FROM aristas a
    JOIN asig x ON x.doc_id = a.doc_a
    JOIN asig y ON y.doc_id = a.doc_b
    WHERE x.particion != y.particion
)
SELECT particion,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(count(DISTINCT familia) AS BIGINT) AS familias,
       CAST(sum(toks) AS BIGINT) AS tokens,
       (SELECT pares_cruzados FROM cruz) AS pares_cruzados
FROM asig GROUP BY 1
"""


@register("particion_familias", oracle=_FAMILIAS_ORACLE,
          ops=("DD4", "A8", "J2"), bench=True, driver=False)
def particion_familias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test assignment — the fix paired with the
    `fuga_particiones` audit: the split key is the duplicate FAMILY
    (dedup_clusters' component id; a doc with no near-dups is its own
    family), hashed 8/1/1 into train/val/test, so transitively-linked
    near-duplicates can never straddle a split. The output's
    `pares_cruzados` column re-counts near-dup pairs crossing splits —
    zero BY CONSTRUCTION, and the oracle recomputes the same guard, so
    a regression in the family logic fails the hash match loudly.

    Scale shape: rides the session-cached verified-pair frame and the
    checkpointed min-label propagation (both already materialized by
    any dedup-family pipeline run); the assignment itself is one hash
    projection + a splits-sized roll-up."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.size(F.split("text", " ")), F.lit(0)).alias("toks"),
    )
    comp = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    asig = docs.join(comp, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("cluster_id", "doc_id").alias("familia"),
    ).select(
        "doc_id",
        "toks",
        "familia",
        F.when(hex_hash(F.col("familia").cast("string"), 10) < 8, "train")
        .when(hex_hash(F.col("familia").cast("string"), 10) == 8, "val")
        .otherwise("test")
        .alias("particion"),
    )
    aristas = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    cruz = (
        aristas.join(
            asig.select(F.col("doc_id").alias("doc_a"),
                        F.col("particion").alias("pa")), "doc_a")
        .join(
            asig.select(F.col("doc_id").alias("doc_b"),
                        F.col("particion").alias("pb")), "doc_b")
        .where(F.col("pa") != F.col("pb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pares_cruzados"))
    )
    return (
        asig.groupBy("particion")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.countDistinct("familia").cast("bigint").alias("familias"),
            F.sum("toks").cast("bigint").alias("tokens"),
        )
        .crossJoin(F.broadcast(cruz))
    )


# --------------------------------------------------------------------------
# Cross-modal consistency — do text near-dups agree with embedding space?
# --------------------------------------------------------------------------

from etl_python_airflow_bigquery_spark.queries.similarity import (  # noqa: E402
    _scaled_int_sql,
    _int_vectors,
    _emb,
)

_CONSISTENCIA_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pares AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN tam ta ON ta.doc_id = i.doc_a
    JOIN tam tb ON tb.doc_id = i.doc_b
    WHERE 2 * i.c >= (ta.n + tb.n - i.c)
),
enteros AS (
    SELECT vec_id, {_scaled_int_sql("embedding")} AS ev FROM embeddings
),
normas AS (
    SELECT vec_id,
           CAST(list_sum(list_transform(generate_series(1, 64),
                k -> ev[k] * ev[k])) AS BIGINT) AS nn
    FROM enteros
),
puntuado AS (
    SELECT g.grupo, g.a, g.b,
           CAST(floor(1e6 * CAST(list_sum(list_transform(
                    generate_series(1, 64), k -> ea.ev[k] * eb.ev[k]))
                AS DOUBLE)
                / sqrt(CAST(greatest(na.nn, 1) AS DOUBLE)
                       * CAST(greatest(nb.nn, 1) AS DOUBLE))) AS BIGINT)
               AS cos_micro
    FROM (
        SELECT 'texto_dup' AS grupo, doc_a AS a, doc_b AS b FROM pares
        UNION ALL
        SELECT 'control', e.vec_id, e.vec_id + 1
        FROM enteros e JOIN enteros e2 ON e2.vec_id = e.vec_id + 1
    ) g
    JOIN enteros ea ON ea.vec_id = g.a
    JOIN enteros eb ON eb.vec_id = g.b
    JOIN normas na ON na.vec_id = g.a
    JOIN normas nb ON nb.vec_id = g.b
)
SELECT grupo,
       CAST(count(*) AS BIGINT) AS pares,
       CAST(CASE WHEN count(*) = 0 THEN 0
            ELSE sum(cos_micro) // count(*) END AS BIGINT)
           AS cos_promedio_micro
FROM puntuado GROUP BY 1
"""


@register("consistencia_modalidades", oracle=_CONSISTENCIA_ORACLE,
          ops=("DD4", "DD5", "A3"), driver=False, bench=True)
def consistencia_modalidades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODAL CONSISTENCY audit — the bridge between the two
    near-dup families: for text near-duplicate pairs (exact Jaccard ≥
    0.5) whose BOTH sides also have embeddings, the mean embedding
    cosine, next to an adjacent-id CONTROL pairing (ids are arbitrary,
    so consecutive ids are an unbiased random-pair stand-in that costs
    n rows, never n²). If the embedding model is healthy, texto_dup
    sits far above control; convergence of the two is the drift alarm
    that the embeddings stopped encoding content. Cosines are
    floor-micro integers (the established cross-engine device), means
    are integer divisions.

    Shape: rides the session-cached verified pair frame; the control
    group is a self-join on vec_id+1 (equi); scoring joins are
    vec_id-keyed; output is 2 rows."""
    pares = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).withColumn("grupo", F.lit("texto_dup"))
    enteros = _int_vectors(_emb(spark, sf_dir))
    control = (
        enteros.select(F.col("vec_id").alias("a"))
        .join(
            enteros.select((F.col("vec_id") - 1).alias("a"),
                           F.col("vec_id").alias("b")),
            "a",
        )
        .withColumn("grupo", F.lit("control"))
    )
    grupos = pares.unionByName(control.select("a", "b", "grupo"))
    normas = enteros.select(
        "vec_id",
        F.expr(
            "aggregate(zip_with(ev, ev, (x, y) -> x * y), 0L, (p, v) -> p + v)"
        ).alias("nn"),
    )
    puntuado = (
        grupos.join(
            enteros.select(F.col("vec_id").alias("a"), F.col("ev").alias("ea")),
            "a",
        )
        .join(
            enteros.select(F.col("vec_id").alias("b"), F.col("ev").alias("eb")),
            "b",
        )
        .join(normas.select(F.col("vec_id").alias("a"),
                            F.col("nn").alias("na")), "a")
        .join(normas.select(F.col("vec_id").alias("b"),
                            F.col("nn").alias("nb")), "b")
        .select(
            "grupo",
            F.floor(
                F.lit(1e6)
                * F.expr(
                    "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0L,"
                    " (p, v) -> p + v)"
                ).cast("double")
                / F.sqrt(
                    F.greatest(F.col("na"), F.lit(1)).cast("double")
                    * F.greatest(F.col("nb"), F.lit(1)).cast("double")
                )
            ).cast("bigint").alias("cos_micro"),
        )
    )
    return puntuado.groupBy("grupo").agg(
        F.count(F.lit(1)).cast("bigint").alias("pares"),
        F.expr(
            "CAST(CASE WHEN count(*) = 0 THEN 0 "
            "ELSE sum(cos_micro) div count(*) END AS BIGINT)"
        ).alias("cos_promedio_micro"),
    )


# --------------------------------------------------------------------------
# Source-level MinHash sketch union — mergeability demonstrated + audited
# --------------------------------------------------------------------------
# The property that makes MinHash a DISTRIBUTED sketch: the signature of
# a UNION is the elementwise min of the parts' signatures, so per-shard
# sketches merge associatively with no re-scan. This op runs that at the
# source level — each source's sketch is the min over its shingles
# (identically: the merge of its docs' sketches) — and AUDITS the
# estimator against the exact pairwise source Jaccard, which is
# affordable here precisely because sources are few while docs are not.

_FUENTES_ORACLE = f"""
WITH {_SHINGLES_SQL.strip()},
{_PERMS_SQL},
fs AS (
    SELECT DISTINCT d.source, sh.s
    FROM sh JOIN documents d USING (doc_id)
),
tamf AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM fs GROUP BY 1),
interf AS (
    SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS c
    FROM fs a JOIN fs b ON a.s = b.s AND a.source < b.source
    GROUP BY 1, 2
),
h0 AS (SELECT source, s % {_MERSENNE} AS h FROM fs),
minh AS (
    SELECT h0.source, p.i, min((p.a * h0.h + p.b) % {_MERSENNE}) AS mh
    FROM h0 CROSS JOIN perms p
    GROUP BY 1, 2
),
coinc AS (
    SELECT a.source AS sa, b.source AS sb,
           CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS m
    FROM minh a JOIN minh b ON a.i = b.i AND a.source < b.source
    GROUP BY 1, 2
)
SELECT ta.source AS fuente_a, tb.source AS fuente_b,
       CAST((1000 * coalesce(i.c, 0))
            // (ta.n + tb.n - coalesce(i.c, 0)) AS BIGINT)
           AS jaccard_exacto_milli,
       CAST((1000 * co.m) // {_N_PERM} AS BIGINT) AS jaccard_estimado_milli,
       co.m AS coincidencias
FROM tamf ta
JOIN tamf tb ON ta.source < tb.source
LEFT JOIN interf i ON i.sa = ta.source AND i.sb = tb.source
JOIN coinc co ON co.sa = ta.source AND co.sb = tb.source
"""


@register("similitud_fuentes", oracle=_FUENTES_ORACLE,
          ops=("DD2", "A3", "J9"), driver=False, bench=True)
def similitud_fuentes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-level MinHash sketch union, audited: each ingest source's
    16-permutation sketch is the min over its shingle set — which, by
    the mergeability property that makes MinHash a distributed sketch,
    equals the elementwise merge of its documents' sketches (per-shard
    sketches union associatively with no re-scan at 100 TB). The
    pairwise matching-coordinate estimate of source-vs-source Jaccard
    sits next to the EXACT pairwise Jaccard in the output — affordable
    as an audit precisely because sources are few while documents are
    not; at scale only the sketches travel.

    Shape: shingles ride the session-cached posting frame; the sketch
    is one (source ×16)-cell aggregation; exact intersection is an
    equi self-join on the shingle hash; everything downstream is
    sources²-sized."""
    sh = _shingles(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    fs = sh.join(docs, "doc_id").select("source", "s").distinct()
    tamf = fs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    interf = (
        fs.alias("a")
        .join(
            fs.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    h0 = fs.select("source", (F.col("s") % _MERSENNE).alias("h"))
    firmas = h0.groupBy("source").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _MERSENNE).alias(f"m{i}")
            for i, a, b in _perm_params()
        ]
    )
    a, b = firmas.alias("a"), firmas.alias("b")
    m_expr = sum(
        F.when(F.col(f"a.m{i}") == F.col(f"b.m{i}"), 1).otherwise(0)
        for i, _, _ in _perm_params()
    )
    coinc = (
        a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("sa"),
            F.col("b.source").alias("sb"),
            m_expr.cast("bigint").alias("m"),
        )
    )
    ta = tamf.select(F.col("source").alias("fuente_a"), F.col("n").alias("na"))
    tb = tamf.select(F.col("source").alias("fuente_b"), F.col("n").alias("nb"))
    return (
        ta.join(F.broadcast(tb), F.col("fuente_a") < F.col("fuente_b"))
        .join(
            interf,
            (F.col("sa") == F.col("fuente_a")) & (F.col("sb") == F.col("fuente_b")),
            "left",
        )
        .join(
            coinc.withColumnsRenamed({"sa": "ca", "sb": "cb"}),
            (F.col("ca") == F.col("fuente_a")) & (F.col("cb") == F.col("fuente_b")),
        )
        .select(
            "fuente_a",
            "fuente_b",
            F.expr(
                "CAST((1000 * coalesce(c, 0L))"
                " div (na + nb - coalesce(c, 0L)) AS BIGINT)"
            ).alias("jaccard_exacto_milli"),
            F.expr(f"CAST((1000 * m) div {_N_PERM} AS BIGINT)").alias(
                "jaccard_estimado_milli"
            ),
            F.col("m").alias("coincidencias"),
        )
    )
