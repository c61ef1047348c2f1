"""Deduplication operators for training-data pipelines (SURVEY.md §7
Phase 4): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.

Scale design (the point of every choice here):
- Nothing ever materializes the O(n²) pair space. Candidate pairs
  come from equi-joins on LSH bucket keys — hash-shuffle joins
  Catalyst executes sort-merge/broadcast as appropriate.
- MinHash/Jaccard math is JVM-side array functions (no UDF);
  SimHash uses one Arrow-batched pandas UDF (bit-twiddling is not
  expressible in codegen-friendly form).
- Each stage is a plain DataFrame → the optimizer prunes columns
  into the parquet scan (only ``text``/``embedding`` + id are read).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import vectors as V
from .materialize import pin


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input arrives in fewer partitions (single-file test tables read as
    one split -> every CPU-heavy map stage below would run on one
    core). No-op at real scale where inputs already have many splits —
    the guard keeps us from adding a pointless shuffle there.

    The probe is ``df.rdd.getNumPartitions()``: it builds the RDD
    lineage driver-side once per operator call, but it is the only
    probe that sees the TRUE scan parallelism (a single parquet file
    still splits into many partitions under maxPartitionBytes — a
    file-count heuristic would shuffle those DOWN and serialize the
    downstream pandas/HOF stages)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct text (md5 fingerprint), keeping the
    smallest id — the canonical exact-dedup pass."""
    fp = TX.fingerprint(F.col(text_col)).alias("fingerprint")
    ranked = df.select(F.col(id_col), fp).groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("dup_count")
    )
    return ranked.select(id_col, "fingerprint", "dup_count")


# ---------------------------------------------------------------------------
# MinHash signatures + banded LSH (shingle → minhash → band → bucket join)
# ---------------------------------------------------------------------------


def _rehash(i: int):
    # independent hash family over the 64-bit base hash: cheap long
    # re-hash per slot. (An affine a*x+b family without a modulo is
    # order-preserving — every slot would pick the same min shingle.)
    # Closure (not default-arg) capture: higher-order functions
    # introspect the lambda arity, and default args would miscount.
    return lambda h: F.xxhash64(F.lit(i), h)


# --- portable hash family (md5-derived, reproducible in any engine
# with md5 — so the FULL minhash->LSH->verify pipeline has an exact
# DuckDB oracle; xxhash64 above is the faster JVM-only default) ---

import hashlib as _hashlib

# 60-bit seeds, derivable in SQL as
# ('0x'||substr(md5('minhash-slot-'||i),1,15))::BIGINT
PORTABLE_SEEDS: tuple[int, ...] = tuple(
    int(_hashlib.md5(f"minhash-slot-{i}".encode()).hexdigest()[:15], 16)
    for i in range(64)
)


def _portable_base(s: Column) -> Column:
    # 60-bit positive base hash from the md5 hex prefix
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _portable_rehash(i: int):
    # xor by a fixed seed: a bijection on the 60-bit space, so each
    # slot's argmin is an (approximately) independent permutation pick
    return lambda h: h.bitwiseXOR(F.lit(PORTABLE_SEEDS[i]))


def minhash_signature(
    text_col: Column,
    num_hashes: int = 32,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> Column:
    """Array of ``num_hashes`` min-hashes over word shingles
    (Broder's MinHash; banded below for LSH).

    Each shingle string is hashed ONCE with the base hash; each family
    member then re-hashes that long with a distinct seed —
    ~num_hashes× cheaper than hashing the strings per function, and
    ANSI-safe (no overflowing arithmetic). All JVM-side.
    ``hash_family``: "xxhash64" (fast JVM default) or "portable"
    (md5-derived — reproducible in any engine; see PORTABLE_SEEDS).
    """
    base_fn = _portable_base if hash_family == "portable" else F.xxhash64
    rehash = _portable_rehash if hash_family == "portable" else _rehash
    base = F.transform(TX.shingles(text_col, shingle_n), lambda s: base_fn(s))
    return F.array(
        *[
            F.array_min(F.transform(base, rehash(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH, verified with the
    exact MinHash similarity estimate.

    bands of r = num_hashes/bands rows; a pair collides if any band's
    sub-signature matches exactly → candidates via equi-join on
    (band_id, band_hash) — never O(n²). Returns (id_a, id_b,
    est_jaccard) with id_a < id_b and est_jaccard >= threshold.

    ``hash_family``: "xxhash64" (default, fastest JVM path) or
    "portable" (md5-derived base + xor-seed slots + md5 band keys —
    bit-identical reproducible in any engine with md5, giving the
    whole approximate pipeline an exact DuckDB oracle).
    """
    df = _spread(df)
    r = num_hashes // bands
    base_fn = _portable_base if hash_family == "portable" else F.xxhash64
    rehash = _portable_rehash if hash_family == "portable" else _rehash
    # two-step projection: shingle-hash once, then the seeded family.
    # Kept as separate Projects so CollapseProject doesn't inline the
    # (expensive, 32×-referenced) base array into every signature slot.
    base_df = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            TX.shingles(F.col(text_col), shingle_n), lambda s: base_fn(s)
        ).alias("_mh_base"),
    )
    sigs = base_df.select(
        "_id",
        F.array(
            *[
                F.array_min(F.transform("_mh_base", rehash(i)))
                for i in range(num_hashes)
            ]
        ).alias("_sig"),
    )
    # materialize signatures once: the 32-slot higher-order-function
    # expression tree is too wide for whole-stage codegen when embedded
    # under the self-join, and would otherwise be re-evaluated
    # (interpreted!) on both join sides. At warehouse scale this step
    # is a signatures table write; localCheckpoint is its local analog.
    sigs = sigs.transform(pin)
    def _band_key(b: int) -> Column:
        slots = [F.element_at("_sig", b * r + j + 1) for j in range(r)]
        if hash_family == "portable":
            return F.md5(F.concat_ws(",", *[s.cast("string") for s in slots]))
        return F.xxhash64(*slots)

    banded = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_key(b).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sig", "bk.band", "bk.bhash")

    # r13: materialize the banded table ONCE, clustered by the join
    # key, before the self-join (guide §2.3/§2.4). The hint("merge")
    # self-join this replaces never got its promised ReusedExchange
    # (verified against the executed plan: two full banding subtrees,
    # two exchanges, two sorts). With one materialized RDD the
    # banding+md5 computes once and the planner is free to pick the
    # join by the checkpoint's REAL size (executed shape at bench SF:
    # BroadcastHashJoin over both scans, 0 exchanges/sorts under the
    # join; past the broadcast threshold it sort-merges, where the
    # clustered sorted layout feeds presorted runs — PySpark's
    # localCheckpoint does NOT carry partitioning metadata, so
    # layout, not plan shape, is what the clustering buys; A/B: the
    # unclustered checkpoint gives back half the win). At warehouse
    # scale this step is the standard "write the banded signature
    # table" LSH pass. Measured -62% on minhash_pairs at sf0.1
    # (0.967s -> 0.368s), hash-identical.
    banded = (
        banded.repartition("band", "bhash")
        .sortWithinPartitions("band", "bhash")
        .transform(pin)
    )
    a, b = banded.alias("a"), banded.alias("b")
    # estimate + threshold BEFORE the pair-dedup shuffle (r11): a
    # pair colliding in k bands recomputes the cheap JVM zip_with k
    # times, but the dropDuplicates exchange then carries 3 scalars
    # per row instead of two num_hashes-long signature arrays (~20x
    # fewer shuffle bytes at 32 hashes), and below-threshold
    # candidates never enter the shuffle at all. Every collision of
    # the same pair computes the IDENTICAL estimate (it depends only
    # on the signatures), so keep-any dedup is deterministic.
    matches = F.aggregate(
        F.zip_with(
            F.col("a._sig"),
            F.col("b._sig"),
            lambda x, y: (x == y).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (matches / F.lit(num_hashes)).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (for verification / small candidate sets)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    length_blocking: bool = False,
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs.

    Without ``length_blocking`` the candidates are all pairs
    (quadratic — only for small inputs / verification). With it,
    candidates come from PPJoin-style **prefix filtering** (Xiao et
    al., WWW'08 — public algorithm), which is lossless for J >= t:

    - order every doc's distinct shingles by a single global total
      order — ascending document frequency, ties by shingle text —
      so each prefix is made of the RAREST shingles;
    - a pair with J(A,B) >= t has overlap >= ceil(t*max(|A|,|B|))
      (since |A∩B| >= t*|A∪B|), and two sets with overlap >= α must
      share an element within their first |X|-α+1 elements of any
      common order; hence prefixes of length |X| - ceil(t*|X|) + 1
      (a superset of the required window on both sides) intersect;
    - candidates = equi-join of the exploded prefixes on the shingle,
      plus the size-containment bound |B| ∈ [t*|A|, |A|/t].

    Every stage is a linear shuffle (df count, df join-back, per-doc
    rank window, prefix self-join, verification fetch) — no band ever
    goes quadratic the way size-band blocking does when the corpus
    has a dominant length band. Rare-first ordering keeps posting
    lists short: stop-shingles ("in the of") never enter a prefix.
    """
    df = _spread(df)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(TX.shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = (inter / union).alias("jaccard")
    if not length_blocking:
        a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
        b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
        return (
            a.join(b, a["id_a"] < b["id_b"])
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        )
    # the shingle table is scanned by three downstream stages (df
    # count, postings, verification fetch) — materialize it once,
    # the local analog of writing a shingles table at scale.
    sized = base.withColumn(
        "_sz", F.greatest(F.size("_sh"), F.lit(1))
    ).localCheckpoint(eager=False)
    ex = sized.select("_id", "_sz", F.explode("_sh").alias("_s"))
    dfreq = ex.groupBy("_s").agg(F.count("*").alias("_df"))
    win = Window.partitionBy("_id").orderBy("_df", "_s")
    prefix_len = (
        F.col("_sz") - F.ceil(F.col("_sz") * F.lit(threshold)) + 1
    ).cast("int")
    postings = (
        ex.join(dfreq, "_s")
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= prefix_len)
        .select("_id", "_sz", "_s")
    )
    # r13: the prefix self-join below reads postings twice — without a
    # materialization the whole dfreq-join + rank-window subtree runs
    # per side. Pin it once, clustered on the join key; both sides
    # scan one RDD and the planner joins by the checkpoint's real
    # size (clustered layout feeds presorted runs at SMJ sizes).
    postings = (
        postings.repartition("_s")
        .sortWithinPartitions("_s")
        .transform(pin)
    )
    pa = postings.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("sz_a"), "_s"
    )
    pb = postings.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("sz_b"), "_s"
    )
    cand = (
        pa.join(pb, "_s")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b").cast("double") >= F.col("sz_a") * F.lit(threshold))
            & (F.col("sz_a").cast("double") >= F.col("sz_b") * F.lit(threshold))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    fa = sized.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    fb = sized.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) + hamming-banded near-dup
# ---------------------------------------------------------------------------


def _simhash_pdf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per doc (Charikar): sign-sum of token-hash bits.
    Arrow-batched pandas UDF — the one Python step in this module.

    Vectorized: token→hash results are memoized per batch (vocab ≪
    token instances) and the per-bit sign sum is one numpy matrix
    reduction per doc instead of a tokens×64 Python loop (~100×)."""
    import hashlib

    import numpy as np

    cache: dict[str, int] = {}

    def tok_hash(tok: str) -> int:
        h = cache.get(tok)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
            )
            cache[tok] = h
        return h

    bit_idx = np.arange(64, dtype=np.uint64)
    powers = (np.uint64(1) << bit_idx)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split(" ")
        h = np.fromiter(
            (tok_hash(tok) for tok in toks), dtype=np.uint64, count=len(toks)
        )
        ones = ((h[:, None] >> bit_idx) & np.uint64(1)).sum(
            axis=0, dtype=np.int64
        )
        # sign-sum > 0 <=> ones > tokens/2 (2*ones - n > 0)
        sig = int(powers[2 * ones > len(toks)].sum(dtype=np.uint64))
        # store as signed 64-bit for Spark LongType
        out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return pd.Series(out)


def simhash_udf():
    # built lazily: pandas_udf registration needs an active session
    return F.pandas_udf(_simhash_pdf, "long")


def _bit_pred(j: int):
    # closure factory, not a default-arg capture: Spark HOFs introspect
    # lambda arity, so `lambda h, j=j:` would be rejected
    return lambda h: (
        F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) == F.lit(1)
    )


def _portable_simhash(hs: Column, n: Column, bits: int = 60) -> Column:
    """SimHash from a pre-computed token-hash array, pure JVM column
    math: bit j of the signature is set iff more than half the token
    hashes have bit j set (sign-sum > 0). 60 bits (the portable md5
    prefix width); the per-bit counts are ``size(filter(...))`` over
    the array — O(bits x tokens) inside codegen, no Python."""
    import functools
    import operator

    terms = [
        F.when(
            F.size(F.filter(hs, _bit_pred(j))) * 2 > n,
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(bits)
    ]
    return functools.reduce(operator.add, terms)


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    hash_family: str = "blake2b",
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Pigeonhole banding: split the signature bits into ``bands`` chunks;
    any pair within distance < bands must agree exactly on >=1 chunk →
    candidate generation is an equi-join on (chunk_id, chunk_value).

    ``hash_family``: "blake2b" (64-bit, vectorized pandas UDF — the
    fast default) or "portable" (60-bit md5-derived token hashes, all
    JVM-side, bit-identical in DuckDB — gives the whole SimHash →
    banding → hamming-verify pipeline an exact value-hash oracle, same
    trade as ``minhash_signature(hash_family="portable")``).
    """
    total_bits = 60 if hash_family == "portable" else 64
    width = total_bits // bands
    df = _spread(df)
    if hash_family == "portable":
        toks = TX.tokens(F.col(text_col))
        pre = df.select(
            F.col(id_col).alias("_id"),
            F.transform(toks, lambda t: _portable_base(t)).alias("_hs"),
            F.size(toks).alias("_n"),
        )
        # materialize the token hashes behind a plan boundary:
        # CollapseProject would otherwise inline the md5 transform into
        # all 60 per-bit filters (60x re-evaluation per row)
        pre = pre.transform(pin)
        sh = pre.select(
            "_id", _portable_simhash(F.col("_hs"), F.col("_n")).alias("_sim")
        )
    else:
        sh = df.select(
            F.col(id_col).alias("_id"),
            simhash_udf()(F.col(text_col)).alias("_sim"),
        )
    # materialize: the signature must be computed once, not per join side
    sh = sh.transform(pin)
    chunks = sh.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("_sim", c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("cval"),
                    )
                    for c in range(bands)
                ]
            )
        ).alias("ck"),
    ).select("_id", "_sim", "ck.chunk", "ck.cval")
    # r13: same self-join materialization as minhash_lsh_pairs — the
    # chunked table is clustered on the join key and pinned once, so
    # the chunking computes once (the old hint("merge") spelling ran
    # it per side; ReusedExchange never fired) and the planner joins
    # the checkpoint by its real size (BHJ at bench SF; the clustered
    # layout carries the win at SMJ sizes — A/B: the unclustered
    # checkpoint was ~2x slower here)
    chunks = (
        chunks.repartition("chunk", "cval")
        .sortWithinPartitions("chunk", "cval")
        .transform(pin)
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sim").alias("sim_a"),
            F.col("b._sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (sign-LSH bucketed)
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    multi_probe: bool = True,
    hash_family: str = "fast",
) -> DataFrame:
    """Pairs with cosine >= threshold, candidates pruned by sign-LSH
    bucket equality. With ``multi_probe`` (default) one side also
    probes every hamming-1 neighbor bucket: a pair of near-identical
    vectors straddling ONE hyperplane (a sign boundary — likely
    exactly at cos≈threshold) still collides. (n_planes+1)×
    replication of one join side — the standard recall/cost trade;
    pairs differing in >=2 plane signs are genuinely dissimilar at
    high thresholds.

    ``hash_family="portable"`` makes every float decision replayable
    in another engine (the full-oracle contract of the minhash/simhash
    portable families). FP summation order differs between engines, so
    instead of rounding sums we make them EXACT: vectors are quantized
    to integer-valued doubles (``floor(x*1e6 + 0.5)``, the
    quantize_int8 parity formula) and the hyperplanes to integer
    literals — every dot product is then an integer below 2^53, whose
    double sum is exact in ANY summation order; bucket signs and
    ROUND(cos, 4) are bit-identical cross-engine by construction."""
    portable = hash_family == "portable"
    if portable:
        planes = V.portable_hyperplanes(dim, n_planes, seed)
        vec = F.transform(
            V.as_double(F.col(vec_col)),
            lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("double"),
        )
    else:
        planes = V.random_hyperplanes(dim, n_planes, seed)
        vec = V.as_double(F.col(vec_col))
    base = df.select(
        F.col(id_col).alias("_id"),
        vec.alias("_v"),
        V.lsh_bucket(vec, planes).alias("_bkt"),
    )
    # materialize: n_planes dot products per row, reused on both
    # sides. r13: also clustered on the bucket key — the layout keeps
    # every bucket's rows contiguous and presorted for the join's
    # per-partition work (the multi-probe side's explode rewrites
    # _bkt, so that side always pays its own shuffle; PySpark's
    # localCheckpoint carries no partitioning metadata, so this is a
    # layout win, not a plan-shape one).
    base = (
        base.repartition("_bkt")
        .sortWithinPartitions("_bkt")
        .transform(pin)
    )
    probe = base
    if multi_probe:
        probe = base.select(
            "_id",
            "_v",
            F.explode(
                F.array(
                    F.col("_bkt"),
                    *[
                        F.col("_bkt").bitwiseXOR(F.lit(1 << i))
                        for i in range(n_planes)
                    ],
                )
            ).alias("_bkt"),
        )
    a, b = probe.alias("a").hint("merge"), base.alias("b").hint("merge")
    cand = a.join(
        b,
        (F.col("a._bkt") == F.col("b._bkt"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.col("a._v").alias("v_a"),
        F.col("b._v").alias("v_b"),
    )
    cos = V.dot(F.col("v_a"), F.col("v_b")) / (
        F.sqrt(V.dot(F.col("v_a"), F.col("v_a")))
        * F.sqrt(V.dot(F.col("v_b"), F.col("v_b")))
    )
    if portable:
        # quantize with the floor(x+0.5) parity formula BEFORE the
        # threshold filter: round() half-handling differs between
        # engines on boundary doubles (e.g. 0.99985), floor does not
        cos = F.floor(cos * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)
        return (
            cand.withColumn("cos_sim", cos)
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
        )
    return (
        cand.withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# corpus-level near-dup removal (keep-list)
# ---------------------------------------------------------------------------


def near_dedup_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.5,
    **minhash_kwargs,
) -> DataFrame:
    """The end-to-end dedup pass a training pipeline runs: drop every
    document that near-duplicates a lower-id document (MinHash-LSH
    candidates at ``jaccard_threshold``).

    Greedy lowest-id-wins (id_b of any pair is dropped) rather than
    full connected components: one extra anti-join, no iterative
    algorithm, and the kept set is deterministic. Chains (a~b~c with
    a!~c) keep only a — the conservative choice for training data.
    """
    pairs = minhash_lsh_pairs(
        df, text_col, id_col,
        jaccard_threshold=jaccard_threshold, **minhash_kwargs,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# connected components over a pair graph (transitive near-dup clusters)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """(node, comp) labeling of the undirected graph given as an edge
    list: ``comp`` is the minimum node id reachable from ``node`` —
    the transitive-closure complement of ``near_dedup_corpus``'s
    greedy pass (a~b~c with a!~c clusters all three here; pick one
    representative per comp to dedup transitively).

    Scale shape (the map-reduce CC pattern): min-label propagation —
    per iteration ONE equi-join (each node pulls its neighbors'
    labels) and ONE groupBy-min, both O(E) hash shuffles; no driver
    state beyond a converged? count. Iterations needed = graph
    diameter, which for near-dup graphs is tiny (clusters are cliques
    or near-cliques); ``max_iters`` bounds adversarial chains. Labels
    are ``localCheckpoint``-ed per iteration so lineage stays flat
    (the cluster analog writes a labels table per round). A
    convergence check costs one ``limit(1).count()`` — stops early,
    O(1) driver data.
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    # materialize the edge list once: every iteration joins against it,
    # and without this the whole upstream pair generation (e.g. the
    # MinHash LSH pipeline) re-runs per iteration. The cluster analog
    # is writing the edges table before the CC job.
    edges = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    nodes = edges.select(F.col("u").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("comp")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iters):
        nbr = edges.join(
            labels, edges["v"] == labels["node"], "inner"
        ).select(edges["u"].alias("node"), F.col("comp"))
        new = (
            labels.select("node", "comp")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .transform(pin)
        )
        changed = (
            new.join(
                labels.select("node", F.col("comp").alias("_old")), "node"
            )
            .filter(F.col("comp") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


# ---------------------------------------------------------------------------
# edit-distance similarity join (SymSpell deletion-neighborhood blocking)
# ---------------------------------------------------------------------------


def _deletion_variants(col: Column, max_dist: int) -> Column:
    """All strings reachable from ``col`` by deleting up to
    ``max_dist`` characters (the string itself included) — the
    SymSpell key set. Pure column math: one ``transform`` over the
    position sequence per deletion level, flatten + distinct."""

    # substring with column args needs F.substr (Spark >= 3.4)
    def deletes(s: Column) -> Column:
        return F.when(
            F.length(s) <= 1, F.array(F.lit(""))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(s)),
                lambda i: F.concat(
                    F.substr(s, F.lit(1), i - 1),
                    F.substr(s, i + 1, F.length(s)),
                ),
            )
        )

    level = F.array(col)
    out = level
    for _ in range(max_dist):
        level = F.array_distinct(
            F.flatten(F.transform(level, lambda s: deletes(s)))
        )
        out = F.array_union(out, level)
    return out


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist``, without a
    cartesian product: SymSpell deletion-neighborhood blocking — two
    strings within distance d always share at least one common
    ``<=d``-deletion variant, so candidates come from an EQUI-JOIN on
    the exploded variant keys and are then verified with the exact
    ``levenshtein`` (lossless: blocking only ever adds candidates).

    Scale shape: key fan-out is O(len^d / d!) per row (len+1 keys at
    d=1), all generated map-side; the join is a hash join on the
    variant string; verification runs only on candidates. ``max_dist``
    is capped at 2 — beyond that the key fan-out stops being the
    right blocking (use q-gram PPJoin instead, cf.
    :func:`jaccard_pairs`).

    Returns (id_a, id_b, dist) with id_a < id_b.
    """
    if not 1 <= max_dist <= 2:
        raise ValueError("max_dist must be 1 or 2 (see docstring)")
    df = _spread(df)
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_t"),
        F.explode(
            _deletion_variants(F.col(text_col), max_dist)
        ).alias("_k"),
    )
    # r13: materialize the variant-keyed table once, clustered on the
    # join key (same self-join fix as minhash_lsh_pairs: the old
    # hint("merge") spelling computed the deletion-variant explode
    # twice and shuffled both copies; ReusedExchange never fired).
    # Both sides scan one RDD; the planner picks the join from the
    # checkpoint's real size.
    keyed = (
        keyed.repartition("_k")
        .sortWithinPartitions("_k")
        .transform(pin)
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._k") == F.col("b._k"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._t").alias("_ta"),
            F.col("b._t").alias("_tb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: cluster, then prune within-cluster ε-balls)
# ---------------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int = 8,
    tau: float = 0.33,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    coarse-cluster the embedding space, then inside each cluster drop
    every vector that has a smaller-id neighbor with cosine >= tau.
    Output is one row per input vector: (id, cluster, kept) — the
    keep-list IS the curated corpus membership.

    Determinism/portability (same contract as ``ivf_topk``'s
    portable family): centroids are the top-``n_clusters`` corpus
    vectors ranked by ``md5(id || '-' || seed)``; assignment is
    argmax of ROUND(dot, 6) with ties to the LARGER centroid id;
    pair cosine is ROUNDed to 6 decimals before the tau comparison —
    every step replays exactly in the DuckDB oracle.

    Scale shape: centroid pick is TakeOrderedAndProject (never a
    global sort); assignment is a broadcast crossJoin of an
    n_clusters-entry literal array (map-only); the pair space is an
    equi-join on cluster id, so cost is Σ cluster² not corpus² — the
    invariant that matters is a cluster count LINEAR in the corpus so
    cluster sizes stay bounded; this engine's standing regime is
    n_clusters ≈ corpus_size/100 (~100 vectors/cluster, what
    ``q_semantic_dedup`` derives from footer stats; the paper ran
    ~10⁴-vector clusters on much larger corpora — any bounded-size
    choice keeps the pair space linear); the keep decision is
    one distinct + left-join, both linear. The smaller-id-neighbor
    rule (vs the paper's keep-farthest-from-centroid) makes the
    keep-list order-free and exactly reproducible cross-engine.
    """
    base = df.select(
        F.col(id_col),
        F.col(id_col).cast("string").alias("_cid"),
        V.as_double(F.col(vec_col)).alias("_v"),
    )
    sampled = (
        base.select("_cid", F.col("_v").alias("_cv"))
        .orderBy(F.md5(F.concat(F.col("_cid"), F.lit(f"-{seed}"))))
        .limit(n_clusters)
    )
    cents = F.broadcast(
        sampled.groupBy().agg(
            F.collect_list(F.struct("_cid", "_cv")).alias("_cents")
        )
    )
    dots = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.round(V.dot(F.col("_v"), c["_cv"]), 6).alias("dot"),
            c["_cid"].alias("cid"),
        ),
    )
    # ascending (dot, cid) sort reversed -> max dot, ties to larger cid
    # _n (the vector norm) is computed ONCE per vector here: the pair
    # stage below evaluates one dot per candidate instead of three —
    # measured 3x off the dominant HOF cost at sf0.1 — while keeping
    # the arithmetic bit-identical to the oracle's dot/(na*nb)
    assigned = base.crossJoin(cents).select(
        F.col(id_col),
        F.col("_v"),
        F.sqrt(V.dot(F.col("_v"), F.col("_v"))).alias("_n"),
        F.reverse(F.array_sort(dots))[0]["cid"].alias("cluster"),
    )
    assigned = assigned.transform(pin)
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = V.dot(F.col("a._v"), F.col("b._v")) / (
        F.col("a._n") * F.col("b._n")
    )
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(F.round(cos, 6) >= tau)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return assigned.join(dropped, id_col, "left").select(
        F.col(id_col),
        "cluster",
        F.col("_dup").isNull().alias("kept"),
    )
