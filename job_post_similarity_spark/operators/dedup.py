"""Deduplication suite (SURVEY.md §2.7 D1-D3 + the LLM-data-pipeline
dedup family: exact hash, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup).

Design for 100 TB:
- exact dedup: hash-groupBy — one shuffle on a 128-bit digest, never
  on the raw text.
- MinHash/LSH: signatures are map-side; the only shuffle is the
  band-bucket self-join, whose fan-out is controlled by (bands, rows).
- SimHash: 64-bit signature map-side; near-dup via banded equality.
All hashes are engine-deterministic (md5/xxhash64-free arithmetic or
md5 built-ins that exist in both Spark and DuckDB) so results are
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..caching import cache_auto

_MOD = 2**31 - 1  # Mersenne prime for universal hashing


# ------------------------------------------------------------ exact tier


def exact_dup_clusters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate clusters via content digest: md5-groupBy.

    Shuffles 16-byte digests, not documents; returns clusters with >1
    member. The digest-based shape is how you dedup 100 TB without
    moving the text.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .orderBy(F.desc("cnt"), F.asc("text_hash"))
    )


def distinct_union(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """D3: id-set union (reference: list(set(a + b)),
    app/fetech_jd.py:85)."""
    return df1.union(df2).distinct()


# -------------------------------------------------------- shingles/tokens


def word_ngrams(col: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles of a text column (array<string>), distinct
    by default (the MinHash/Jaccard shingle set); ``distinct=False``
    keeps multiplicities (repetition profiling).

    Built-ins only: split → transform over a sliding index sequence →
    concat_ws → array_distinct. Stays in codegen; no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    ngram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(toks, i + j) for j in range(n)]
    )
    # guard: texts with < n tokens yield NO shingles. An unguarded
    # sequence(0, size-n) produces the DESCENDING [0, -1] there,
    # emitting a truncated partial gram twice — which inflated
    # multiplicity counts under distinct=False.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.filter(F.transform(idx, ngram), lambda s: s.isNotNull() & (s != ""))
    return F.array_distinct(grams) if distinct else grams


def _shingle_code(s: Column) -> Column:
    """Stable non-negative int64 code for a shingle via xxhash64.

    xxhash64 is a cheap JVM-side hash (vs md5+hex-decode, which cost
    ~30× more when Catalyst re-inlines the expression into each of the
    num_hashes signature lanes). Folded into [0, 2^31-1) for the
    universal-hash arithmetic.
    """
    return F.pmod(F.xxhash64(s), F.lit(_MOD))


# ----------------------------------------------------------- MinHash+LSH


def minhash_signature(
    col: Column | str, num_hashes: int = 32, n: int = 3, seed: int = 1
) -> Column:
    """MinHash signature (array<long>, length num_hashes) over word
    n-gram shingles.

    Universal hashing h_i(x) = (a_i·x + b_i) mod p with deterministic
    seeded coefficients — map-side only, no shuffle, no UDF: the
    signature is transform+aggregate over the shingle array.
    """
    c = F.col(col) if isinstance(col, str) else col
    shingles = word_ngrams(c, n)
    codes = F.transform(shingles, lambda s: _shingle_code(s))

    # deterministic coefficients from the seed (odd a, nonzero), as one
    # literal array of (a, b) structs so ALL lanes update in a single
    # pass over the codes: aggregate(codes, [p]*H, zip_with lane-min).
    # The naive formulation — num_hashes independent
    # array_min(transform(codes, ...)) lanes — re-evaluates the
    # shingle+hash subtree per lane (Catalyst inlines it), turning
    # O(S·H) work into O(S·H + S·cost(shingle)·H); this form computes
    # codes once per row.
    coeffs = F.array(
        *[
            F.struct(
                F.lit((seed * 1_000_003 + i * 7_919) % _MOD or 1).alias("a"),
                F.lit((seed * 7_907 + i * 104_729) % _MOD).alias("b"),
            )
            for i in range(num_hashes)
        ]
    )
    init = F.array(*[F.lit(_MOD).cast("long")] * num_hashes)
    return F.aggregate(
        codes,
        init,
        lambda acc, x: F.zip_with(
            acc,
            coeffs,
            lambda m, ab: F.least(m, (x % _MOD * ab["a"] + ab["b"]) % _MOD),
        ),
    )


def banded_minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    seed: int = 1,
    sig_table: DataFrame | None = None,
) -> DataFrame:
    """(id, sig, band, bucket) rows — the shuffle key material for the
    LSH band join, reusable for both the batch self-join and the
    incremental (streaming foreachBatch) signature store.

    ``sig_table`` (columns ``(id, sig)``) lets a caller that ALSO
    needs the raw signatures (e.g. the verify step of the pair join)
    compute them once, persist, and share — the signature is the
    operator's dominant map-side cost (shingling + H universal
    hashes per doc)."""
    rows_per_band = num_hashes // bands
    sig = (
        sig_table
        if sig_table is not None
        else df.select(
            F.col(id_col).alias("id"),
            minhash_signature(text_col, num_hashes, ngram, seed).alias(
                "sig"
            ),
        )
    )
    # Shingle-less docs (fewer than `ngram` tokens) keep the all-_MOD
    # init signature: they would collide with EACH OTHER in every band
    # — an |empty|² candidate blowup the downstream verify only drops
    # AFTER materializing (and, within-corpus, a bogus est_jaccard=1.0
    # between unrelated empty docs). A non-empty shingle set drives
    # every lane below _MOD ((a·x+b) mod p < p), so sig[0] == _MOD is
    # an exact emptiness test — filter them out of the banding here,
    # mirroring the md5 oracle tier's size(g)>0 guard.
    sig = sig.filter(F.element_at("sig", 1) != F.lit(_MOD))
    return sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 1,
) -> DataFrame:
    """MinHash + LSH banding near-duplicate pairs.

    shingle → minhash (map-side) → explode to (band, band_hash) keys →
    self-join on the band bucket (the ONLY shuffle) → estimated Jaccard
    = matching signature positions / num_hashes → threshold → canonical
    pairs.

    At 100 TB the band join's fan-out is the knob: bands·rows_per_band
    = num_hashes; raise bands for recall, rows-per-band for precision.
    Candidate verification against the true n-gram Jaccard can be
    chained with ``ngram_jaccard_on_pairs``.
    """
    # Band join on bare (id, band, bucket) triples — the wide signature
    # array (num_hashes longs) stays OUT of the n×bands shuffle and is
    # re-attached per candidate id from the UNEXPLODED n-row signature
    # table (never dedup the exploded frame: that shuffles n×bands
    # array payloads). At 21k docs / 128 hashes this cut the whole
    # operator from ~105s to ~13s.
    # The signature table is computed ONCE and persisted: it feeds
    # both sides of the band self-join AND the estimate verify —
    # unshared, the shingle+H-hash pass ran three times per call.
    sigs = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(text_col, num_hashes, ngram, seed).alias("sig"),
    ).transform(cache_auto)
    # band-key layout + persist for the slim band table: both join
    # sides read the cache's (band, bucket) partitioning — no
    # join-side exchanges (the SRP-signature layout trick; the key is
    # high-cardinality so parallelism is preserved)
    slim = (
        banded_minhash_signatures(
            df, id_col, text_col, num_hashes, bands, ngram, seed,
            sig_table=sigs,
        )
        .select("id", "band", "bucket")
        .repartition("band", "bucket")
        .transform(cache_auto)
    )
    cand = (
        slim.alias("a")
        .join(
            slim.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    est = (
        cand.join(sigs.select(F.col("id").alias("id1"), F.col("sig").alias("sig1")), "id1")
        .join(sigs.select(F.col("id").alias("id2"), F.col("sig").alias("sig2")), "id2")
        .select(
            "id1",
            "id2",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig1", "sig2", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
    )
    return est.filter(F.col("est_jaccard") >= jaccard_threshold).orderBy(
        F.desc("est_jaccard"), "id1", "id2"
    )


# --------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (the oracle for MinHash).

    O(n²) compare — the verification tier for candidate pairs or small
    tables; production path is MinHash with this chained on candidates
    only.
    """
    g = df.select(
        F.col(id_col).alias("id"), word_ngrams(text_col, n).alias("grams")
    )
    return (
        g.alias("a")
        .join(g.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.round(
                F.size(F.array_intersect("a.grams", "b.grams"))
                / F.size(F.array_union("a.grams", "b.grams")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy(F.desc("jaccard"), "id1", "id2")
    )


def ngram_jaccard_on_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs — the second stage
    of the production dedup chain (MinHash candidates → exact verify).

    Joins the texts back onto (id1, id2) and computes true n-gram
    Jaccard only for candidates: O(|candidates|) compares instead of
    O(n²). At 100 TB both joins shuffle on the id — the candidate set
    is orders of magnitude smaller than the pair space, which is the
    whole point of LSH banding.
    """
    g = docs.select(
        F.col(id_col).alias("id"), word_ngrams(text_col, n).alias("grams")
    )
    out = (
        pairs.select("id1", "id2")
        .join(g.withColumnRenamed("id", "id1").withColumnRenamed("grams", "g1"), "id1")
        .join(g.withColumnRenamed("id", "id2").withColumnRenamed("grams", "g2"), "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.size(F.array_intersect("g1", "g2"))
                / F.size(F.array_union("g1", "g2")),
                4,
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).orderBy(
        F.desc("jaccard"), "id1", "id2"
    )


# ---------------------------------------------------------------- SimHash


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash of whitespace tokens, built-ins only.

    Token hash = xxhash64 (JVM built-in, deterministic); each of the
    64 bits votes +1/-1 weighted by token count; sign of the sum forms
    the signature. Map-side; signature is a long.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    codes = F.transform(toks, lambda t: F.xxhash64(t))
    # per-bit vote: sum over tokens of (bit set ? +1 : -1), all 64
    # lanes updated in ONE pass over the token hashes (the per-bit
    # aggregate formulation re-evaluates split+hash 64×).
    masks = F.array(
        *[F.lit(1 << b if b < 63 else -(2**63)).cast("long") for b in range(64)]
    )
    votes = F.aggregate(
        codes,
        F.array(*[F.lit(0)] * 64),
        lambda acc, x: F.zip_with(
            acc,
            masks,
            lambda v, m: v + F.when(x.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    # sign of each vote sets the signature bit; OR-fold the lanes
    return F.aggregate(
        F.zip_with(
            votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup: banded 16-bit chunk equality as the LSH
    (a pair within Hamming distance ≤ bands-1 shares ≥1 exact chunk),
    then exact Hamming verification via bit_count(xor).
    """
    sig = df.select(
        F.col(id_col).alias("id"), simhash64(text_col).alias("sig")
    )
    width = 64 // bands
    chunked = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("sig", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("id", "sig", "bc.band", "bc.chunk").repartition(
        "band", "chunk"
    ).transform(cache_auto)
    # chunk-key layout + persist (the band-join cache-layout pattern):
    # both self-join children read the cached partitioning, and the
    # simhash64 token fold — the expensive part — runs once, not twice
    cand = (
        chunked.alias("a")
        .join(
            chunked.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.sig").alias("sig1"),
            F.col("b.sig").alias("sig2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.select(
            "id1",
            "id2",
            F.bit_count(F.col("sig1").bitwiseXOR(F.col("sig2"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("hamming", "id1", "id2")
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    driver_budget: int = 200_000,
) -> DataFrame:
    """Connected components over a near-dup pair graph — the clustering
    step between pair detection and keep-one-per-cluster emission.

    Small-graph fast tier: above-threshold near-dup edge sets are
    tiny by construction (the pairs, not the corpus), so when the
    edge list fits ``driver_budget`` rows it is collected once and
    labeled by driver-side union-find — microseconds of CPU vs
    diameter-many distributed rounds of pure scheduling overhead
    (measured 5.6 s for 258 edges at local[32]). The probe is ONE
    bounded ``limit(budget+1)`` collect — the repo's bounded-probe
    pattern — and the result is IDENTICAL to the distributed
    fixpoint (min reachable id per vertex). Set ``driver_budget=0``
    to force the distributed path.

    Distributed tier (edge sets beyond the budget): iterative
    min-label propagation — every vertex starts labeled with its own
    id; each round every vertex takes the min label in its closed
    neighborhood; stop when no label changes. Rounds needed = graph
    diameter (near-dup clusters are small/dense, so 3-5 rounds in
    practice; ``max_iter`` bounds pathological chains).

    Spark shape: per round, one join (edges ⋈ labels) + one groupBy
    min — both shuffle on the vertex id and reuse the same hash
    partitioning. The convergence check (a driver-side count on the
    changed set, as GraphX/GraphFrames do) runs every SECOND round:
    labels only ever decrease, so a stable round stays stable and the
    worst case is one redundant propagation round for half the
    actions. Output: (id, component) where component = min id
    reachable. For graphs whose DIAMETER is the problem (long chains),
    use ``connected_components_star`` — O(log n) rounds.
    """
    if driver_budget > 0:
        probe = pairs.select("id1", "id2").limit(driver_budget + 1)
        rows = probe.collect()
        if len(rows) <= driver_budget:
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for r_ in rows:
                a_, b_ = r_["id1"], r_["id2"]
                parent.setdefault(a_, a_)
                parent.setdefault(b_, b_)
                ra, rb = find(a_), find(b_)
                if ra != rb:
                    # union by MIN root: the component label contract
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            out = sorted((x, find(x)) for x in parent)
            spark = pairs.sparkSession
            id_t = pairs.schema["id1"].dataType.simpleString()
            return spark.createDataFrame(
                out, f"id {id_t}, component {id_t}"
            )

    edges = (
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("id2").alias("src"), F.col("id1").alias("dst")
            )
        )
        .distinct()
        # every round joins edges: persist, or the whole upstream
        # pair-detection plan re-executes per iteration (measured 10×
        # on the semantic-dedup gate, whose pair subplan carries the
        # within-cluster dot scoring)
        .transform(cache_auto)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for it in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("id", "dst2"),
                F.col("dst") == F.col("dst2"),
            )
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(
                neighbor_min, labels.id == neighbor_min.src, "left"
            )
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # truncate lineage per round
        prev = labels
        labels = new_labels
        # batched convergence check: every 2nd round (and the last)
        if it % 2 == 1 or it == max_iter - 1:
            changed = (
                new_labels.alias("n")
                .join(prev.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
    # labels is localCheckpoint-materialized, so the edge cache can go
    edges.unpersist()
    return labels.orderBy("id")


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("mn"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: edges directed large→small; every node links
    its smaller neighbors (and itself) to the minimum among them."""
    dird = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    mins = dird.groupBy("u").agg(F.min("v").alias("mn"))
    nbr_links = (
        dird.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    self_links = mins.select("u", F.col("mn").alias("v"))
    return (
        nbr_links.unionByName(self_links)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (the MapReduce CC algorithm of Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — the billion-edge
    tier next to ``connected_components``'s min-label propagation.

    Why a second tier: min-label propagation needs O(diameter) rounds
    — a 10⁶-node chain takes 10⁶ rounds. Star contraction converges in
    O(log n) rounds regardless of diameter (each large-star round at
    least halves the height of every tree), so pathological long-chain
    dup graphs (crawl mirrors, boilerplate families) finish in ~20
    rounds at any scale. Per round: two shuffles on the node id (a
    groupBy-min and a join-back), same partitioning reused.

    Convergence: stop when the small-star edge set is unchanged (the
    forest is then a two-level star per component). Output matches
    ``connected_components``: (id, component=min reachable id) —
    property-tested equal on chains, stars, and random graphs.
    """
    labels, _ = _cc_star_with_rounds(pairs, max_iter)
    return labels


def _cc_star_with_rounds(
    pairs: DataFrame, max_iter: int = 25
) -> tuple[DataFrame, int]:
    """Implementation of ``connected_components_star`` that also
    reports the number of rounds until convergence (what the
    O(log n) property test asserts)."""
    edges = (
        pairs.select(F.col("id1").alias("u"), F.col("id2").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    vertices = (
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .distinct()
    )
    cur = edges.localCheckpoint()
    rounds = 0
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        rounds += 1
        # unchanged edge set ⇒ converged (set equality via two anti joins)
        grew = nxt.join(cur, ["u", "v"], "left_anti").limit(1).count()
        shrank = cur.join(nxt, ["u", "v"], "left_anti").limit(1).count()
        cur = nxt
        if grew == 0 and shrank == 0:
            break
    # converged forest: u → component root (min id); roots map to
    # themselves, so re-attach all vertices with a left join. The
    # groupBy-min keeps the one-row-per-id contract even if max_iter
    # exhausted before the fixpoint (mid-algorithm a node can carry
    # several edges) — the result is then a valid under-merged
    # labeling rather than a fanned-out join.
    labels = (
        cur.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    out = (
        vertices.join(labels, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
        .orderBy("id")
    )
    return out, rounds


def keep_cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup removal: drop every row whose id belongs to a pair
    cluster but is not the cluster's min id (the deterministic
    keep-first at cluster granularity). Rows in no cluster pass
    through."""
    comp = connected_components(pairs, max_iter)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("__loser")
    )
    return df.join(
        losers, df[id_col] == F.col("__loser"), "left_anti"
    )


# ------------------------------------------------- embedding-cosine tier


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup — routes through the size-dispatched
    facade (operators.ann.auto_similarity_join): exact blocked-BLAS
    below the broadcast budget, banded SRP-LSH / IVF beyond it — so
    this public path can never driver-collect an oversized corpus."""
    from .ann import auto_similarity_join

    return auto_similarity_join(df, id_col, vec_col, threshold)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal over an embedding column — cluster with
    the IVF coarse quantizer, compare pairs only WITHIN a cluster,
    connect above-threshold pairs, keep ONE representative per
    near-dup component. The LLM-curation step between exact/MinHash
    dedup (surface text) and quality filtering: catches paraphrases
    and re-renderings that share no n-grams.

    Returns the SURVIVING rows of ``df`` (all columns) plus
    ``semdedup_component`` — the component label the row represents
    (its own id for rows with no semantic duplicate). Representative
    policy: minimum id per component (deterministic; the paper keeps
    the member farthest from its centroid — the dedup RATE is
    policy-independent, and min-id is reproducible across runs).

    Scale shape (the paper's own motivation): within-cluster pairing
    is ``ivf_similarity_join`` with n_probe=1 — every vector lives in
    exactly one bucket, so candidate fan-out is Σ bucket² ≈ n·√n at
    auto-√n centroids, never n²; components over the above-threshold
    edge set only (near-dup components are tiny); one final join
    brings survivors back. No driver-side state beyond the Lloyd
    sample the quantizer already bounds.
    """
    from .ann import ivf_similarity_join

    pairs = ivf_similarity_join(
        df, id_col, vec_col, threshold,
        n_centroids=n_centroids, n_probe=1, seed=seed,
    )
    comp = connected_components(pairs.select("id1", "id2"))
    out = df.join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn(
        "semdedup_component",
        F.coalesce(F.col("component"), F.col(id_col)),
    )
    return out.filter(
        F.col(id_col) == F.col("semdedup_component")
    ).drop("component")


def stratified_semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    threshold: float = 0.4,
    max_iter: int = 20,
) -> DataFrame:
    """SemDeDup with a DETERMINISTIC, cross-engine-reproducible coarse
    quantizer — the verification twin of ``semantic_dedup``.

    Quantizer: the DECIMAL-exact mean vectors of the ``pmod(id, k)``
    strata (a deterministic stratified centroid init — no Lloyd
    iterations), assignment by argmax dot against the k inlined
    centroid literals (ties → lowest cluster id; the broadcast-small-
    model shape shared with ``knn.nearest_centroid_classify``).
    Every step downstream of the quantizer — within-cluster pair
    scoring (sequential JVM dot fold == DuckDB ``list_dot_product``),
    min-label connected components, keep-min-id — is a fixed-shape
    IEEE/DECIMAL computation, so an independent engine reproduces the
    EXACT output; this is the tier the DuckDB oracle grades.
    ``semantic_dedup`` (Lloyd-trained quantizer, identical downstream
    shape) is the production path: better clusters, but its quantizer
    is a trained artifact no SQL oracle can re-derive.

    Scale shape: assignment is map-side (k×d literals, no join); the
    only corpus shuffles are the cluster-keyed self-join (fan-out
    Σ bucket², never n²) and the component rounds over the tiny
    above-threshold edge set.

    Output: one row per input id — ``(id, cluster, component, keep)``,
    ordered by id; ``keep`` marks the component representative
    (min id) exactly as ``semantic_dedup`` keeps survivors.
    """
    from .knn import nearest_centroid_classify

    tagged = df.withColumn(
        "__lab", F.pmod(F.col(id_col).cast("long"), F.lit(k))
    )
    asg = (
        nearest_centroid_classify(tagged, id_col, vec_col, "__lab")
        .select(
            F.col(id_col),
            F.col("pred_label").cast("int").alias("cluster"),
        )
        # feeds both sides of the cluster self-join AND the final
        # output join — unpersisted, the 8-literal-dot assignment
        # scoring would run three times over the corpus. NOTE: the
        # cluster-key cache layout (the SRP-signature trick) was
        # measured WORSE here (3.1 → 3.7 s at sf0.1): k=8 clusters
        # collapse the hash layout to ≤8 live partitions and the
        # downstream verify loses its parallelism — the trick needs a
        # HIGH-cardinality key (band×bucket, basket id).
        .transform(cache_auto)
    )
    from ..functions import vectors as V

    # Candidates are ID-ONLY rows through the cluster self-join (the
    # SRP/IVF 16-byte-pair shape — carrying two 384-d vectors per
    # candidate through the join triples the stage's Arrow traffic,
    # measured), prefiltered by a broadcast-gather einsum at
    # threshold − 1e-9 (a margin no true pair can cross: the batched
    # dot differs from the sequential fold only in final ulps). The
    # bit-exact JVM fold (== DuckDB list_dot_product) then decides on
    # the few survivors, so the output is engine-exact. Past the
    # broadcast budget the prefilter falls back to the relational
    # Arrow dot — unbounded corpus, same two-stage exactness.
    cand = (
        asg.select(F.col(id_col).alias("id1"), F.col("cluster").alias("__c"))
        .join(
            asg.select(
                F.col(id_col).alias("id2"), F.col("cluster").alias("__c")
            ),
            "__c",
        )
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    lo = float(threshold) - 1e-9
    near = None
    try:
        import numpy as np
        import pandas as pd

        from .knn import _collect_matrix

        ids, mat = _collect_matrix(df, id_col, vec_col)
        order = np.argsort(ids, kind="stable")
        bc = df.sparkSession.sparkContext.broadcast(
            (ids[order], mat[order])
        )
        id_t = df.schema[id_col].dataType.simpleString()

        def op(batches):
            sid, m = bc.value
            M = m.astype(np.float64, copy=False)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                i1 = np.searchsorted(sid, pdf["id1"].to_numpy())
                i2 = np.searchsorted(sid, pdf["id2"].to_numpy())
                sims = np.einsum("ij,ij->i", M[i1], M[i2])
                keep = sims >= lo
                yield pd.DataFrame(
                    {
                        "id1": pdf["id1"].to_numpy()[keep],
                        "id2": pdf["id2"].to_numpy()[keep],
                    }
                )

        near = cand.mapInPandas(op, f"id1 {id_t}, id2 {id_t}")
    except ValueError:
        v1 = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("__v1"))
        v2 = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("__v2"))
        near = (
            cand.join(v1, "id1")
            .join(v2, "id2")
            .filter(V.dot_cosine_arrow("__v1", "__v2") >= F.lit(lo))
            .select("id1", "id2")
        )
    v1 = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("__w1"))
    v2 = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("__w2"))
    pairs = (
        near.join(v1, "id1")
        .join(v2, "id2")
        .filter(V.dot_cosine("__w1", "__w2") >= F.lit(float(threshold)))
        .select("id1", "id2")
    )
    comp = connected_components(pairs, max_iter)
    return (
        asg.join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce("component", F.col(id_col)).alias("component"),
            (
                F.coalesce("component", F.col(id_col)) == F.col(id_col)
            ).alias("keep"),
        )
        .orderBy(id_col)
    )


# ------------------------------------------- substring-level exact dedup


def _k_gram_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, pos, gram) — 8-byte xxhash64 of each k-token window,
    entirely in whole-stage codegen (the gram TEXT never leaves the
    expression): shared by the detect and apply substring-dedup ops."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") >= k
    )
    return base.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(__toks) - {k}), "
                f"i -> xxhash64(concat_ws(' ', slice(__toks, i + 1, {k}))))"
            )
        ).alias("pos", "gram"),
    )


def substring_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level exact duplication: maximal token spans whose
    every k-token window also occurs in ≥ ``min_docs`` distinct
    documents — the train-set memorization signal document-level dedup
    misses (two mostly-different pages sharing one boilerplate
    paragraph). The k-gram-islands formulation approximates the
    suffix-array method of "Deduplicating Training Data Makes Language
    Models Better" (Lee et al., 2022) with only relational ops.

    Output: (id, span_start, span_len) — token offsets; a span covers
    positions [span_start, span_start + span_len).

    Scale shape: grams hash to 8-byte xxhash64 signatures inside
    whole-stage codegen (the gram TEXT never shuffles); one hash
    shuffle on the signature builds the inverted index (count distinct
    docs), a semi-join flags duplicated positions, and one shuffle on
    the doc id merges adjacent positions into spans via the classic
    gaps-and-islands window (pos − row_number). Signature collisions
    can only over-flag a position (64-bit: ~n²/2⁶⁵ expected), never
    split a true span.
    """
    from pyspark.sql.window import Window

    # persist: the gram table feeds BOTH the inverted-index aggregate
    # and the probe side of the semi-join — unpersisted, the tokenize+
    # hash explosion (and the scan under it) runs twice (the same
    # double-compute srp_lsh_similarity_join persists against). Rows
    # are (id, pos, 8-byte hash) — comparable to input text size,
    # LRU-evicted under pressure.
    grams = _k_gram_hashes(df, text_col, id_col, k).transform(cache_auto)
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("gram")
    )
    flagged = grams.join(dup, "gram", "left_semi").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        flagged.withColumn("__grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + k).alias("span_len"),
        )
        .select(id_col, "span_start", "span_len")
        .orderBy(id_col, "span_start")
    )


def strip_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The APPLY step of substring-level dedup: rebuild each document
    with its duplicated spans removed, keeping exactly one copy
    corpus-wide — the lowest ``id_col`` containing each duplicated
    k-gram "owns" it and keeps its tokens; every other document drops
    the covered tokens (Lee et al. 2022 drop-all-but-one policy with a
    deterministic owner).

    Output: (id, text_deduped, n_tokens_removed).

    Scale shape: same inverted-index shuffle as
    ``substring_dup_spans`` (8-byte gram signatures); per-doc removal
    spans come back as a small struct array via one groupBy, and the
    final token filtering runs entirely in JVM expressions (transform/
    filter/exists over the token array) — the text is never unpacked
    in Python.
    """
    from pyspark.sql.window import Window

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    with_toks = df.select(F.col(id_col), F.col(text_col), toks.alias("__toks"))
    # persisted for the same both-sides reason as substring_dup_spans
    grams = _k_gram_hashes(df, text_col, id_col, k).transform(cache_auto)
    owners = (
        grams.groupBy("gram")
        .agg(
            F.countDistinct(id_col).alias("__nd"),
            F.min(id_col).alias("__owner"),
        )
        .filter(F.col("__nd") >= min_docs)
        .select("gram", "__owner")
    )
    # non-owner flagged gram starts: these positions' k-token windows
    # are the material to drop
    losers = (
        grams.join(owners, "gram")
        .filter(F.col(id_col) != F.col("__owner"))
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        losers.withColumn("__grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "__grp")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") - F.min("pos") + k).alias("len"),
        )
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("start", "len")).alias("__spans")
        )
    )
    joined = with_toks.join(spans, id_col, "left")
    kept = F.expr(
        "CASE WHEN __spans IS NULL THEN __toks ELSE "
        "transform(filter(transform(__toks, (t, i) -> struct(t AS t, i AS i)), "
        "s -> NOT exists(__spans, sp -> s.i >= sp.start "
        "AND s.i < sp.start + sp.len)), s -> s.t) END"
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("text_deduped"),
        (F.size("__toks") - F.size(kept)).cast("int").alias("n_tokens_removed"),
    )


def fuzzy_join_dist1(
    df: DataFrame,
    id_col: str,
    str_col: str,
) -> DataFrame:
    """Exact edit-distance ≤ 1 self-join via deletion-neighborhood
    blocking — the FastSS / SymSpell construction: each string emits
    itself plus its |s| single-character-deletion variants, pairs meet
    on a shared variant, exact ``levenshtein`` verifies.

    The blocking has 100% recall for distance ≤ 1 (not a heuristic):
    equal strings share the string itself; a substitution at position
    i shares both-minus-position-i; an insertion/deletion shares the
    shorter string verbatim. So the output is EXACTLY the pairs at
    distance ≤ 1 — a quadratic cross-join oracle can verify it while
    the plan stays an explode + equi-join.

    Scale shape: the variant table is |s|+1 rows per string, map-side;
    one hash join keyed by variant (never all-pairs); a pair-dedup
    shuffle; per-pair levenshtein only on candidates. This is the
    fuzzy-matching analog of the MinHash band join — same
    bucket-then-verify discipline.

    Output: (id1, id2, s1, s2, dist), dist ∈ {0, 1} — distance-0 rows
    are exact duplicate strings under different ids.

    Cache note (ADVICE r5): the variant table is persisted (it feeds
    both join sides) and deliberately NOT unpersisted — the returned
    DataFrame is lazy, so any eager unpersist here would run before
    the caller's action reads the cache. The frame is small (|s|+1
    rows per string, ids + short strings) and LRU-evicts under
    pressure; callers running many resolutions in one session can
    ``spark.catalog.clearCache()`` between them. Same policy as every
    blocking/signature cache in this module.
    """
    s = F.col(str_col)
    variants = F.when(
        F.length(s) > 0,
        F.array_union(
            F.array(s),
            F.transform(
                F.sequence(F.lit(1), F.length(s)),
                lambda i: F.concat(
                    s.substr(F.lit(1), i - F.lit(1)),
                    s.substr(i + F.lit(1), F.length(s)),
                ),
            ),
        ),
    ).otherwise(F.array(s))
    # variant-key layout + persist: both join sides read the cache's
    # __v partitioning — no join-side exchanges, and the explode runs
    # once (the band-join cache-layout pattern; deletion variants are
    # a high-cardinality key)
    sig = df.select(
        F.col(id_col).alias("__id"),
        s.alias("__s"),
        F.explode(variants).alias("__v"),
    ).repartition("__v").transform(cache_auto)
    a = sig.select(
        F.col("__id").alias("id1"), F.col("__s").alias("s1"), "__v"
    )
    b = sig.select(
        F.col("__id").alias("id2"), F.col("__s").alias("s2"), "__v"
    )
    cand = (
        a.join(b, "__v")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.withColumn("dist", F.levenshtein("s1", "s2"))
        .filter(F.col("dist") <= 1)
        .orderBy("id1", "id2")
    )


# ------------------------------------------------- segment (line) dedup


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 6,
    sep: str = " ",
) -> DataFrame:
    """C4-style corpus-wide duplicate-line removal (Raffel et al. 2020
    §2.2: "we discarded all but one of any three-sentence span
    occurring more than once"), re-expressed for token-stream
    documents: the unit of dedup is a fixed ``seg_tokens``-token
    segment instead of a sentence line (the testdata corpus has no
    newline/sentence structure).

    Semantics: split each doc into consecutive non-overlapping
    segments; keep the FIRST occurrence of each distinct segment
    corpus-wide (ordered by ``(id_col, seg_idx)``); rebuild every doc
    from its surviving segments in original order. Docs whose every
    segment was seen earlier vanish (C4 drops emptied pages too).

    Returns ``(id_col, text_col, segs_kept, segs_total)``.

    Scale: segmentation is a pure map (``split`` → ``transform`` over
    a ``sequence`` of slice offsets — no explode until the segment
    rows are needed). The only wide stages are the keep-first window
    (one shuffle, keyed on the segment content — the same payload any
    engine's line-dedup shuffles, incl. C4's own implementation) and
    the per-doc rebuild. ``segs_total`` comes from the map-side
    expression, not a second aggregate.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_seg = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - F.lit(1)),
        lambda i: F.array_join(
            F.slice(toks, i * seg_tokens + F.lit(1), seg_tokens), sep
        ),
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), segs.alias("__segs")
    )
    seg_rows = base.select(
        id_col,
        F.size("__segs").alias("segs_total"),
        F.posexplode("__segs").alias("seg_idx", "seg"),
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy("seg").orderBy(F.asc(id_col), F.asc("seg_idx"))
    kept = (
        seg_rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        kept.groupBy(id_col, "segs_total")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                sep,
            ).alias(text_col),
            F.count(F.lit(1)).alias("segs_kept"),
        )
        .select(id_col, text_col, "segs_kept", "segs_total")
    )


def prefix_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int = 500_000,
) -> DataFrame:
    """EXACT word-set Jaccard similarity self-join via prefix
    filtering (the PPJoin/AllPairs family, Xiao et al. WWW'08) — the
    non-LSH exact tier between ``ngram_jaccard_pairs`` (quadratic,
    small inputs) and ``minhash_near_dup_pairs`` (approximate).
    Output: ``(id1, id2, jaccard_ppm)`` for pairs with
    Jaccard ≥ threshold, ``id1 < id2``, integer parts-per-million.

    Prefix-filter guarantee: order every document's token set by
    GLOBAL frequency (rarest first; ties on token asc) and keep only
    its first ``p = n − ceil(t·n) + 1`` tokens. Two sets with
    Jaccard ≥ t must overlap in at least ``ceil(t·n)`` of either
    side's tokens, so they MUST share a prefix token — candidates
    are exactly the pairs sharing ≥ 1 prefix token, with rare tokens
    doing the blocking (hot tokens fall outside prefixes, bounding
    candidate mass). ``ceil`` is computed in integer arithmetic
    (``(n·t_ppm + 999_999) div 1_000_000``) — no float fuzz can
    shorten a prefix and silently break completeness.

    Verification is exact set Jaccard on candidates only, with the
    floor division OUTSIDE the aggregates (integer-exact on any
    engine). The DuckDB oracle for this operator is the quadratic
    token-join — a green gate is a machine-checked completeness
    proof of the blocking.

    Scale shape: DISTINCT (doc, token) grain (one shuffle), token
    frequency aggregate + token-keyed join, one per-doc window to
    rank tokens, a prefix-token equi-join for candidates, and a
    doc-keyed join against sorted token arrays for the verify — no
    cartesian anywhere.
    """
    from pyspark.sql.window import Window

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    dt = (
        df.select(F.col(id_col).alias("__id"), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
        .transform(cache_auto)
    )
    freq = dt.groupBy("token").agg(F.count(F.lit(1)).alias("__f"))
    w = Window.partitionBy("__id").orderBy(F.asc("__f"), F.asc("token"))
    ranked = (
        dt.join(freq, "token")
        .withColumn("__pos", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("__id")))
    )
    prefix = ranked.filter(
        F.col("__pos")
        <= F.col("__n")
        - F.expr(f"(__n * {threshold_ppm}L + 999999) div 1000000")
        + F.lit(1)
    # token-key layout + persist: the prefix table feeds BOTH sides of
    # the candidate self-join — without the persist the freq-join +
    # double window above recompute per side, and the token layout
    # lets the join read the cache partitioning with no further
    # exchange (high-cardinality key, so no parallelism collapse)
    ).repartition("token").transform(cache_auto)
    cand = (
        prefix.select(F.col("__id").alias("id1"), "token")
        .join(
            prefix.select(F.col("__id").alias("id2"), "token"), "token"
        )
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    sets = dt.groupBy("__id").agg(
        F.array_sort(F.collect_set("token")).alias("__set")
    )
    s1 = sets.select(
        F.col("__id").alias("id1"), F.col("__set").alias("__s1")
    )
    s2 = sets.select(
        F.col("__id").alias("id2"), F.col("__set").alias("__s2")
    )
    verified = (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("__s1", "__s2")).alias("__inter"),
            (F.size("__s1") + F.size("__s2")).alias("__sz"),
        )
        .select(
            "id1",
            "id2",
            F.expr(
                "(1000000L * __inter) div (__sz - __inter)"
            ).alias("jaccard_ppm"),
        )
        .filter(F.col("jaccard_ppm") >= threshold_ppm)
    )
    return verified.orderBy("id1", "id2")


def containment_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int = 800_000,
) -> DataFrame:
    """Directed word-set CONTAINMENT self-join: emit ``(id_a, id_b,
    containment_ppm)`` where ``|A∩B| / |A| ≥ t`` — detects documents
    that are (near-)SUBSETS of another (boilerplate swallowed by a
    longer page, quote-and-extend duplication), which symmetric
    Jaccard under-scores when |B| ≫ |A|.

    Blocking (the overlap/JOSIE shape): only the PROBE side is
    prefix-filtered — order A's tokens by global frequency (rarest
    first) and keep its first ``|A| − ceil(t·|A|) + 1``; the
    candidate side is indexed on ALL its tokens. Pigeonhole
    completeness: overlap ≥ ceil(t·|A|) forces at least one shared
    token into that prefix. Ceil is integer-exact (the
    ``prefix_jaccard_join`` policy), and the DuckDB oracle is the
    quadratic token join — a green gate machine-checks the blocking.

    Scale shape: DISTINCT grain + frequency join + one per-doc
    window (shared with the Jaccard join), a prefix→full-token
    equi-join for candidates, verify on candidates only.
    """
    from pyspark.sql.window import Window

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    dt = (
        df.select(F.col(id_col).alias("__id"), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
        .transform(cache_auto)
    )
    freq = dt.groupBy("token").agg(F.count(F.lit(1)).alias("__f"))
    w = Window.partitionBy("__id").orderBy(F.asc("__f"), F.asc("token"))
    ranked = (
        dt.join(freq, "token")
        .withColumn("__pos", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("__id")))
    )
    prefix = ranked.filter(
        F.col("__pos")
        <= F.col("__n")
        - F.expr(f"(__n * {threshold_ppm}L + 999999) div 1000000")
        + F.lit(1)
    )
    cand = (
        prefix.select(F.col("__id").alias("id_a"), "token")
        .join(dt.select(F.col("__id").alias("id_b"), "token"), "token")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sets = dt.groupBy("__id").agg(
        F.array_sort(F.collect_set("token")).alias("__set")
    )
    sa = sets.select(F.col("__id").alias("id_a"), F.col("__set").alias("__sa"))
    sb = sets.select(F.col("__id").alias("id_b"), F.col("__set").alias("__sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(
                "(1000000L * size(array_intersect(__sa, __sb)))"
                " div size(__sa)"
            ).alias("containment_ppm"),
        )
        .filter(F.col("containment_ppm") >= threshold_ppm)
        .orderBy("id_a", "id_b")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    window: int = 5,
    max_dist: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): order
    records by a sorting key and propose every pair within a sliding
    window of ``window`` positions — the classic entity-resolution
    candidate generator for fuzzy keys (names, addresses) where
    equality blocking is too strict and all-pairs is n². With
    ``max_dist`` the candidates are verified by Levenshtein distance
    on the key (blocking → verify, the MinHash/PPJoin pipeline shape).

    Determinism: the sort order is the total order ``(key, id)``, so
    the candidate set is reproducible on any engine.

    Scale shape — NO single-task global window (the method's naive
    formulation): global positions come from
    ``preprocess.assign_dense_ids`` (range partition + offset pass),
    then the sliding window becomes a BLOCK-BAND equi-join — rows
    join their own ``rank div window`` block and the next one, and a
    rank-difference filter keeps exactly the window pairs. Every
    stage is range/hash-partitioned; nothing funnels through one
    reducer, no boundary misses (the adjacent-block join covers
    cross-block neighbors).

    Output: ``(id_a, id_b, key_a, key_b[, dist])`` — ``dist`` only
    when ``max_dist`` is set; ordered (id_a, id_b).
    """
    from .preprocess import assign_dense_ids

    base = df.select(
        F.col(id_col).alias("__id"), F.col(key_col).alias("__k")
    ).filter(F.col("__k").isNotNull())
    ranked = assign_dense_ids(base, ["__k", "__id"], out_col="__rn")
    a = ranked.select(
        F.col("__id").alias("id_a"),
        F.col("__k").alias("key_a"),
        F.col("__rn").alias("__ra"),
        F.expr(f"__rn div {window}").alias("__blk"),
    )
    b_base = ranked.select(
        F.col("__id").alias("id_b"),
        F.col("__k").alias("key_b"),
        F.col("__rn").alias("__rb"),
    )
    # each b row lands in its own block AND the preceding one, so an
    # (a, b) pair within `window` positions always shares a join key
    b = b_base.withColumn(
        "__blk",
        F.explode(
            F.array(
                F.expr(f"__rb div {window}"),
                F.expr(f"__rb div {window} - 1"),
            )
        ),
    ).filter(F.col("__blk") >= 0)
    pairs = (
        a.join(b, "__blk")
        .filter(
            (F.col("__rb") > F.col("__ra"))
            & (F.col("__rb") - F.col("__ra") <= window - 1)
        )
        .select("id_a", "key_a", "id_b", "key_b")
    )
    if max_dist is not None:
        pairs = pairs.withColumn(
            "dist", F.levenshtein("key_a", "key_b")
        ).filter(F.col("dist") <= max_dist)
    return pairs.select(
        "id_a", "id_b", "key_a", "key_b",
        *(["dist"] if max_dist is not None else []),
    ).orderBy("id_a", "id_b")


def keep_best_in_cluster(
    df: DataFrame,
    cluster_col: str,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Representative selection for dedup: keep the HIGHEST-SCORING
    member of each duplicate cluster (ties on the lowest id) — what
    production dedup actually does once a quality signal exists
    (keep-first / keep-min-id discards information; keeping the best
    exemplar is the C4/FineWeb-style policy for exact and near-dup
    clusters alike).

    One window over the cluster key (single hash shuffle — the same
    cost class as the clustering step that produced the key).
    Output: the input columns plus ``n_dups`` (cluster size) and
    ``keep`` (true for the representative). Filter ``keep`` for the
    survivor set; keep the full table for audit trails.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    wc = Window.partitionBy(cluster_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(wc))
        .withColumn("keep", F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_near_dup_pairs_oracle_tier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold_ppm: int = 500_000,
    seed: int = 1,
) -> DataFrame:
    """Banded MinHash+LSH near-dup with EVERY step replayable by an
    independent SQL engine — the deterministic oracle twin of the
    production ``minhash_near_dup_pairs`` (which uses ``xxhash64``
    shingle codes, a Spark-only hash; this tier uses the md5-prefix
    code from the DSIR/rolling-fingerprint family so DuckDB computes
    identical signatures). Same algorithm end-to-end: shingle →
    universal-hash lanes (identical (a, b) coefficient schedule) →
    band keys → per-band candidate pairs → exact-Jaccard verify on
    candidates only. The production tier remains the hot path; a
    green gate here hash-proves the ALGORITHM (banding recall shape,
    verify arithmetic), not just its row counts.

    Output: ``(id1, id2, jaccard_ppm)`` for candidate pairs whose
    exact ppm Jaccard clears the threshold, sorted.
    """
    shg, banded = _md5_banded_sig_tables(
        df, id_col, text_col, num_hashes, bands, ngram, seed
    )
    cands = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id1"), F.col("y.id").alias("id2")
        )
        .distinct()
    )
    grams = shg.select(F.col("id").alias("gid"), "g")
    ex = grams.select("gid", F.explode("g").alias("s"))
    inter = (
        cands.join(ex.alias("a"), F.col("id1") == F.col("a.gid"))
        .join(
            ex.alias("b"),
            (F.col("id2") == F.col("b.gid"))
            & (F.col("a.s") == F.col("b.s")),
        )
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = grams.select("gid", F.size("g").alias("n"))
    jac = (
        cands.join(inter, ["id1", "id2"], "left_outer")
        .join(
            sizes.select(
                F.col("gid").alias("id1"), F.col("n").alias("n1")
            ),
            "id1",
        )
        .join(
            sizes.select(
                F.col("gid").alias("id2"), F.col("n").alias("n2")
            ),
            "id2",
        )
        .select(
            "id1",
            "id2",
            F.expr(
                "CAST(1000000 * coalesce(n_inter, 0) AS BIGINT)"
                " DIV (n1 + n2 - coalesce(n_inter, 0))"
            ).alias("jaccard_ppm"),
        )
    )
    return (
        jac.filter(F.col("jaccard_ppm") >= threshold_ppm)
        .orderBy("id1", "id2")
    )


def ngram_jaccard_ppm_on_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_ppm: int = 500_000,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs in FLOOR-ppm
    arithmetic — the verify form the md5 oracle tier uses, exposed so
    production (xxhash-candidate) chains can threshold IDENTICALLY to
    the oracle tier (``round(j, 4) >= t`` and ``floor-ppm >= t_ppm``
    disagree on pairs inside [t - 5e-5, t); the e2e pretraining
    pipeline's two tiers must not). Output: (id1, id2, jaccard_ppm)."""
    g = docs.select(
        F.col(id_col).alias("id"), word_ngrams(text_col, n).alias("grams")
    )
    out = (
        pairs.select("id1", "id2")
        .join(
            g.withColumnRenamed("id", "id1").withColumnRenamed(
                "grams", "g1"
            ),
            "id1",
        )
        .join(
            g.withColumnRenamed("id", "id2").withColumnRenamed(
                "grams", "g2"
            ),
            "id2",
        )
        .select(
            "id1",
            "id2",
            F.expr(
                "CAST(1000000 * size(array_intersect(g1, g2)) AS BIGINT)"
                " DIV size(array_union(g1, g2))"
            ).alias("jaccard_ppm"),
        )
    )
    return out.filter(F.col("jaccard_ppm") >= threshold_ppm).orderBy(
        F.desc("jaccard_ppm"), "id1", "id2"
    )


def _md5_banded_sig_tables(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    ngram: int,
    seed: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared md5-tier building block: (shingle table, banded key
    table) with the exact signature schedule of
    ``minhash_near_dup_pairs_oracle_tier`` (and its DuckDB replay).
    Both frames are persisted — the shingle chain is the expensive
    subtree and feeds signature + verify; the band table feeds the
    candidate join key-partitioned."""
    c = F.col(text_col)
    shg = (
        df.select(F.col(id_col).alias("id"), word_ngrams(c, ngram).alias("g"))
        .filter(F.size("g") > 0)
        .repartition("id")
        .transform(cache_auto)
    )
    codes = F.transform(
        F.col("g"),
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("long"),
            F.lit(_MOD),
        ),
    )
    coeffs = F.array(
        *[
            F.struct(
                F.lit((seed * 1_000_003 + i * 7_919) % _MOD or 1).alias("a"),
                F.lit((seed * 7_907 + i * 104_729) % _MOD).alias("b"),
            )
            for i in range(num_hashes)
        ]
    )
    init = F.array(*[F.lit(_MOD).cast("long")] * num_hashes)
    sig = F.aggregate(
        codes,
        init,
        lambda acc, x: F.zip_with(
            acc,
            coeffs,
            lambda m, ab: F.least(m, (x % _MOD * ab["a"] + ab["b"]) % _MOD),
        ),
    )
    rows_per_band = num_hashes // bands
    banded = (
        shg.select("id", sig.alias("sig"))
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat_ws(
                                "-",
                                *[
                                    F.element_at(
                                        "sig", b * rows_per_band + j + 1
                                    )
                                    for j in range(rows_per_band)
                                ],
                            ).alias("key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("id", "bk.band", "bk.key")
        .repartition("band", "key")
        .transform(cache_auto)
    )
    return shg, banded


def cross_near_dup_pairs_oracle_tier(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold_ppm: int = 500_000,
    seed: int = 1,
    bench_tables: tuple[DataFrame, DataFrame] | None = None,
    corpus_tables: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """CROSS-corpus fuzzy decontamination pairs (Lee et al. 2022 §6.2
    made near-dup-aware): training docs within banded-MinHash reach of
    a BENCHMARK doc, verified with exact n-gram Jaccard — the
    near-duplicate complement of the exact-n-gram / Bloom
    decontamination tiers (``curation.contaminated_ids`` /
    ``bloom_decontaminate``), which miss lightly-edited benchmark
    copies. md5 deterministic tier (same signature schedule as
    ``minhash_near_dup_pairs_oracle_tier``), so the whole operator is
    value-hash replayable in SQL.

    Scale shape: signatures are map-side per corpus; the candidate
    join is bandedL ⋈ bandedR on (band, key) — each side shuffles its
    OWN slim (id, band, key) triples once and the benchmark side is
    typically tiny (broadcastable); the exact verify touches candidate
    pairs only. Within-corpus pairs are never generated (the whole
    point vs running the self-join tier over the union — at 100 TB
    the train×train pair mass dwarfs train×bench).

    Output: ``(corpus_id, bench_id, jaccard_ppm)`` ≥ threshold,
    sorted.
    """
    # ``corpus_tables`` / ``bench_tables`` let callers manage the
    # persisted shingle/band frames themselves: a caller that probes
    # MANY corpora (or micro-batches) against ONE benchmark builds the
    # benchmark's tables once, and a per-batch caller can unpersist
    # the batch's tables when its step completes —
    # streaming.stream_fuzzy_decontaminate does both.
    if corpus_tables is not None:
        shg_c, banded_c = corpus_tables
    else:
        shg_c, banded_c = _md5_banded_sig_tables(
            corpus, id_col, text_col, num_hashes, bands, ngram, seed
        )
    if bench_tables is not None:
        shg_b, banded_b = bench_tables
    else:
        shg_b, banded_b = _md5_banded_sig_tables(
            bench, id_col, text_col, num_hashes, bands, ngram, seed
        )
    cands = (
        banded_c.alias("x")
        .join(
            banded_b.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key")),
        )
        .select(
            F.col("x.id").alias("corpus_id"),
            F.col("y.id").alias("bench_id"),
        )
        .distinct()
    )
    ex_c = shg_c.select(F.col("id").alias("cid"), F.explode("g").alias("s"))
    ex_b = shg_b.select(F.col("id").alias("bid"), F.explode("g").alias("s"))
    inter = (
        cands.join(ex_c.alias("a"), F.col("corpus_id") == F.col("a.cid"))
        .join(
            ex_b.alias("b"),
            (F.col("bench_id") == F.col("b.bid"))
            & (F.col("a.s") == F.col("b.s")),
        )
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = (
        cands.join(inter, ["corpus_id", "bench_id"], "left_outer")
        .join(
            shg_c.select(
                F.col("id").alias("corpus_id"), F.size("g").alias("n1")
            ),
            "corpus_id",
        )
        .join(
            shg_b.select(
                F.col("id").alias("bench_id"), F.size("g").alias("n2")
            ),
            "bench_id",
        )
        .select(
            "corpus_id",
            "bench_id",
            F.expr(
                "CAST(1000000 * coalesce(n_inter, 0) AS BIGINT)"
                " DIV (n1 + n2 - coalesce(n_inter, 0))"
            ).alias("jaccard_ppm"),
        )
    )
    return (
        jac.filter(F.col("jaccard_ppm") >= threshold_ppm)
        .orderBy("corpus_id", "bench_id")
    )


def cross_near_dup_pairs(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold_ppm: int = 500_000,
    seed: int = 1,
) -> DataFrame:
    """PRODUCTION cross-corpus fuzzy decontamination (xxhash64 shingle
    codes — the 100 TB hot path; ``cross_near_dup_pairs_oracle_tier``
    is the md5 tier whose every step a SQL engine replays, and both
    verify with the SAME floor-ppm exact Jaccard, so they differ only
    in which borderline candidates the banding proposes). Same scale
    shape: per-corpus map-side signatures, one slim (id, band, bucket)
    cross join keyed on the band bucket, exact verify on candidates
    only; within-corpus pair mass is never generated.

    Output: ``(corpus_id, bench_id, jaccard_ppm)`` ≥ threshold, sorted.
    """
    bc = (
        banded_minhash_signatures(
            corpus, id_col, text_col, num_hashes, bands, ngram, seed
        )
        .select(F.col("id").alias("corpus_id"), "band", "bucket")
        .repartition("band", "bucket")
        .transform(cache_auto)
    )
    bb = (
        banded_minhash_signatures(
            bench, id_col, text_col, num_hashes, bands, ngram, seed
        )
        .select(F.col("id").alias("bench_id"), "band", "bucket")
        .repartition("band", "bucket")
        .transform(cache_auto)
    )
    cands = (
        bc.join(bb, ["band", "bucket"])
        .select("corpus_id", "bench_id")
        .dropDuplicates(["corpus_id", "bench_id"])
    )
    # per-SIDE gram tables (like the md5 tier): the two corpora may
    # legitimately share id values — a union keyed on one id column
    # would cross-wire their texts
    # size>0 filters mirror the md5 tier's shg guard: shingle-less
    # docs never reach the band join at all (banded_minhash_signatures
    # drops the degenerate all-init signatures pre-banding), and the
    # filters here keep the gram tables zero-divide-free for any
    # candidate that does arrive
    gc = corpus.select(
        F.col(id_col).alias("corpus_id"),
        word_ngrams(text_col, ngram).alias("g1"),
    ).filter(F.size("g1") > 0)
    gb = bench.select(
        F.col(id_col).alias("bench_id"),
        word_ngrams(text_col, ngram).alias("g2"),
    ).filter(F.size("g2") > 0)
    verified = (
        cands.join(gc, "corpus_id")
        .join(gb, "bench_id")
        .select(
            "corpus_id",
            "bench_id",
            F.expr(
                "CAST(1000000 * size(array_intersect(g1, g2)) AS BIGINT)"
                " DIV size(array_union(g1, g2))"
            ).alias("jaccard_ppm"),
        )
        .filter(F.col("jaccard_ppm") >= threshold_ppm)
    )
    return verified.orderBy("corpus_id", "bench_id")


def fuzzy_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int = 500_000,
    tier: str = "oracle",
    **knobs,
) -> DataFrame:
    """Drop training docs that are NEAR-duplicates of any benchmark
    doc (cross pairs → left-anti on the contaminated ids) — the apply
    step of fuzzy decontamination. ``tier='oracle'`` (md5,
    SQL-replayable — the graded surface) or ``'xxh'`` (the production
    hash family)."""
    pair_fn = {
        "oracle": cross_near_dup_pairs_oracle_tier,
        "xxh": cross_near_dup_pairs,
    }.get(tier)
    if pair_fn is None:
        raise ValueError(f"tier must be 'oracle' or 'xxh', got {tier!r}")
    pairs = pair_fn(
        corpus, bench, id_col, text_col,
        threshold_ppm=threshold_ppm, **knobs,
    )
    bad = pairs.select(F.col("corpus_id").alias(id_col)).distinct()
    return corpus.join(bad, id_col, "left_anti")


def simhash_near_dup_pairs_oracle_tier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 3,
) -> DataFrame:
    """SimHash near-dup, deterministic oracle tier: a 56-bit SimHash
    from md5-prefix token hashes (the production ``simhash64`` uses
    Spark-only ``xxhash64``) with pigeonhole chunk blocking — the
    signature splits into 4 × 14-bit chunks, and any pair within
    Hamming distance ≤ 3 must agree on AT LEAST one chunk, so the
    chunk-key equi-join is provably complete for ``max_dist`` ≤ 3.
    The oracle replays the signature arithmetic and verifies via the
    QUADRATIC Hamming filter, making a green hash a completeness
    proof of the blocking (the containment-join gate pattern).

    Output: ``(id1, id2, hamming)`` pairs with distance ≤ max_dist,
    sorted. Scale shape: signatures map-side; the only shuffle is
    the chunk-key join whose buckets are 14-bit-selective.
    """
    if max_dist > 3:
        raise ValueError(
            "4-chunk pigeonhole blocking is complete only for "
            f"max_dist <= 3 (got {max_dist})"
        )
    c = F.col(text_col)
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    codes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 14), 16, 10).cast(
            "long"
        ),
    )
    masks = F.array(
        *[F.lit(1 << b).cast("long") for b in range(56)]
    )
    votes = F.aggregate(
        codes,
        F.array(*[F.lit(0)] * 56),
        lambda acc, x: F.zip_with(
            acc,
            masks,
            lambda v, m: v
            + F.when(x.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    chunks = base.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("chunk"),
                        F.shiftright("sig", 14 * k)
                        .bitwiseAND(F.lit((1 << 14) - 1))
                        .alias("val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "sig", "ck.chunk", "ck.val")
    cands = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id1"),
            F.col("y.id").alias("id2"),
            F.col("x.sig").alias("s1"),
            F.col("y.sig").alias("s2"),
        )
        .distinct()
    )
    return (
        cands.select(
            "id1",
            "id2",
            F.expr("bit_count(s1 ^ s2)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
        .orderBy("id1", "id2")
    )


def entity_resolution(
    df: DataFrame,
    id_col: str,
    str_col: str,
    score_col: str,
) -> DataFrame:
    """End-to-end entity resolution over a name-keyed table: FastSS
    deletion-neighborhood blocking + exact edit-distance ≤ 1 verify
    (``fuzzy_join_dist1`` — 100%-recall blocking, never all-pairs) →
    connected components over the match graph → highest-score
    canonical representative per entity (``keep_best_in_cluster``).
    The classic block → match → cluster → canonicalize ER pipeline as
    ONE lazy composition; rows absent from the match graph keep their
    own id as the entity (singleton entities).

    Output: the input columns + ``entity`` (min member id),
    ``n_dups``, ``keep``. Scale shape: variant-keyed equi-join for
    candidates, edge-set-sized component rounds (driver union-find
    fast tier under the budget), one cluster-keyed window.
    """
    pairs = fuzzy_join_dist1(df, id_col, str_col).select("id1", "id2")
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    labeled = df.join(comp, id_col, "left").withColumn(
        "entity", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")
    return keep_best_in_cluster(labeled, "entity", score_col, id_col)


def minhash_parameter_plan(
    n: int,
    threshold: float,
    target_recall: float = 0.95,
    candidate_row_budget: int | None = None,
    background_jaccard: float | None = None,
    max_rows_per_band: int = 16,
    max_bands: int = 64,
    max_hashes: int = 256,
    min_hashes: int = 64,
) -> dict:
    """Solve the MinHash-LSH banding knobs from the S-curve instead of
    guessing — the Jaccard-family twin of ``ann.srp_parameter_plan``.

    A pair with Jaccard ``s`` collides in one ``r``-row band w.p.
    ``s^r``; recall over ``b`` bands is ``1-(1-t^r)^b``, so
    ``b = ceil(ln(1-R)/ln(1-t^r))``. The planner picks the SMALLEST
    ``r`` whose expected background candidate mass
    ``C(n,2)·b·s_bg^r`` fits ``candidate_row_budget`` (default
    ``50·n`` — linear in the corpus): smaller ``r`` means fewer
    signature lanes and the highest cap-limited recall, larger ``r``
    suppresses background — the budget decides where that trade
    lands for THIS corpus size, which is exactly what fixed knobs
    cannot do (a fixed 4-row band that is bucket-sparse at 10^5 docs
    goes candidate-quadratic at 10^8).

    ``background_jaccard`` is the similarity assumed for the
    non-duplicate mass (default ``min(0.05, threshold/2)`` — unrelated
    shingle sets sit near 0; a threshold-proportional background
    over-penalizes high-threshold near-dup plans). ``min_hashes``
    floors the signature width: the production operator thresholds on
    the SIGNATURE-estimated Jaccard (sd ``sqrt(j(1-j)/num_hashes)``),
    so bands are raised until ``r·b ≥ min_hashes`` before the caps
    apply. ``max_bands`` caps the band-shuffle mass (``n·b`` rows)
    and ``max_hashes`` the signature width; at the caps the plan
    DEGRADES RECALL and reports it — ``predicted_recall`` far below
    target means LSH is the wrong tier for that operating point
    (lower the threshold expectation or verify-everything on a
    blocked key instead).

    Returns ``{rows_per_band, num_bands, num_hashes,
    predicted_recall, expected_background_rows}``.
    """
    import math

    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    s_bg = (
        background_jaccard
        if background_jaccard is not None
        else min(0.05, threshold / 2.0)
    )
    if not 0.0 <= s_bg < 1.0:
        raise ValueError("background_jaccard must be in [0, 1)")
    budget = (
        candidate_row_budget
        if candidate_row_budget is not None
        else 50 * max(n, 1)
    )
    pairs = n * max(n - 1, 0) / 2.0
    best = None
    for r in range(1, max_rows_per_band + 1):
        tr = threshold**r
        if tr >= 1.0:
            bands = 1
        else:
            bands = max(
                1,
                math.ceil(
                    math.log(1.0 - target_recall) / math.log(1.0 - tr)
                ),
            )
        # floor the signature width FIRST: the production operator
        # thresholds on the SIGNATURE-estimated Jaccard, whose sd is
        # sqrt(j(1-j)/num_hashes) — below ~64 lanes the estimator, not
        # the banding, loses the pairs
        bands = max(bands, -(-min_hashes // r))
        bands = min(bands, max_bands, max(max_hashes // r, 1))
        bg = pairs * bands * (s_bg**r)
        recall = 1.0 - (1.0 - tr) ** bands
        plan = {
            "rows_per_band": r,
            "num_bands": bands,
            "num_hashes": r * bands,
            "predicted_recall": round(recall, 4),
            "expected_background_rows": int(bg),
        }
        if bg <= budget:
            return plan
        best = plan
    return best


def minhash_near_dup_pairs_auto(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    target_recall: float = 0.95,
    ngram: int = 3,
    seed: int = 1,
    n_rows: int | None = None,
) -> DataFrame:
    """``minhash_near_dup_pairs`` at the PLANNER-chosen banding
    (``minhash_parameter_plan``) — the knobs that keep the candidate
    mass linear at any corpus size. ``n_rows`` skips the sizing count
    when the caller already knows it (e.g. from a scan statistic);
    otherwise one count() action runs here, the documented
    Lloyd-on-a-sample driver-scalar shape.
    """
    n = n_rows if n_rows is not None else df.count()
    plan = minhash_parameter_plan(
        n, jaccard_threshold, target_recall=target_recall
    )
    return minhash_near_dup_pairs(
        df,
        id_col,
        text_col,
        num_hashes=plan["num_hashes"],
        bands=plan["num_bands"],
        ngram=ngram,
        jaccard_threshold=jaccard_threshold,
        seed=seed,
    )
