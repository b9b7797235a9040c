"""Deduplication operators for large-scale training-data pipelines.

No reference analogue (the reference's only dedup is road-network
multi-edge dedup, /root/reference/mapmatching/osmnet/parse_osm_xml.py:296-352,
whose window-rank shape `dedup_rank` below generalizes). All hot paths are
built-in Spark SQL expressions (JVM-side, codegen); only SimHash needs an
Arrow pass for 64-bit bit-twiddling.

Scale notes:
* exact dedup shuffles once on a 128-bit digest — uniformly distributed,
  no skew by construction.
* MinHash-LSH: signature is computed map-side with zero shuffles; the only
  shuffle is the band-bucket self-join. Bucket sizes are capped (drop
  degenerate mega-buckets — boilerplate pages) to bound the join blow-up;
  the cap is logged, not silent.
* near-dup verify uses array_intersect/array_union on shingle sets —
  built-ins, no Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def normalized_text(col: str = "text") -> F.Column:
    """lower + collapse whitespace — the canonical form for exact dedup."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per identical normalized text (hash-groupBy)."""
    return (docs
            .withColumn("_h", F.md5(normalized_text(text_col)))
            .groupBy("_h")
            .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
            .drop("_h"))


def word_shingles(text_col: str = "text", k: int = 3) -> F.Column:
    """Distinct word k-gram shingles as an array<string> (built-in only).

    NOTE: prefer shingles_of_words(F.col('words')) over a *materialized*
    words column — referencing the split(...) expression inside the
    transform lambda would re-evaluate the regex per element (O(n^2))."""
    return shingles_of_words(F.split(normalized_text(text_col), " "), k)


def shingles_of_words(words: F.Column, k: int = 3) -> F.Column:
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0)))
    gram = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int"))
                                                         for j in range(k)]))
    return F.array_distinct(gram)


# universal-hash family for MinHash: h_i(x) = (a_i * x31 + b_i) mod p over
# the 31-bit fold of the FNV base hash. p = 2^31 - 1 keeps every product
# below 2^62 (no int64 overflow under ANSI mode), and the whole family is
# exact integer arithmetic DuckDB reproduces verbatim — the signature,
# band keys, and pair set are SQL-oracle-checkable end to end. Constants
# come from a fixed seed; regenerating them is a breaking change to every
# persisted signature.
MINHASH_P = 2147483647
_mh_rng = np.random.RandomState(0x5EED)
MINHASH_A = [int(x) for x in _mh_rng.randint(1, MINHASH_P, 64)]
MINHASH_B = [int(x) for x in _mh_rng.randint(0, MINHASH_P, 64)]


def minhash_signature(hashes: F.Column, n_hashes: int = 32) -> F.Column:
    """n_hashes-wide MinHash signature over pre-hashed shingles
    (array<long> FNV-1a64 values): min over shingles of each affine
    universal hash — pure integer column arithmetic, no JVM hashing."""
    def h_i(i):
        return F.array_min(F.transform(
            hashes,
            lambda h: (F.lit(MINHASH_A[i]) * h.bitwiseAND(F.lit(MINHASH_P))
                       + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)))
    return F.array(*[h_i(i) for i in range(n_hashes)])


def _tokenize_arrow(text_arr, lower_nul_to_space: bool = False):
    """Columnar whitespace tokenizer over an Arrow string array — pyarrow
    compute only, no per-row Python. Returns (tokens: pa.StringArray with
    empties filtered, counts: per-doc token counts, np.int64).

    Matches `str(t).lower().split()` semantics: utf8_split_whitespace emits
    empty tokens at leading/trailing whitespace (Python's .split() does
    not), so zero-length tokens are dropped; nulls tokenize as 'none'
    (str(None).lower())."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.fill_null(pc.utf8_lower(text_arr), "none")
    if lower_nul_to_space:
        arr = pc.replace_substring(arr, "\x00", " ")
    lst = pc.utf8_split_whitespace(arr).combine_chunks()
    offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts_raw = np.diff(offsets)
    values = lst.flatten()  # tokens in doc order, respecting the list offsets
    vlens = pc.binary_length(values).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = vlens > 0
    n = len(lst)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts_raw)
    tokens = values.take(pa.array(np.flatnonzero(keep)))
    counts = np.bincount(doc_idx[keep], minlength=n).astype(np.int64)
    return tokens, counts


def _string_blob(tokens):
    """Zero-copy (blob, starts, ends) view of a pa.StringArray's utf-8 data."""
    import numpy as np
    arr = tokens.combine_chunks() if hasattr(tokens, "combine_chunks") else tokens
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    blob = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else \
        np.empty(0, dtype=np.uint8)
    return blob, off[:-1], off[1:]


def shingle_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 3) -> DataFrame:
    """(id, sh: array<string>) distinct word k-gram shingles, one Arrow pass.

    Built-in higher-order functions are avoided here deliberately: Catalyst's
    projection collapse re-inlines the tokenizer expression into the
    transform lambda, re-evaluating the regex once per array ELEMENT
    (measured 10s+ for 5k docs). Tokenization + gram assembly are fully
    columnar (pyarrow compute + numpy gather off the list-array offsets);
    the only Python loop is over the k gram positions."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def op(batches):
        for rb in batches:
            tab = pa.Table.from_batches([rb])
            ids = tab.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            tokens, counts = _tokenize_arrow(tab.column(text_col))
            n = len(ids)
            starts = np.zeros(n, dtype=np.int64)
            starts[1:] = np.cumsum(counts)[:-1]

            # docs with >= k tokens get n-k+1 k-grams; 1..k-1 tokens get one
            # gram of all tokens; 0 tokens get [''] (python-path parity)
            full = counts >= k
            g_full = np.where(full, counts - k + 1, 0)
            fi = np.flatnonzero(full)
            # flat token index of each full gram's first token
            reps = g_full[fi]
            gram_doc_f = np.repeat(fi, reps)
            base = np.repeat(starts[fi], reps)
            local = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
            gs = base + local
            cols = [tokens.take(pa.array(gs + j)) for j in range(k)]
            grams_f = pc.binary_join_element_wise(*cols, " ") if len(gs) else \
                pa.array([], type=pa.string())

            short = (counts > 0) & (counts < k)
            si = np.flatnonzero(short)
            if len(si):
                # one gram per short doc: gather its tokens into a compact
                # values array (ListArray offsets must be contiguous), join
                sc = counts[si]
                idx_s = np.repeat(starts[si], sc) + (
                    np.arange(sc.sum(), dtype=np.int64)
                    - np.repeat(np.concatenate([[0], np.cumsum(sc)[:-1]]), sc))
                soff = np.zeros(len(si) + 1, dtype=np.int64)
                soff[1:] = np.cumsum(sc)
                sl = pa.ListArray.from_arrays(pa.array(soff),
                                              tokens.take(pa.array(idx_s)))
                grams_s = pc.binary_join(sl, " ")
            else:
                grams_s = pa.array([], type=pa.string())
            ei = np.flatnonzero(counts == 0)

            gram_doc = np.concatenate([gram_doc_f, si, ei])
            gram_val = pa.concat_arrays([
                grams_f.combine_chunks() if hasattr(grams_f, "combine_chunks") else grams_f,
                grams_s.combine_chunks() if hasattr(grams_s, "combine_chunks") else grams_s,
                pa.array([""] * len(ei), type=pa.string())])

            # per-doc distinct (order-insensitive consumers only), C-level
            pdf = pd.DataFrame({"d": gram_doc,
                                "g": gram_val.to_pandas()}).drop_duplicates()
            pdf = pdf.sort_values("d", kind="stable")
            per_doc = np.bincount(pdf.d.to_numpy(), minlength=n)
            offs = np.zeros(n + 1, dtype=np.int64)
            offs[1:] = np.cumsum(per_doc)
            sh = pa.ListArray.from_arrays(pa.array(offs),
                                          pa.array(pdf.g.to_numpy(), type=pa.string()))
            # FNV-1a64 of each distinct gram, vectorized off the string
            # blob — the MinHash base hash (SQL-reproducible: the DuckDB
            # oracle recomputes it with the same byte recurrence)
            hv = _fnv1a64_vec(pdf.g.tolist()).astype(np.int64)
            hs = pa.ListArray.from_arrays(pa.array(offs), pa.array(hv))
            yield pa.RecordBatch.from_arrays([pa.array(ids), sh, hs],
                                             ["id", "sh", "hs"])

    return docs.select(id_col, text_col).mapInArrow(
        op, schema="id long, sh array<string>, hs array<long>")


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 3, n_hashes: int = 16, bands: int = 8,
                      jaccard_threshold: float = 0.6,
                      max_bucket: int = 200) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding, verified with
    exact shingle Jaccard. Returns (a, b, jaccard) with a < b.

    16 hashes / 8 bands of 2: band-collision prob at jaccard 0.6 is
    1-(1-0.36)^8 ~ 0.97. More hashes would *reduce* throughput steeply:
    the 32-hash signature tips whole-stage codegen over janino limits
    (measured 4.6s vs 0.4s for 16)."""
    rows_per_band = n_hashes // bands
    if rows_per_band > 2:
        # base-2^31 positional band keys only fit int64 for <=2 rows/band
        # ((2^31)^3 overflows and wraps, creating spurious collisions and
        # breaking the exact-integer SQL-oracle parity)
        raise ValueError(
            f"n_hashes/bands = {rows_per_band} rows per band exceeds the "
            "int64-exact limit of 2; raise `bands` or lower `n_hashes`")
    # NOTE on input spreading: spread_input(docs) here cuts the COLD
    # shingle pass 5.1 s -> 0.6 s at sf1.0 (the scan arrives in 1-2
    # partitions) but costs ~0.9 s on every WARM run — the persisted
    # base is re-scanned by three downstream joins and the wider cache
    # adds per-scan overhead that outweighs the one-off win in repeated
    # workloads (A/B measured r7). A one-shot caller can pre-spread its
    # docs frame; this path optimizes the persisted/repeated shape.
    base = (shingle_docs(docs, id_col, text_col, k)
            .filter(F.size("sh") > 0)
            .withColumn("sig", minhash_signature(F.col("hs"), n_hashes))
            .persist())

    # slim band keys only — shingle arrays never enter the band shuffle
    # band key = base-2^31 positional encoding of the band's signature
    # values (each < p < 2^31, so rows_per_band = 2 stays below 2^62) —
    # exact arithmetic the SQL oracle reproduces, no hashing
    def bkey(b):
        key = F.lit(0).cast("long")
        for r in range(rows_per_band):
            key = key * F.lit(2147483648) + F.element_at("sig", b * rows_per_band + r + 1)
        return key
    banded = base.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), bkey(b).alias("bh"))
            for b in range(bands)])).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    # cap degenerate buckets (boilerplate text)
    wb = Window.partitionBy("band", "bh")
    banded = (banded.withColumn("_n", F.count("*").over(wb))
              .filter(F.col("_n") <= max_bucket).drop("_n"))

    l = banded.alias("l")
    r = banded.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.bh") == F.col("r.bh"))
                   & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .dropDuplicates(["a", "b"]))

    toks = base.select("id", "sh")
    cand = (cand.join(toks.select(F.col("id").alias("a"), F.col("sh").alias("sh_a")), "a")
                .join(toks.select(F.col("id").alias("b"), F.col("sh").alias("sh_b")), "b"))

    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    return (cand.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= jaccard_threshold)
            .select("a", "b", "jaccard"))


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.5) -> DataFrame:
    """Brute-force pairwise word-set Jaccard (the exactness baseline the
    LSH path is measured against; SQL-oracle-able). Quadratic — use only
    at verification scale or after blocking."""
    toks = (docs.select(F.col(id_col).alias("id"),
                        F.array_distinct(F.split(normalized_text(text_col), " ")).alias("t")))
    l, r = toks.alias("l"), toks.alias("r")
    jac = (F.size(F.array_intersect("l.t", "r.t"))
           / F.size(F.array_union("l.t", "r.t")))
    return (l.join(r, F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                    jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document (Arrow pass — bit-twiddling isn't a
    Spark built-in). Deterministic FNV-1a over whitespace tokens, fully
    numpy-vectorized: one flat token blob per batch, a padded byte matrix,
    and max_token_len vectorized FNV rounds — no per-row Python in the hot
    loop (the per-token-loop variant measured ~20x slower at 5k docs)."""
    import numpy as np
    import pyarrow as pa

    def op(batches):
        for rb in batches:
            tab = pa.Table.from_batches([rb])
            ids = tab.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            # columnar tokenize (pyarrow compute); the token utf-8 bytes are
            # read zero-copy straight out of the Arrow values buffer — no
            # per-doc Python at all
            tokens, counts = _tokenize_arrow(tab.column(text_col),
                                             lower_nul_to_space=True)
            out = np.zeros(len(ids), dtype=np.uint64)
            nz = counts > 0
            if nz.any():
                blob, tstarts, tends = _string_blob(tokens)
                hs = _fnv1a64_blob(blob, tstarts, tends)
                # bit matrix via unpackbits over the hashes' own bytes
                # (little-endian: byte k column-block k holds bits
                # 8k..8k+7) — ~10x the shift-broadcast expansion it
                # replaces (measured 1.77 s -> this path at 5k docs)
                bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8),
                                     axis=1, bitorder="little")
                doc_starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]])
                sums = np.add.reduceat(bits, doc_starts, axis=0,
                                       dtype=np.int64)
                v = (sums * 2 >= counts[nz, None]).astype(np.uint64)
                out[nz] = (v << np.arange(64, dtype=np.uint64)).sum(axis=1,
                                                                    dtype=np.uint64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(out.astype(np.int64))],
                [id_col, "simhash"])

    return docs.select(id_col, text_col).mapInArrow(op, schema=f"{id_col} long, simhash long")


def _fnv1a64_vec(tokens: list[str]):
    """FNV-1a(64) of each utf-8 token from a Python list (test/cross-check
    surface; the Arrow hot path feeds _fnv1a64_blob zero-copy)."""
    import numpy as np
    if not tokens:
        return np.array([], dtype=np.uint64)
    blob = np.frombuffer("\x00".join(tokens).encode("utf-8"), dtype=np.uint8)
    seps = np.flatnonzero(blob == 0)
    starts = np.empty(len(tokens), dtype=np.int64)
    starts[0] = 0
    starts[1:] = seps + 1
    ends = np.empty(len(tokens), dtype=np.int64)
    ends[:-1] = seps
    ends[-1] = len(blob)
    return _fnv1a64_blob(blob, starts, ends)


def _fnv1a64_blob(blob, starts, ends):
    """FNV-1a(64) of each token given a uint8 blob + per-token offsets
    (zero-copy from an Arrow string array's buffers): sort tokens by length
    descending, then run max_len hash rounds where round j touches only the
    contiguous prefix of tokens longer than j — no masks, no padded matrix
    (the uint8 blob stays cache-resident; measured ~7x the scalar loop,
    ~20x the old per-doc loop). Matches _fnv1a64 byte-for-byte."""
    import numpy as np
    if len(starts) == 0:
        return np.array([], dtype=np.uint64)
    lens = ends - starts
    order = np.argsort(-lens)
    s_sorted = starts[order]
    l_sorted = lens[order]
    h = np.full(len(starts), 0xcbf29ce484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001b3)
    max_len = int(l_sorted[0]) if len(l_sorted) else 0
    # ks[j] = how many tokens have len > j (lens sorted desc -> prefix)
    ks = np.searchsorted(-l_sorted, -np.arange(1, max_len + 1), side="right")
    for j in range(max_len):
        k = ks[j]
        h[:k] = (h[:k] ^ blob[s_sorted[:k] + j].astype(np.uint64)) * prime
    out = np.empty_like(h)
    out[order] = h
    return out


def _fnv1a64(s: str) -> int:
    """Scalar reference implementation (kept for tests/cross-checks)."""
    h = 0xcbf29ce484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit chunks
    (a pair within hamming<=3 shares at least one of 4 chunks exactly).

    The (id, simhash) frame is persisted before the self-join: without it
    the physical plan carries TWO MapInArrow nodes — the full corpus text
    scan + hash runs once per join side (verified on the executed plan).
    16 bytes/row of storage buys back an entire corpus re-hash, the same
    trade the MinHash path makes with its signature table."""
    from ..functions.spread import spread_input
    sh = simhash64(spread_input(docs), id_col, text_col).persist()
    chunks = sh.select(F.col(id_col).alias("id"), "simhash",
                       F.explode(F.array(*[
                           F.struct(F.lit(c).alias("c"),
                                    F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"))
                           for c in range(4)])).alias("ck")) \
              .select("id", "simhash", F.col("ck.c").alias("c"), F.col("ck.v").alias("v"))
    # spread the PROBE side of the bucket join: the corpus parquet often
    # arrives in 1-2 partitions, and the join's output volume (the
    # bucket-pair cross product, 21.8M rows at sf1.0) is generated by
    # the probe side's tasks — left at input partitioning it ran on 1-2
    # cores (measured: the whole remaining 5.5 s of this query). A
    # round-robin spread of the 4-rows-per-doc chunk table is a trivial
    # shuffle that also distributes HOT buckets' probe rows evenly
    # (hash-partitioning by (c, v) would pin each hot bucket's entire
    # output on one task — the skew guide §2.5 warns about); at scale
    # the input is already wide and spread_input is a no-op.
    from ..functions.spread import spread_input
    l = spread_input(chunks).alias("l")
    # broadcast the RIGHT side explicitly: with two same-sized inputs the
    # planner may otherwise broadcast the repartitioned side and probe
    # from the narrow one, undoing the spread
    r = F.broadcast(chunks).alias("r")
    # hamming filter BEFORE the pair dedup: a boilerplate-heavy corpus
    # makes chunk buckets large (sf1.0 bench: 21.8M joined pairs, 20k
    # surviving) and the dedup is a full hash aggregate + exchange over
    # every joined row — filtering first keeps the aggregate input at
    # ~4x the OUTPUT size instead of the bucket-pair cross product
    # (guide §2.3 "project/filter before the exchange"; measured
    # 36.2 s -> 4.4 s at sf1.0). hamming is a pure function of (a, b)
    # (each doc has ONE simhash), so filter/dedup commute bitwise.
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (l.join(r, (F.col("l.c") == F.col("r.c")) & (F.col("l.v") == F.col("r.v"))
                   & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                    ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .dropDuplicates(["a", "b"]))


def dedup_rank(df: DataFrame, keys: list[str], order: list) -> DataFrame:
    """Generic keep-best-per-group (the reference's multi-edge dedup shape,
    parse_osm_xml.py:296-352): rank within keys by order, keep first."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# near-dup CLUSTERS: connected components over a pair table
# ---------------------------------------------------------------------------

def _cc_canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u < v), no self-loops, distinct."""
    return (e.filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"),
                    F.greatest("u", "v").alias("v"))
            .distinct())


def connected_components(pairs: DataFrame, id_a: str = "a", id_b: str = "b",
                         max_iter: int = 30,
                         reliable_checkpoint_dir: str | None = None) -> DataFrame:
    """(a, b) near-dup pairs -> (id, component) where component is the
    smallest id reachable through the pair graph. Every id appearing in
    pairs gets a row; component representatives map to themselves.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — each round
    is two shuffle joins + a groupBy-min, and the edge set converges to a
    star forest in O(log^2 n) rounds REGARDLESS of component diameter.
    Plain min-label propagation needs O(diameter) rounds, and real
    boilerplate near-dup chains (page_1 ~ page_2 ~ ... ~ page_k) make the
    diameter O(cluster size) — the star-contraction rounds are what make
    this safe on a 100 TB corpus. No driver-side state: the only per-round
    driver value is the convergence count.

    Each round:
      large-star: every node links its LARGER neighbors to its smallest
        neighborhood member (incl. itself);
      small-star: every node links its smaller-or-equal neighbors (and
        itself) to the smallest of them.
    Fixpoint: the canonical edge set stops changing; edges are then
    exactly (member -> component min)."""
    e = _cc_canon(pairs.select(F.col(id_a).cast("long").alias("u"),
                               F.col(id_b).cast("long").alias("v"))
                  .filter(F.col(id_a).isNotNull() & F.col(id_b).isNotNull()))
    # Checkpoint, not persist: persist caches DATA but keeps the logical
    # plan growing each round — by round ~5 the nested plan tree alone
    # OOMs the driver (measured). The checkpoint cuts lineage so every
    # round starts from a flat scan.
    #
    # reliable_checkpoint_dir: on a real cluster pass a durable path
    # (HDFS/S3) — localCheckpoint stores blocks on executors and a lost
    # executor makes every later round unrecoverable; reliable
    # checkpoints survive executor loss. Defaults to localCheckpoint for
    # single-node / ephemeral runs (faster, no filesystem dependency).
    if reliable_checkpoint_dir is not None:
        spark = pairs.sparkSession
        sc = spark.sparkContext
        if sc.getCheckpointDir() != reliable_checkpoint_dir:
            sc.setCheckpointDir(reliable_checkpoint_dir)

        def _ckpt(df):
            return df.checkpoint(eager=True)
    else:
        def _ckpt(df):
            return df.localCheckpoint(eager=True)
    e = _ckpt(e)
    # multiset fingerprint for the cheap convergence test: (count,
    # sum-of-row-hashes) in ONE action per round; on a fingerprint match
    # the exact exceptAll confirms (so a hash collision can only cost one
    # extra round, never a wrong result)
    def _fp(df):
        # 40-bit masked hashes: the sum stays < 2^63 (ANSI mode) up to
        # ~8e6 billion rows
        r = df.agg(F.count("*").alias("n"),
                   F.sum(F.xxhash64("u", "v")
                         .bitwiseAND(F.lit((1 << 40) - 1))).alias("s")
                   ).collect()[0]
        return (r.n, r.s)

    fp_prev = _fp(e)
    for it in range(max_iter):
        # ---- large-star: link every strictly-larger neighbor of u to
        # min(neighborhood(u) + u) ----
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u")
                .agg(F.min("v").alias("m"))
                .select("u", F.least("m", F.col("u")).alias("m")))
        large = (sym.join(mins, "u")
                 .filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v")))
        e1 = _ckpt(_cc_canon(large))
        # ---- small-star: per child c (canonical edges are (parent u < c)),
        # link every parent AND c itself to the smallest parent ----
        pm = e1.groupBy("v").agg(F.min("u").alias("m"))
        small = (e1.join(pm, "v")
                 .select(F.col("u"), F.col("m").alias("v"))
                 .union(pm.select(F.col("v").alias("u"), F.col("m").alias("v"))))
        e2 = _ckpt(_cc_canon(small))
        fp2 = _fp(e2)
        stable = fp2 == fp_prev and e2.exceptAll(e).isEmpty()
        e, fp_prev = e2, fp2
        if stable:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # converged star forest, canonical (u, v): u IS the component min,
    # v the member; roots map to themselves
    labels = (e.select(F.col("v").alias("id"), F.col("u").alias("component"))
              .union(e.select(F.col("u").alias("id"), F.col("u").alias("component")))
              .distinct())
    return labels


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         id_a: str = "a", id_b: str = "b",
                         order: list | None = None) -> DataFrame:
    """Cluster-level dedup: ONE document per near-dup component, all other
    cluster members dropped; documents in no pair pass through untouched.
    This is the operation a training-data pipeline actually runs on the
    pair tables the minhash/simhash/cosine operators emit.

    order=None keeps the smallest id (deterministic, no doc-side data
    needed). order=[...] (e.g. [F.desc("quality"), id_col]) keeps the
    top-ranked doc per component — keep-best-quality dedup — via a window
    rank over the component key (always include a unique tiebreaker)."""
    labels = connected_components(pairs, id_a, id_b)
    if order is None:
        dropped = labels.filter(F.col("id") != F.col("component")) \
                        .select(F.col("id").alias(id_col))
        return docs.join(dropped, id_col, "left_anti")
    lab = labels.select(F.col("id").alias(id_col), "component")
    with_c = (docs.join(lab, id_col, "left")
              .withColumn("component",
                          F.coalesce("component", F.col(id_col))))
    return dedup_rank(with_c, ["component"], order).drop("component")
