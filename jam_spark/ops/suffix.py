"""Distributed generalized suffix array + suffix-array substring dedup.

The north rule names three near-dup families — MinHash, SimHash, and
*suffix-array substring* (the Lee et al. 2022 "Deduplicating Training
Data Makes Language Models Better" approach). :mod:`jam_spark.ops.dedup`
already covers fixed-window substring dedup by hashing
(``substring_dup_spans``); this module adds the real suffix-array path,
whose extra power is MAXIMAL matches: adjacent suffixes in SA order
expose the longest common prefix directly, so duplicated spans of any
length fall out of one pass instead of one hash pass per length.

Algorithm: prefix doubling (Manber & Myers 1990; distributed formulation
as in Flick & Aluru, SC'15) over the frozen whitespace token sequences.
Suffixes are (doc_id, pos) with an implicit end-of-doc terminator that
sorts before every token. Each round h: re-rank suffixes by the pair
(rank_h(pos), rank_h(pos + h)) — after ceil(log2(max_doc_tokens))
rounds, ranks order suffixes fully (exactly tied suffixes, e.g. from
identical docs, are broken by (doc_id, pos) in the final row-number
pass, matching the SQL oracle's ``ORDER BY suffix, doc_id, pos``).

Scale shape (100 TB): every global rank assignment uses the same
two-phase pattern as ``dedup.shard_plan`` — ``repartitionByRange`` on
the rank key, ONE row per partition to the driver (distinct count +
boundary keys; corpus-independent), prefix-computed offsets broadcast
back, then a window partitioned BY PARTITION ID. No single-partition
window, no driver-sized data. Per round: one range shuffle + one
(doc_id, pos) hash-join shuffle; rounds = ceil(log2(max doc length in
tokens)) — 17 rounds for 100k-token docs, each AQE-planned. The loop
early-exits as soon as ranks are fully distinct (the driver already
holds the global distinct count — no extra job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._persist import free_local_checkpoint, track
from .text import _TOKENS, _tokens_col

#: driver-query defaults: the sf0.01 corpus duplicates whole docs and
#: shares template sentences, so min_len=8 surfaces both while keeping
#: the pair list value-checkable. cap bounds the per-row LCP compute.
SA_MIN_LEN = 8
SA_LCP_CAP = 64


def _two_phase_rank(
    df: DataFrame,
    keys: list[str],
    kind: str = "dense",
    num_partitions: int | None = None,
    out: str = "grank",
) -> tuple[DataFrame, int, DataFrame]:
    """Global ``dense_rank`` (kind='dense') or ``row_number``
    (kind='rownum') over ``keys`` with NO single-partition window:
    range-partition on the keys, aggregate one row PER PARTITION to the
    driver (count + boundary keys), prefix-sum offsets there, broadcast
    them back, and rank inside each bounded partition. Returns the
    ranked frame, the global number of distinct keys (dense) or rows
    (rownum) — free on the driver, used for the prefix-doubling early
    exit — and the cached exchange (already materialized by the stats
    pass; registry-tracked, but iterative callers unpersist it early to
    bound live memory). Ranks are 1-based BIGINTs."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    parts = track(
        df.repartitionByRange(num_partitions, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    key_struct = F.struct(*[F.col(k) for k in keys])
    if kind == "dense":
        stats = parts.groupBy("_pid").agg(
            F.countDistinct(*keys).alias("n"),
            F.min(key_struct).alias("first"),
            F.max(key_struct).alias("last"),
        ).collect()
    else:
        stats = parts.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    offs, total, prev_last = [], 0, None
    for r in sorted(stats, key=lambda r: r["_pid"]):
        if kind == "dense":
            # a key run spanning the partition boundary was already
            # counted by the previous partition
            adj = 1 if prev_last is not None and r["first"] == prev_last else 0
            offs.append((int(r["_pid"]), int(total - adj)))
            total += int(r["n"]) - adj
            prev_last = r["last"]
        else:
            offs.append((int(r["_pid"]), int(total)))
            total += int(r["n"])
    off_df = spark.createDataFrame(offs, schema="_pid int, _off long")
    from pyspark.sql import Window as W

    w = W.partitionBy("_pid").orderBy(*keys)
    local = F.dense_rank() if kind == "dense" else F.row_number()
    ranked = (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(out, (local.over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
    return ranked, total, parts


def doc_token_arrays(documents: DataFrame) -> DataFrame:
    """(doc_id, tokens) — frozen whitespace token spec, empty docs kept
    as empty arrays (they contribute no suffixes)."""
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _tokens_col().alias("tokens"),
    )


def suffix_array(
    documents: DataFrame,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, pos, sa_rank) — the generalized suffix array over the
    corpus token sequences: ``sa_rank`` is the 1-based position of the
    suffix ``tokens[pos:]`` (``pos`` 1-based) in the lexicographic order
    of ALL corpus suffixes, token-by-token, end-of-doc sorting before
    any token, exact ties broken by (doc_id, pos). Equal to the SQL
    twin's single ordered window ``row_number() OVER (ORDER BY suffix,
    doc_id, pos)`` by the same argument as ``shard_plan``: range
    partitions are non-overlapping and ordered, so local rank +
    partition offset is the global rank.

    Iteration memory/lineage discipline (without it, the self-join
    doubles the logical plan every round — 2^rounds plan copies blew
    the driver heap in testing): each round's ranks are CUT (reliable
    ``checkpoint`` when ``checkpoint_dir`` is set, matching
    :func:`jam_spark.cluster.cc`'s contract, else ``localCheckpoint``)
    and the previous round's cut + cached exchange are unpersisted as
    soon as the new cut is materialized — at most ~3 corpus-sized
    frames live at any moment regardless of round count."""
    spark = documents.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    toks = track(
        doc_token_arrays(documents).where(F.size("tokens") > 0)
    )
    agg = toks.agg(
        F.max(F.size("tokens")).alias("mx"),
        F.sum(F.size("tokens")).alias("n"),
    ).collect()[0]
    max_len, n_suffixes = int(agg["mx"] or 0), int(agg["n"] or 0)

    sfx = toks.select(
        "doc_id", F.posexplode("tokens").alias("pos0", "token")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token"
    )
    ranks, n_distinct, parts = _two_phase_rank(
        sfx, ["token"], "dense", num_partitions, out="rank"
    )
    ranks = ranks.select("doc_id", "pos", "rank")

    # `stale` frames feed the CURRENT lazy `ranks` plan; they become
    # droppable the moment the next eager cut materializes it
    stale: list[DataFrame] = [parts]
    prev_cut: DataFrame | None = None
    h = 1
    while h < max_len and n_distinct < n_suffixes:
        cut = _cut(ranks)
        for df in stale:
            df.unpersist()
        if prev_cut is not None:
            free_local_checkpoint(prev_cut)
        stale, prev_cut = [], cut
        nxt = cut.select(
            "doc_id",
            (F.col("pos") - h).alias("pos"),
            F.col("rank").alias("nrank"),
        )
        paired = cut.join(nxt, ["doc_id", "pos"], "left").withColumn(
            "nrank", F.coalesce("nrank", F.lit(0).cast("long"))
        )
        ranked, n_distinct, parts = _two_phase_rank(
            paired, ["rank", "nrank"], "dense", num_partitions, out="rank2"
        )
        stale = [parts]
        ranks = ranked.select(
            "doc_id", "pos", F.col("rank2").alias("rank")
        )
        h *= 2

    # the final call's driver stats pass materializes its own cached
    # exchange, consuming `ranks` — the last round's frames can go now
    final, _, _ = _two_phase_rank(
        ranks, ["rank", "doc_id", "pos"], "rownum",
        num_partitions, out="sa_rank",
    )
    for df in stale:
        df.unpersist()
    if prev_cut is not None:
        free_local_checkpoint(prev_cut)
    return final.select("doc_id", "pos", "sa_rank")


def suffix_array_sql() -> str:
    """DuckDB twin of :func:`suffix_array` — the single ordered window
    the distributed prefix doubling is provably equal to. Token
    sequences compare as strings joined on chr(1), which is smaller
    than every token character (tokens are whitespace-split, so all
    chars are > chr(32)): prefix-of ordering then matches the implicit
    end-of-doc terminator."""
    return f"""
        WITH toks AS (
          SELECT doc_id::BIGINT AS doc_id, {_TOKENS} AS t FROM documents
        ),
        sfx AS (
          SELECT doc_id, u.i::BIGINT AS pos,
                 array_to_string(t[u.i :], chr(1)) AS s
          FROM toks,
               LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
        )
        SELECT doc_id, pos,
               row_number() OVER (ORDER BY s, doc_id, pos)::BIGINT
                   AS sa_rank
        FROM sfx
    """


def sa_dup_spans(
    documents: DataFrame,
    min_len: int = SA_MIN_LEN,
    cap: int = SA_LCP_CAP,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_a, pos_a, doc_b, pos_b, lcp) — suffix-array substring dedup:
    every ADJACENT pair in suffix order whose common token prefix is at
    least ``min_len`` long, with the actual match length ``lcp``
    (reported exactly up to ``cap`` tokens; longer matches clamp to
    ``cap`` — they are already far past the dedup threshold). Any
    duplicated span of length >= min_len anywhere in the corpus makes
    its suffixes adjacent in SA order, so adjacency recall is complete —
    the classic SA-dedup argument. Complements
    ``dedup.substring_dup_spans`` (fixed-window hashing): one pass here
    yields variable, MAXIMAL match lengths.

    Scale shape: the suffix array's shuffles, plus one sa_rank
    adjacency self-join (8-byte key) and a per-row zip compare bounded
    by ``cap`` — no cartesian anywhere."""
    sa = suffix_array(documents, num_partitions)
    toks = doc_token_arrays(documents)
    windowed = sa.join(toks, "doc_id").select(
        "sa_rank",
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
        F.expr(f"slice(tokens, pos, {int(cap)})").alias("win_a"),
    )
    nxt = windowed.select(
        (F.col("sa_rank") - 1).alias("sa_rank"),
        F.col("doc_a").alias("doc_b"),
        F.col("pos_a").alias("pos_b"),
        F.col("win_a").alias("win_b"),
    )
    zipped = F.zip_with("win_a", "win_b", lambda x, y: x.eqNullSafe(y))
    first_miss = F.array_position(zipped, F.lit(False))
    lcp = F.when(first_miss > 0, first_miss - 1).otherwise(
        F.least(F.size("win_a"), F.size("win_b"))
    )
    return (
        windowed.join(nxt, "sa_rank")
        .withColumn("lcp", lcp.cast("long"))
        .where(F.col("lcp") >= min_len)
        .select("doc_a", "pos_a", "doc_b", "pos_b", "lcp")
    )


def sa_dup_spans_sql(
    min_len: int = SA_MIN_LEN, cap: int = SA_LCP_CAP
) -> str:
    """DuckDB twin of :func:`sa_dup_spans`: lead() over the suffix
    order, LCP via the same cap-bounded zip compare (list_zip pads the
    shorter side with NULLs exactly like Spark's zip_with; IS NOT
    DISTINCT FROM makes the pad compare false, so the first-false
    position minus one IS the common prefix length)."""
    return f"""
        WITH toks AS (
          SELECT doc_id::BIGINT AS doc_id, {_TOKENS} AS t FROM documents
        ),
        sfx AS (
          SELECT doc_id, u.i::BIGINT AS pos,
                 array_to_string(t[u.i :], chr(1)) AS s,
                 t[u.i : u.i + {int(cap)} - 1] AS win
          FROM toks,
               LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
        ),
        pairs AS (
          SELECT doc_id AS doc_a, pos AS pos_a, win AS win_a,
                 lead(doc_id) OVER w AS doc_b,
                 lead(pos) OVER w AS pos_b,
                 lead(win) OVER w AS win_b
          FROM sfx
          WINDOW w AS (ORDER BY s, doc_id, pos)
        ),
        scored AS (
          SELECT doc_a, pos_a, doc_b, pos_b,
                 (CASE
                    WHEN list_position(
                           list_transform(
                             list_zip(win_a, win_b),
                             z -> (z[1] IS NOT DISTINCT FROM z[2])),
                           false) > 0
                    THEN list_position(
                           list_transform(
                             list_zip(win_a, win_b),
                             z -> (z[1] IS NOT DISTINCT FROM z[2])),
                           false) - 1
                    ELSE least(len(win_a), len(win_b))
                  END)::BIGINT AS lcp
          FROM pairs WHERE doc_b IS NOT NULL
        )
        SELECT doc_a, pos_a, doc_b, pos_b, lcp
        FROM scored WHERE lcp >= {int(min_len)}
    """
