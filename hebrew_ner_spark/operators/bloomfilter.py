"""Runtime Bloom-filter join pruning: build a tiny mergeable bitset from a
join's build side, prune the probe side map-side BEFORE its shuffle.

Why this belongs in the engine: every selective fact⋈dim or fact⋈fact
join in the KG chain (mentions ⋈ alias dictionary when the dictionary
outgrows broadcast, triples ⋈ resolved entities, lineitem ⋈ filtered
orders) shuffles the FULL probe side even though most probe rows will
never match. Spark's own AQE runtime filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects exactly
this rewrite; here it is explicit, deterministic, and oracle-checkable:

  * the filter is O(m) bits regardless of build cardinality — at 10^12
    docs a 2^30-bit filter is 128 MB, broadcastable when the dictionary
    itself (10^8 aliases x surface strings) is not;
  * probe pruning is ``k`` chained **broadcast left-semi joins** (one per
    hash seed) — BroadcastHashJoins evaluated map-side inside the scan
    stage, so the probe side is never shuffled to be pruned;
  * no false negatives, ever: the pruned join returns bit-for-bit the
    rows of the unpruned join (gate ``flt_bloom_join_equiv`` pins this —
    its oracle is the PLAIN join, so a single dropped row fails the
    hash); false positives only cost wasted shuffle, bounded by
    (1 - e^(-k*n/m))^k (~7% at the gate's n=3k/m=16k/k=3);
  * mergeable: the bitset is a table of distinct set-bit positions, so
    the filter of a union of corpus shards is the distinct-union of
    their bitsets (pytest-pinned) — shards/micro-batches build filters
    independently and OR them, same contract as the HLL registers in
    operators/sketches.py.

Determinism contract (repo-wide — functions/hashing.py): bit positions
are ``phash(key, seed) % m`` on the portable 60-bit md5 hash, so the
DuckDB oracle replays the bitset AND the false-positive set exactly
(gates ``flt_bloom_bits``, ``flt_bloom_fp``).

Reference anchor: the reference has no runtime filters (single-process,
utils/functions.py joins are in-memory dict lookups); this is the
scale-mandated generalization of its dictionary-membership checks
(e.g. alphabet.py:46-55 get_index falling back to unk — a bloom miss IS
a proven unk, map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_col, phash_duck

BLOOM_SEED = 901      # seed base; hash i uses BLOOM_SEED + i
BLOOM_K = 3           # hash functions
BLOOM_M = 16_384      # bits for the join gates (production knob: 2^30)
FP_M = 64             # deliberately tiny m for the false-positive gate


def bloom_bits(build: DataFrame, key_col: str, m: int = BLOOM_M,
               k: int = BLOOM_K) -> DataFrame:
    """(bit) — distinct set-bit positions of the build side's Bloom
    filter. At most ``m`` rows by construction, independent of build
    cardinality; one narrow explode + a distinct over <= m values
    (map-side partial dedup makes the shuffle trivial)."""
    hashes = F.array(*[
        (phash_col(F.col(key_col).cast("string"), BLOOM_SEED + i) % m)
        for i in range(k)
    ])
    return build.select(F.explode(hashes).alias("bit")).distinct()


def bloom_prune(probe: DataFrame, key_col: str, bits: DataFrame,
                m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Probe rows whose key passes the Bloom filter (all ``k`` bits set).

    k chained broadcast left-semi joins — zero probe-side shuffle; the
    pruned output is a superset of true matches (no false negatives).
    """
    out = probe
    for i in range(k):
        b = bits.select(F.col("bit").alias(f"bit_{i}"))
        cond = (
            (phash_col(F.col(key_col).cast("string"), BLOOM_SEED + i) % m)
            == F.col(f"bit_{i}")
        )
        out = out.join(F.broadcast(b), cond, "left_semi")
    return out


def bloom_bits_duck(build_sql: str, key_expr: str, m: int = BLOOM_M,
                    k: int = BLOOM_K) -> str:
    """DuckDB fragment replaying bloom_bits bit-for-bit over a build-side
    subquery (``build_sql`` must select ``key_expr`` as a VARCHAR)."""
    arms = " UNION ".join(
        f"SELECT {phash_duck(key_expr, BLOOM_SEED + i)} % {m} AS bit "
        f"FROM ({build_sql})"
        for i in range(k)
    )
    return arms


def bloom_member_duck(key_expr: str, bits_cte: str, m: int = BLOOM_M,
                      k: int = BLOOM_K) -> str:
    """DuckDB boolean fragment: all k bits of ``key_expr`` present in the
    bitset CTE named ``bits_cte``."""
    return " AND ".join(
        f"({phash_duck(key_expr, BLOOM_SEED + i)} % {m}) IN "
        f"(SELECT bit FROM {bits_cte})"
        for i in range(k)
    )


# ---------------------------------------------------------------------------
# Per-file Bloom skipping (point-lookup file pruning)
# ---------------------------------------------------------------------------
#
# The join-pruning filters above are ONE bitset for a whole build side.
# A lakehouse scan planner also keeps one small Bloom blob PER DATA FILE
# over a high-cardinality column (Parquet bloom_filter pages; Iceberg
# puffin blobs) so that a point lookup ``WHERE url = X`` opens only the
# files whose blob passes — min/max stats are useless for such a column
# (every file's [min,max] spans the whole hash space). The layout below
# is write-order clustered (each file holds a contiguous crawl window,
# the natural shape of an append-only CC-style ingest), so the lookup
# key ``url`` is decorrelated from the layout and Bloom skipping is the
# ONLY thing standing between a point lookup and a full-table scan.
#
# Scale shape: the blob table is metadata-grain (n_files x <= m rows —
# ~10^8 files for a 10^12-row table, itself a Spark job, which is the
# point of planning engine-side). The lookup-key side is tiny and is
# BROADCAST onto the blob table, so the manifest plane never shuffles;
# file decisions are a map-side join + one keyed aggregate.

FILE_BLOOM_M = 512     # bits per file blob (gate-sized; production 2^20)
FILE_BLOOM_SEED = 977  # distinct seed base from the join filters
FILE_CHUNK = 64        # docs per data file (write-order clustering)


def _file_hashes(col, m: int, k: int):
    return F.array(*[
        (phash_col(col.cast("string"), FILE_BLOOM_SEED + i) % m)
        for i in range(k)
    ])


def file_blooms(pages: DataFrame, key_col: str = "url",
                file_col: str = "file_id", m: int = FILE_BLOOM_M,
                k: int = BLOOM_K) -> DataFrame:
    """(file_id, bit) — per-file Bloom blobs over ``key_col``: the
    distinct set-bit positions of each file's filter. <= m rows per
    file by construction; the distinct's shuffle is metadata-grain and
    map-side-combined."""
    return pages.select(
        F.col(file_col),
        F.explode(_file_hashes(F.col(key_col), m, k)).alias("bit"),
    ).distinct()


def bloom_point_lookup(blooms: DataFrame, keys: DataFrame,
                       key_col: str = "k", m: int = FILE_BLOOM_M,
                       k: int = BLOOM_K) -> DataFrame:
    """(k, file_id) — the files a point lookup on each key must scan:
    exactly those whose blob has ALL k bits of the key set.

    The key side is exploded to its distinct bit positions (two hash
    seeds may collide on one bit, so the required count is the key's
    DISTINCT bit count, not k) and broadcast onto the blob table — the
    manifest plane is pruned map-side, no blob shuffle. No false
    negatives ever: a file containing the key has all its bits set, so
    the (key, file) pair always survives; false positives only cost
    wasted file opens, bounded by (1 - e^(-k*n/m))^k per file."""
    key_bits = keys.select(
        F.col(key_col).alias("k"),
        F.explode(_file_hashes(F.col(key_col), m, k)).alias("bit"),
    ).distinct()
    need = key_bits.groupBy("k").agg(F.count("*").alias("need"))
    got = (
        blooms.join(F.broadcast(key_bits), "bit")
        .groupBy("k", "file_id")
        .agg(F.count("*").alias("got"))
    )
    return (
        got.join(F.broadcast(need), "k")
        .filter(F.col("got") == F.col("need"))
        .select("k", "file_id")
    )


def file_blooms_duck(pages_sql: str, key_expr: str = "url",
                     file_expr: str = "file_id", m: int = FILE_BLOOM_M,
                     k: int = BLOOM_K) -> str:
    """DuckDB fragment replaying file_blooms bit-for-bit."""
    arms = " UNION ALL ".join(
        f"SELECT {file_expr} AS file_id, "
        f"{phash_duck(key_expr, FILE_BLOOM_SEED + i)} % {m} AS bit "
        f"FROM ({pages_sql})"
        for i in range(k)
    )
    return f"SELECT DISTINCT file_id, bit FROM ({arms})"


def key_bits_duck(keys_sql: str, key_expr: str = "k",
                  m: int = FILE_BLOOM_M, k: int = BLOOM_K) -> str:
    """DuckDB fragment replaying the lookup side's distinct bit set."""
    arms = " UNION ALL ".join(
        f"SELECT {key_expr} AS k, "
        f"{phash_duck(key_expr, FILE_BLOOM_SEED + i)} % {m} AS bit "
        f"FROM ({keys_sql})"
        for i in range(k)
    )
    return f"SELECT DISTINCT k, bit FROM ({arms})"
