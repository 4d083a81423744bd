"""Deduplication queries + DuckDB oracles.

Every signature bit is reproduced by the oracle via the portable 60-bit
md5 hash (functions/hashing.py), so the gate verifies MinHash, LSH
banding, Jaccard verification and SimHash exactly — not just row counts.
"""

from __future__ import annotations

from hebrew_ner_spark.functions.hashing import phash_duck, shingles_duck
from hebrew_ner_spark.operators import dedup
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

K = dedup.SHINGLE_K
H = dedup.NUM_HASHES
ROWS = H // dedup.LSH_BANDS

_PHASH_SEEDED = (
    "CAST(concat('0x', substr(md5(shingle || ':' || CAST(seed AS VARCHAR)), 1, 15)) AS BIGINT)"
)

_SH_CTE = f"""
sh AS (
  SELECT doc_id, unnest({shingles_duck('toks', K)}) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)
"""

_SIG_CTE = f"""
{_SH_CTE},
seeds AS (SELECT unnest(range(0, {H})) AS seed),
sig AS (
  SELECT doc_id, seed, min({_PHASH_SEEDED}) AS mh
  FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
)
"""

_BANDS_CTE = f"""
{_SIG_CTE},
bands AS (
  SELECT doc_id, CAST(seed // {ROWS} AS BIGINT) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY seed)) AS band_key
  FROM sig GROUP BY doc_id, seed // {ROWS}
)
"""

_PAIRS_SQL = """
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
FROM bands l JOIN bands r
  ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
"""

_SIMHASH_CTE = f"""
tokh AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(t.token || ':0'), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM tokh CROSS JOIN (SELECT unnest(range(0, {dedup.SIMHASH_BITS})) AS j)
  GROUP BY doc_id, j
),
sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
)
def dedup_exact(spark, sf_dir):
    return dedup.exact_dup_groups(_docs(spark, sf_dir))


@query(
    "dedup_minhash_sig",
    oracle=f"WITH {_SIG_CTE} SELECT doc_id, seed, mh AS minhash FROM sig",
)
def dedup_minhash_sig(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir))


@query("dedup_lsh_pairs", oracle=f"WITH {_BANDS_CTE} {_PAIRS_SQL}")
def dedup_lsh_pairs(spark, sf_dir):
    return dedup.lsh_candidate_pairs(_docs(spark, sf_dir))


@query(
    "dedup_near_jaccard",
    oracle=f"""
    WITH {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, count(*) AS n_inter
      FROM pairs p
      JOIN sh a ON a.doc_id = p.doc_a
      JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(round(n_inter * 1000000.0 / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) AS jaccard_1e6
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(round(n_inter * 1000000.0 / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) >= 500000
    """,
)
def dedup_near_jaccard(spark, sf_dir):
    return dedup.near_dup_jaccard(_docs(spark, sf_dir))


@query("dedup_simhash", oracle=f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM sim")
def dedup_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir))


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH {_SIMHASH_CTE},
    blocks AS (
      SELECT doc_id, simhash, b AS band, (simhash >> (b * 15)) & 32767 AS bval
      FROM sim CROSS JOIN (SELECT unnest(range(0, {dedup.SIMHASH_BANDS})) AS b)
    )
    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
           CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
    FROM blocks l JOIN blocks r
      ON l.band = r.band AND l.bval = r.bval AND l.doc_id < r.doc_id
    WHERE bit_count(xor(l.simhash, r.simhash)) <= {dedup.HAMMING_MAX}
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    return dedup.simhash_near_pairs(_docs(spark, sf_dir))
