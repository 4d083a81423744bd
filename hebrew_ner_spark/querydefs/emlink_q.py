"""Gates for unsupervised Fellegi-Sunter EM (operators/emlink.py),
over the SAME planted corpus as the closed-form erscore gates — so the
two estimators are directly comparable: gold groups agree on fp/lb
always and on lang only within the unflipped copies, and EM must
discover that structure from the unlabeled pattern histogram. The
oracle replays the LSH-candidate chain, the 8-row histogram, and all
12 integer EM rounds. CTE names em-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import dedup, emlink
from hebrew_ner_spark.querydefs.dedup_q import _bands_cte
from hebrew_ner_spark.querydefs.erscore_q import _ER_DOCS, _ER_FIELDS, _er_docs
from hebrew_ner_spark.registry import query

_R = emlink.EM_ROUNDS
_F = emlink.EM_FIELDS

_EM_PATTERNS = f"""
emc AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l
  JOIN (SELECT band, band_key FROM bands
        GROUP BY band, band_key
        HAVING count(DISTINCT doc_id) <= {dedup.MAX_BUCKET}) ok
    ON ok.band = l.band AND ok.band_key = l.band_key
  JOIN bands r
    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
emp AS (
  SELECT CAST(a.fp = b.fp AS BIGINT) AS a_fp,
         CAST(a.lang = b.lang AS BIGINT) AS a_lang,
         CAST(a.lb = b.lb AS BIGINT) AS a_lb,
         CAST(count(*) AS BIGINT) AS n
  FROM emc c
  JOIN erf a ON a.doc_id = c.doc_a
  JOIN erf b ON b.doc_id = c.doc_b
  GROUP BY 1, 2, 3
)
"""

_PCOLS = ["lam"] + [c for f in _F for c in (f"m_{f}", f"u_{f}")]


def _em_ctes() -> str:
    init_cols = ", ".join(
        f"CAST({v} AS BIGINT) AS {c}"
        for c, v in zip(
            _PCOLS,
            [emlink.EM_INIT_LAM]
            + [v for _ in _F for v in (emlink.EM_INIT_M, emlink.EM_INIT_U)],
        )
    )
    parts = [f"empar0 AS (SELECT {init_cols})"]
    prod_m = " * ".join(
        f"(CASE WHEN p.a_{f} = 1 THEN par.m_{f} ELSE 1000 - par.m_{f} END)"
        for f in _F
    )
    prod_u = " * ".join(
        f"(CASE WHEN p.a_{f} = 1 THEN par.u_{f} ELSE 1000 - par.u_{f} END)"
        for f in _F
    )
    clamp = "CAST(least(greatest({x}, 1), 999) AS BIGINT)"
    for t in range(_R):
        parts.append(
            f"""emg{t} AS MATERIALIZED (
  SELECT p.*, par.lam * {prod_m} AS wm, (1000 - par.lam) * {prod_u} AS wu
  FROM emp p CROSS JOIN empar{t} par
),
emgg{t} AS (SELECT *, wm * 1000 // (wm + wu) AS gamma FROM emg{t}),
empar{t + 1} AS MATERIALIZED (
  SELECT {clamp.format(x='sum(n * gamma) // sum(n)')} AS lam,
"""
            + ",\n".join(
                f"         {clamp.format(x=f'sum(n * gamma * a_{f}) * 1000 // sum(n * gamma)')} AS m_{f},\n"
                f"         {clamp.format(x=f'sum(n * (1000 - gamma) * a_{f}) * 1000 // sum(n * (1000 - gamma))')} AS u_{f}"
                for f in _F
            )
            + f"\n  FROM emgg{t}\n)"
        )
    return ",\n".join(parts)


_TRAJ_SQL = "\nUNION ALL\n".join(
    f"SELECT CAST({t} AS BIGINT) AS round, {', '.join(_PCOLS)} FROM empar{t + 1}"
    for t in range(_R)
)


@query(
    "er_em_trajectory",
    oracle=f"""
    WITH {_ER_DOCS}, {_ER_FIELDS}, {_bands_cte('docs2')},
    {_EM_PATTERNS},
    {_em_ctes()}
    {_TRAJ_SQL}
    """,
)
def er_em_trajectory(spark, sf_dir):
    """All 12 integer EM rounds of the Winkler latent-class fit —
    the deterministic schedule is the gated value
    (operators/emlink.py em_trajectory)."""
    return emlink.em_trajectory(_er_docs(spark, sf_dir))


@query(
    "er_em_posteriors",
    oracle=f"""
    WITH {_ER_DOCS}, {_ER_FIELDS}, {_bands_cte('docs2')},
    {_EM_PATTERNS},
    {_em_ctes()},
    emfin AS (
      SELECT p.a_fp, p.a_lang, p.a_lb, p.n,
             par.lam * {" * ".join(f"(CASE WHEN p.a_{f} = 1 THEN par.m_{f} ELSE 1000 - par.m_{f} END)" for f in _F)} AS wm,
             (1000 - par.lam) * {" * ".join(f"(CASE WHEN p.a_{f} = 1 THEN par.u_{f} ELSE 1000 - par.u_{f} END)" for f in _F)} AS wu
      FROM emp p CROSS JOIN empar{_R} par
    )
    SELECT a_fp, a_lang, a_lb, n,
           CAST(wm * 1000 // (wm + wu) AS BIGINT) AS gamma_1e3
    FROM emfin
    """,
)
def er_em_posteriors(spark, sf_dir):
    """Per-pattern match posterior under the final fitted parameters —
    the decision table a linker thresholds
    (operators/emlink.py em_posteriors)."""
    return emlink.em_posteriors(_er_docs(spark, sf_dir))
