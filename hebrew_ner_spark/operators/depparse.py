"""Non-projective dependency decode: maximum spanning arborescence via
Chu-Liu/Edmonds (McDonald et al. EMNLP 2005 — MST parsing), batched
per clause in one ``mapInPandas`` pass.

Reference parity: the reference's pipeline leans on YAP's
morpho-syntactic analysis (the lattice operators port its morphology
side); the dependency-PARSE side of that family is the MST decoder —
given arc scores, the best parse tree is the maximum spanning
arborescence rooted at ROOT. Our relation extraction currently reads
adjacency patterns (kg_triples_deppat); this operator is the upgrade
slot: swap pattern adjacency for decoded head attachments and the
extraction becomes parse-driven. As with the CRF stack, the sandbox has
no trained parser, so arc scores are deterministic (portable-hash
scored), and the DECODER is the real, fully-verified artifact.

Exactness contract: raw arc scores get a bitmask perturbation —
``score' = raw << (n+1)^2 | 1 << (h*(n+1)+d)`` — so every arc SET has
a distinct total (the mask bits are a set fingerprint; raw parts
differing by 1 already dominate any mask difference). The argmax tree
is therefore UNIQUE: no tie order to pin, and the gate can compare
head vectors directly against a DuckDB exhaustive tree enumeration
(every head function, cycles excluded) at the gated clause length.
pytest brute-forces the decoder to n = 5 on top.

Scale shape: clauses are independent — the decode is one mapInPandas
over (doc, clause, toks) rows, zero shuffles (the CRF-decode
discipline); arc scoring for the gate table is a codegen explode. CLE
is O(n^2) per clause after the O(n^2) score table; n is clause length
(constant), never corpus-sized.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_py, phash_sql_expr

CLAUSE_N = 3        # gated clause length (oracle enumerates 3^3 head maps)
ARC_SEED = 29
SCORE_MOD = 1_000_000
ROOT_TOK = "ROOT"


def _pert_bits(n: int) -> int:
    return (n + 1) * (n + 1)


def arc_raw(htok: str, dtok: str, h: int, d: int) -> int:
    """Deterministic raw arc score — the trained-model stand-in."""
    return phash_py(f"{htok}|{dtok}|{h}|{d}", ARC_SEED) % SCORE_MOD


def arc_score(htok: str, dtok: str, h: int, d: int, n: int) -> int:
    """Perturbed arc score (unique-argmax contract above)."""
    return (arc_raw(htok, dtok, h, d) << _pert_bits(n)) | (
        1 << (h * (n + 1) + d)
    )


def cle_heads(scores: dict[tuple[int, int], int], n: int) -> list[int]:
    """Chu-Liu/Edmonds maximum spanning arborescence rooted at 0 over
    nodes 1..n; ``scores[(h, d)]`` for h in 0..n, d in 1..n, h != d.
    Returns heads[d-1] for d = 1..n. Pure integer arithmetic.

    Recursive contraction: pick each node's best incoming arc; if the
    picks are acyclic they are the answer; otherwise contract one cycle
    into a super-node whose incoming arcs are re-priced by what they
    save over the cycle's own arc into the entry point, solve the
    contracted instance, and expand (the cycle arc into the chosen
    entry point is dropped).
    """

    def solve(nodes: list[int], sc: dict[tuple[int, int], int]) -> dict[int, int]:
        best = {}
        for d in nodes:
            cands = [(s, h) for (h, dd), s in sc.items() if dd == d]
            s, h = max(cands)
            best[d] = h
        # cycle detection over the best-pick function graph
        cyc = None
        for start in nodes:
            seen, v = [], start
            while v in best and v not in seen:
                seen.append(v)
                v = best[v]
            if v in seen:  # v closes a cycle
                cyc = seen[seen.index(v):]
                break
        if cyc is None:
            return best
        cset = set(cyc)
        cyc_arc_into = {d: sc[(best[d], d)] for d in cyc}
        cnode = max(nodes) + 1  # fresh super-node id
        new_nodes = [x for x in nodes if x not in cset] + [cnode]
        new_sc: dict[tuple[int, int], int] = {}
        # remember which original arc each contracted arc stands for
        into_c: dict[int, tuple[int, int]] = {}
        out_of_c: dict[int, tuple[int, int]] = {}
        for (h, d), s in sc.items():
            if h in cset and d in cset:
                continue
            if d in cset:  # arc entering the cycle: re-price
                gain = s - cyc_arc_into[d]
                key = (h, cnode)
                if key not in new_sc or gain > new_sc[key]:
                    new_sc[key] = gain
                    into_c[h] = (h, d)
            elif h in cset:  # arc leaving the cycle
                key = (cnode, d)
                if key not in new_sc or s > new_sc[key]:
                    new_sc[key] = s
                    out_of_c[d] = (h, d)
            else:
                new_sc[(h, d)] = s
        sub = solve(new_nodes, new_sc)
        heads = {d: h for d, h in sub.items() if d != cnode and h != cnode}
        for d, h in sub.items():
            if h == cnode:  # arc out of the super-node
                heads[d] = out_of_c[d][0]
        # arc into the super-node: breaks the cycle at its entry point
        eh, ed = into_c[sub[cnode]]
        heads[ed] = eh
        for d in cyc:
            if d != ed:
                heads[d] = best[d]
        return heads

    all_nodes = list(range(1, n + 1))
    heads = solve(all_nodes, dict(scores))
    return [heads[d] for d in range(1, n + 1)]


def clause_tokens(docs: DataFrame, n: int = CLAUSE_N) -> DataFrame:
    """(doc_id, clause_id, toks) — consecutive n-token windows of each
    document (the deterministic 'sentence' grain the gate parses; the
    operator itself takes any (doc_id, clause_id, toks) table)."""
    return docs.select(
        "doc_id", F.split("text", " ").alias("_t")
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(_t) < {n} THEN array() "
                f"ELSE transform(sequence(0, size(_t) DIV {n} - 1), "
                f"c -> slice(_t, c * {n} + 1, {n})) END"
            )
        ).alias("clause_id", "toks"),
    ).select("doc_id", F.col("clause_id").cast("long").alias("clause_id"), "toks")


def arc_scores(clauses: DataFrame, n: int = CLAUSE_N) -> DataFrame:
    """(doc_id, clause_id, h, d, score) — the full perturbed arc table,
    generated JVM-side (one codegen explode, the hash stays portable)."""
    pb = _pert_bits(n)
    structs = []
    for d in range(1, n + 1):
        for h in range(0, n + 1):
            if h == d:
                continue
            htok_sql = "'ROOT'" if h == 0 else f"toks[{h - 1}]"
            key = f"concat({htok_sql}, '|', toks[{d - 1}], '|', '{h}', '|', '{d}')"
            raw = phash_sql_expr(key, ARC_SEED)
            structs.append(
                f"named_struct('h', CAST({h} AS BIGINT), 'd', CAST({d} AS BIGINT),"
                f" 'score', CAST({raw} % {SCORE_MOD} AS BIGINT)"
                f" * {1 << pb} + {1 << (h * (n + 1) + d)})"
            )
    arc_structs = ", ".join(structs)
    return clauses.select(
        "doc_id",
        "clause_id",
        F.explode(F.expr(f"array({arc_structs})")).alias("a"),
    ).select("doc_id", "clause_id", "a.h", "a.d", "a.score")


def mst_parse(clauses: DataFrame, n: int = CLAUSE_N) -> DataFrame:
    """(doc_id, clause_id, d, head, total) — the decoded arborescence
    per clause plus its (unique) total score. One mapInPandas, zero
    shuffles; scores recomputed in-kernel from the same portable hash
    the ``arc_scores`` gate pins JVM-side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, cl_ids, ds, hs, tots = [], [], [], [], []
            for doc_id, cl, tlist in zip(
                pdf["doc_id"], pdf["clause_id"], pdf["toks"]
            ):
                toks = list(tlist)
                sc = {}
                for d in range(1, n + 1):
                    for h in range(0, n + 1):
                        if h == d:
                            continue
                        htok = ROOT_TOK if h == 0 else toks[h - 1]
                        sc[(h, d)] = arc_score(htok, toks[d - 1], h, d, n)
                heads = cle_heads(sc, n)
                total = sum(sc[(heads[d - 1], d)] for d in range(1, n + 1))
                for d in range(1, n + 1):
                    doc_ids.append(doc_id)
                    cl_ids.append(cl)
                    ds.append(d)
                    hs.append(heads[d - 1])
                    tots.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "clause_id": pd.Series(cl_ids, dtype="int64"),
                    "d": pd.Series(ds, dtype="int64"),
                    "head": pd.Series(hs, dtype="int64"),
                    "total": pd.Series(tots, dtype="int64"),
                }
            )

    return clauses.mapInPandas(
        run, "doc_id long, clause_id long, d long, head long, total long"
    )
