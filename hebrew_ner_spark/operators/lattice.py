"""Morphological-lattice operators: build, DFS path enumeration, pruning.

The reference models each token's morphological analyses as a small DAG
(lattice) and prunes it with NER splitting evidence (G1-G3,
utils/yap_graph.py:23-105). Spark disposition (SURVEY.md §2.7): the
sub-lattices are tiny (<= ~30 vertices), so the correct idiom is a
sorted ``mapInPandas`` scanning (doc, token) group boundaries inside
each Arrow batch and running the single-node DFS per group — a
distributed graph framework would be pure overhead here, and per-group
pandas frames (applyInPandas) cost ~1 ms of overhead per document.

Design notes for 100 TB:
* the lattice edge table is generated array-side (constant-folded CASE per
  token — the in-process stand-in for the reference's HTTP YAP analyzer
  S14-S16, which cannot be a per-row HTTP call at scale);
* the positional zip of lattice groups with splitting rows
  (yap_graph.py:89) is made an explicit equi-join on (doc_id, word_index)
  — the survey's deliberate semantics-preserving fix (J4);
* pruning emits surviving edges directly from each group — the global
  tuple-membership filter (P2, `isin`) collapses into the same pass; a
  standalone left-semi-join variant is provided for the P2 parity check.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg
from hebrew_ner_spark.resources import MORPH_SPLITS

EDGE_SCHEMA = (
    "doc_id long, word_index long, edge_order long, from_v long, to_v long, form string"
)


class Lattice:
    """Adjacency-list DAG with the reference's exact DFS semantics.

    Behaviour-equivalent to YapGraph (utils/yap_graph.py:16-83): parallel
    edges dedup on insert, insertion order preserved; ``all_paths`` is the
    iterative DFS with a depth ``limit`` where, at the limit, the
    remaining adjacency iterator is consumed to test target reachability
    (the `end in peek` branch) — quirk preserved.
    """

    def __init__(self) -> None:
        self._adj: Dict[int, List[int]] = {}

    @classmethod
    def from_edges(cls, pairs) -> "Lattice":
        g = cls()
        for f, t in pairs:
            g._adj.setdefault(f, [])
            g._adj.setdefault(t, [])
            if t not in g._adj[f]:
                g._adj[f].append(t)
        return g

    def adj(self, node: int) -> Iterator[int]:
        return iter(self._adj.get(node, []))

    def all_paths(self, start: int, end: int, limit: float = math.inf):
        path = [start]
        stack = [self.adj(start)]
        while stack:
            peek = stack[-1]
            w = next(peek, None)
            if w is None:
                stack.pop()
                path.pop()
            elif len(path) < limit:
                if w == end:
                    yield path + [end]
                elif w not in path:
                    path.append(w)
                    stack.append(self.adj(w))
            else:
                if w == end or end in peek:
                    yield path + [end]
                stack.pop()
                path.pop()


def prune_edge_group(edges: List[tuple], split: int, fallback: bool) -> set:
    """Prune one token's lattice: keep edges on paths of length split+1.

    ``edges`` is [(from_v, to_v)] in lattice order. Mirrors prune_lattices
    (yap_graph.py:86-105): source = first row's FROM, target = last row's
    TO, exact-length paths preferred, ±1 fallback optional, keep-all when
    nothing survives.
    """
    g = Lattice.from_edges(edges)
    source, target = edges[0][0], edges[-1][1]
    path_len = split + 1
    paths = list(g.all_paths(source, target, limit=path_len))
    pruned = [p for p in paths if len(p) == path_len]
    if fallback and not pruned:
        pruned = [p for p in paths if abs(len(p) - path_len) <= 1]
    if pruned:
        paths = pruned
    valid = set()
    for p in paths:
        valid.update(zip(p[:-1], p[1:]))
    return valid


def _lattice_case_expr() -> str:
    """CASE expr: token -> array<struct<edge_order,from_v,to_v,form>>.

    Split tokens get an ambiguous 2-path lattice (morpheme chain 0->1->2
    plus the whole-token shortcut 0->2); others a single edge 0->1.
    """
    whens = []
    for tok, morphs in MORPH_SPLITS.items():
        k = len(morphs)
        structs = [
            f"named_struct('edge_order', {i}L, 'from_v', {i}L, 'to_v', {i + 1}L, 'form', '{m}')"
            for i, m in enumerate(morphs)
        ]
        structs.append(
            f"named_struct('edge_order', {k}L, 'from_v', 0L, 'to_v', {k}L, 'form', '{tok}')"
        )
        whens.append(f"WHEN '{tok}' THEN array({', '.join(structs)})")
    return (
        "CASE token "
        + " ".join(whens)
        + " ELSE array(named_struct('edge_order', 0L, 'from_v', 0L, 'to_v', 1L, 'form', token)) END"
    )


def build_lattice(docs: DataFrame) -> DataFrame:
    """(doc_id, word_index, edge_order, from_v, to_v, form) — MA lattice
    edge table (LATTICE_COLUMNS analog, utils/yap.py:11-22)."""
    toks = kg.doc_tokens(docs)
    return toks.select(
        "doc_id",
        "word_index",
        F.explode(F.expr(_lattice_case_expr())).alias("e"),
    ).select("doc_id", "word_index", "e.edge_order", "e.from_v", "e.to_v", "e.form")


def _carry_groups(process):
    """Wrap a batch kernel so (doc_id, word_index) groups split across
    Arrow batch boundaries are processed whole: the trailing group of
    each batch is carried into the next. Shared by ``prune_lattice`` and
    ``prune_merge_labels``."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_doc = pdf["doc_id"].iloc[-1]
            last_wi = pdf["word_index"].iloc[-1]
            tail = (pdf["doc_id"] == last_doc) & (pdf["word_index"] == last_wi)
            carry = pdf.loc[tail]
            head = pdf.loc[~tail]
            if len(head):
                yield process(head)
        if carry is not None and len(carry):
            yield process(carry)

    return _run


def prune_lattice(
    lattice: DataFrame, splitting: DataFrame, fallback: bool = True
) -> DataFrame:
    """G3 distributed: join splitting evidence, DFS-prune per token group.

    ``splitting`` is (doc_id, word_index, splitting) — the explicit join
    replacing the reference's positional zip. Output keeps the lattice
    schema; the P2 semi-join is implicit (surviving rows emitted in-place).
    """
    # splitting is CORPUS-grain (one row per token), so the join must
    # never gamble on a broadcast from size estimates: the replicated
    # bench corpus compresses ~100x (dictionary-encoded repeated text),
    # Catalyst sizes the scan from file bytes, and the generate between
    # scan and join hides the row blow-up — at a 1M-doc corpus the
    # planner chose broadcast and the driver OOM'd building it. The
    # merge hint pins SMJ/shuffle-hash (the bpe_encode tail-join
    # discipline); AQE still coalesces the shuffle when small.
    joined = lattice.join(
        splitting.hint("merge"), ["doc_id", "word_index"], "inner"
    )

    # (A JVM bypass for single-edge lattices was tried and reverted: the
    # union of a trivial branch and a pruned branch makes Catalyst build
    # the lattice twice — measured net 1.7x SLOWER than paying the Arrow
    # transfer for the whole table. The memo below keeps the Python cost
    # of unambiguous tokens near zero instead.)

    # Processing is at ARROW-BATCH grain, not per-document pandas groups:
    # groupBy(doc).applyInPandas builds one pandas frame per document —
    # ~1 ms of per-group overhead x 10^12 docs is the real scale killer
    # (measured: ~5 s of pure group overhead at 5k docs). Instead the
    # edge table is hash-partitioned by doc and sorted, and mapInPandas
    # scans (doc, word) boundaries inside each ~2k-row Arrow batch,
    # carrying a possibly-split trailing group into the next batch.
    # The DFS result is memoized per (edge-shape, splitting) as the
    # group's whole keep-pattern: real corpora have heavy-tailed but
    # highly repetitive lattice shapes, so the cache hit rate is near 1.
    memo: dict = {}
    cols = ["doc_id", "word_index", "edge_order", "from_v", "to_v", "form"]

    def _process(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        doc = pdf["doc_id"].to_numpy()
        wi = pdf["word_index"].to_numpy()
        fv = pdf["from_v"].to_numpy()
        tv = pdf["to_v"].to_numpy()
        sp = pdf["splitting"].to_numpy()
        n = len(pdf)
        bounds = np.flatnonzero(
            np.concatenate(
                ([True], (doc[1:] != doc[:-1]) | (wi[1:] != wi[:-1]), [True])
            )
        )
        keep = np.zeros(n, dtype=bool)
        # memo key is the raw bytes of the group's (from, to) arrays —
        # zero per-edge Python on the hit path (the old tuple(zip(...))
        # key built ~|edges| Python objects per GROUP, which at 10^8
        # token groups was the kernel's dominant cost; measured ~2x on
        # the 1M-doc hybrid chain). Exact, not a hash: distinct shapes
        # have distinct bytes.
        for s, e in zip(bounds[:-1], bounds[1:]):
            key = (fv[s:e].tobytes(), tv[s:e].tobytes(), int(sp[s]))
            pattern = memo.get(key)
            if pattern is None:
                edges = list(zip(fv[s:e].tolist(), tv[s:e].tolist()))
                valid = prune_edge_group(edges, int(sp[s]), fallback)
                pattern = np.fromiter((pair in valid for pair in edges), dtype=bool)
                memo[key] = pattern
            keep[s:e] = pattern
        return pdf.loc[keep, cols]

    # No repartition: the hinted SMJ output already co-locates every
    # (doc_id, word_index) group (its partitioning carries the join
    # keys), so a second full shuffle of the edge table bought nothing —
    # only the within-partition sort is needed for group contiguity.
    part = joined.sortWithinPartitions("doc_id", "word_index", "edge_order")
    return part.mapInPandas(_carry_groups(_process), EDGE_SCHEMA)


MERGED_SCHEMA = "doc_id long, word_index long, multi_label string"


def prune_merge_labels(edge_rows: DataFrame, fallback: bool = True) -> DataFrame:
    """Fused G1-G3 DFS prune + J2/A4 label merge for the hybrid lifecycle.

    ``edge_rows`` is EDGE-grain (doc_id, word_index, edge_order, from_v,
    to_v, mlabel, splitting) with each (doc_id, word_index) group
    contiguous and in edge_order within its partition — document order
    out of ``posexplode`` qualifies, so NO shuffle or sort is required
    upstream. Output is TOKEN-grain (doc_id, word_index, multi_label):
    each token's lattice is DFS-pruned (``prune_edge_group``, the
    reference's semantics at yap_graph.py:86-105) and the mlabels of the
    surviving labelled edges are '^'-joined in edge order — exactly the
    md⋈mlabels inner join + ordered concat aggregate (ner.py:145-160),
    minus their two shuffles. Tokens whose surviving edges carry no
    mlabel emit nothing (the inner-join-drops-all case).

    This kernel is why the 1M-doc hybrid chain went from 6 shuffled
    stages to a single zero-exchange pass; the keep-pattern memo and the
    single-edge fast path keep per-group Python near zero.
    """
    memo: dict = {}

    def _process(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        doc = pdf["doc_id"].to_numpy()
        wi = pdf["word_index"].to_numpy()
        fv = pdf["from_v"].to_numpy()
        tv = pdf["to_v"].to_numpy()
        sp = pdf["splitting"].to_numpy()
        lab = pdf["mlabel"].to_numpy(dtype=object)
        bounds = np.flatnonzero(
            np.concatenate(
                ([True], (doc[1:] != doc[:-1]) | (wi[1:] != wi[:-1]), [True])
            )
        )
        starts, ends = bounds[:-1], bounds[1:]
        sizes = ends - starts
        single = sizes == 1

        # fast path (vectorized): a 1-edge lattice always keeps its edge
        # (exact-length when splitting == 1, keep-all fallback otherwise)
        s_idx = starts[single]
        s_idx = s_idx[pd.notna(lab[s_idx])]
        out = [
            pd.DataFrame(
                {
                    "doc_id": doc[s_idx],
                    "word_index": wi[s_idx],
                    "multi_label": lab[s_idx],
                }
            )
        ]

        o_doc: list = []
        o_wi: list = []
        o_ml: list = []
        for s, e in zip(starts[~single], ends[~single]):
            key = (fv[s:e].tobytes(), tv[s:e].tobytes(), int(sp[s]))
            pattern = memo.get(key)
            if pattern is None:
                edges = list(zip(fv[s:e].tolist(), tv[s:e].tolist()))
                valid = prune_edge_group(edges, int(sp[s]), fallback)
                pattern = np.fromiter((pair in valid for pair in edges), dtype=bool)
                memo[key] = pattern
            kept = lab[s:e][pattern]
            kept = kept[pd.notna(kept)]
            if len(kept):
                o_doc.append(doc[s])
                o_wi.append(wi[s])
                o_ml.append("^".join(kept))
        if o_ml:
            out.append(
                pd.DataFrame(
                    {"doc_id": o_doc, "word_index": o_wi, "multi_label": o_ml}
                )
            )
        return pd.concat(out, ignore_index=True) if len(out) > 1 else out[0]

    return edge_rows.mapInPandas(_carry_groups(_process), MERGED_SCHEMA)


def filter_lattice_by_edges(lattice: DataFrame, valid_edges: DataFrame) -> DataFrame:
    """P2: tuple-membership filter as an explicit left-semi join
    (yap_graph.py:104-105's `.apply(tuple).isin(set)` made distributable)."""
    return lattice.join(
        valid_edges, ["doc_id", "word_index", "from_v", "to_v"], "left_semi"
    )


def md_from_pruned(pruned: DataFrame) -> DataFrame:
    """Disambiguated lattice (MD): the unique surviving path per token,
    re-indexed by morpheme position (md_to_origins_df analog,
    utils/yap.py:172-202 — the 1-based -> 0-based origin shift is where
    our edge_order already lives)."""
    return pruned.select(
        "doc_id",
        "word_index",
        F.col("edge_order").alias("morph_index"),
        F.col("form").alias("morpheme"),
    )
