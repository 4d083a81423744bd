"""Text-analysis queries + DuckDB oracles (lang-id, quality, zipf,
fingerprints, reference normalizers P5-P9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_duck, shingles_duck
from hebrew_ner_spark.operators import textstats
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in textstats.STOPWORDS) + "]"

_TOKS = "SELECT doc_id, n_chars, text, string_split(text, ' ') AS toks FROM documents"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "txt_doc_stats",
    oracle=f"""
    WITH t AS ({_TOKS})
    SELECT doc_id, n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
           CAST((2 * (list_sum(list_transform(toks, t -> length(t)))) * 1000000 + (len(toks))) // (2 * (len(toks))) AS BIGINT)
             AS mean_tok_len_1e6,
           CAST((2 * (len(list_filter(toks, t -> list_contains({_STOP_SQL}, t)))) * 1000000 + (len(toks))) // (2 * (len(toks))) AS BIGINT)
             AS stopword_ratio_1e6,
           CAST((2 * (length(regexp_replace(text, '[a-zA-Z0-9א-ת ]', '', 'g'))) * 1000000 + (length(text))) // (2 * (length(text))) AS BIGINT)
             AS punct_ratio_1e6
    FROM t
    """,
)
def txt_doc_stats(spark, sf_dir):
    return textstats.doc_stats(_docs(spark, sf_dir))


@query(
    "txt_subword_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text,
                ' ?\p{L}+| ?\p{N}+| ?[^\t\n\x0b\f\r \p{L}\p{N}]+')) AS BIGINT)
             AS n_subword_tokens
    FROM documents
    """,
)
def txt_subword_counts(spark, sf_dir):
    """Whitespace + BPE-style-pretokenizer token budgets per document;
    the regex alternation is chosen so Java (leftmost-first) and RE2
    (leftmost-longest) scan identically — see textstats.BPE_REGEX."""
    return textstats.subword_counts(_docs(spark, sf_dir))


@query(
    "txt_lang_id",
    oracle="""
    SELECT doc_id, lang AS declared_lang,
           CASE WHEN length(regexp_replace(text, '[^א-ת]', '', 'g'))
                   > length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) THEN 'he'
                WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) > 0 THEN 'en'
                ELSE 'und' END AS detected_lang
    FROM documents
    """,
)
def txt_lang_id(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


@query(
    "txt_token_freq",
    oracle=f"""
    WITH t AS ({_TOKS}),
    u AS (SELECT unnest(toks) AS token FROM t)
    SELECT token, count(*) AS n FROM u GROUP BY token
    """,
)
def txt_token_freq(spark, sf_dir):
    return textstats.token_freq(_docs(spark, sf_dir))


@query(
    "txt_fingerprint",
    oracle=f"""
    WITH t AS ({_TOKS}),
    s AS (SELECT doc_id, text, {shingles_duck('toks', textstats.FINGERPRINT_K)} AS sh FROM t)
    SELECT doc_id,
           CASE WHEN len(sh) = 0 THEN {phash_duck('text', 0)}
                ELSE list_min(list_transform(sh, s -> {phash_duck('s', 0)})) END AS fingerprint
    FROM s
    """,
)
def txt_fingerprint(spark, sf_dir):
    return textstats.doc_fingerprints(_docs(spark, sf_dir))


@query(
    "txt_normalize",
    oracle="""
    SELECT doc_id,
           regexp_replace(text, '[0-9]', '0', 'g') AS digits_norm,
           translate(text, 'ךםןףץ', 'כמנפצ') AS finals_norm,
           regexp_replace(text, 'י$', '') AS yud_stripped,
           regexp_replace('גנ"צ אמר "' || text || '"', '"', '״', 'g') AS gershayim_norm,
           regexp_replace(regexp_replace('גנ"צ אמר "' || text || '"', '"', '״', 'g'),
                          '״', '"', 'g') AS quotes_roundtrip
    FROM documents
    """,
)
def txt_normalize(spark, sf_dir):
    """Reference normalizers P5/P6/P8/P9 as one projection stage.

    The corpus text carries no quote characters, so the P9 columns are
    made non-vacuous by wrapping the text in a quoted frame (an acronym
    with an inner gershayim-position quote plus outer quotes) before the
    forward pass; the round-trip column gates the inverse
    (utils/hebrew.py:12-19) against the forward output.
    """
    d = _docs(spark, sf_dir)
    quoted = F.concat(F.lit('גנ"צ אמר "'), F.col("text"), F.lit('"'))
    return d.select(
        "doc_id",
        textstats.normalize_digits(F.col("text")).alias("digits_norm"),
        textstats.normalize_hebrew_finals(F.col("text")).alias("finals_norm"),
        textstats.strip_trailing_yud(F.col("text")).alias("yud_stripped"),
        textstats.quotes_to_gershayim(quoted).alias("gershayim_norm"),
        textstats.gershayim_to_quotes(
            textstats.quotes_to_gershayim(quoted)
        ).alias("quotes_roundtrip"),
    )


@query(
    "txt_quality_filter",
    oracle=f"""
    WITH t AS ({_TOKS}),
    s AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS n_stop,
             len(list_distinct(toks)) AS n_types
      FROM t
    )
    SELECT doc_id FROM s
    WHERE n_tokens BETWEEN 20 AND 200
      AND n_stop * 5 < n_tokens * 2   -- stop_ratio < 0.4, exact integers
      AND n_types * 4 > n_tokens      -- type_ratio > 0.25
    """,
)
def txt_quality_filter(spark, sf_dir):
    """The curation gate itself: documents that survive the quality
    thresholds (length window, stopword ceiling, type/token floor) —
    the filter a 10^12-doc training-data pipeline applies before
    anything expensive runs. Pure column predicates: Catalyst pushes
    the whole thing into one codegen'd scan-filter. The predicate is
    the shared textstats.quality_pass_expr (host-level curation in
    weblinks.host_quality composes the same one)."""
    from hebrew_ner_spark.operators.kg import with_tokens

    d = with_tokens(_docs(spark, sf_dir))
    return d.where(textstats.quality_pass_expr()).select("doc_id")


@query(
    "txt_trigram_score",
    oracle=f"""
    WITH tg AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(0, length(text) - 2), i -> text[i + 1:i + 3]))) AS g
      FROM documents WHERE length(text) >= 3
    ),
    nd AS (SELECT count(*) AS n FROM documents),
    common AS (
      SELECT g FROM tg, nd GROUP BY g, nd.n
      HAVING count(*) * {textstats.TRIGRAM_DF_DENOM} > nd.n
    ),
    j AS (
      SELECT t.doc_id, CASE WHEN c.g IS NULL THEN 0 ELSE 1 END AS hit
      FROM tg t LEFT JOIN common c ON c.g = t.g
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(hit) AS BIGINT) AS n_common,
           CAST((2 * sum(hit) * 1000000 + count(*)) // (2 * count(*)) AS BIGINT)
             AS common_ratio_1e6
    FROM j GROUP BY doc_id
    """,
)
def txt_trigram_score(spark, sf_dir):
    """Char-trigram commonness score (crude char-LM proxy): the share of
    each doc's distinct trigrams whose document frequency clears the
    scale-free corpus threshold — no global top-k sort anywhere."""
    return textstats.trigram_score(_docs(spark, sf_dir))


@query(
    "txt_surprisal",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
               FROM documents),
    f AS (SELECT token, count(*) AS n FROM t GROUP BY token),
    tot AS (SELECT sum(n) AS tt FROM f),
    dt AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY doc_id, token),
    j AS (SELECT dt.doc_id, dt.c,
                 CAST(length(bin(tot.tt)) - length(bin(f.n)) AS BIGINT) AS s
          FROM dt JOIN f USING (token), tot)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(c * s) AS BIGINT) AS surprisal_bits,
           CAST((2 * sum(c * s) * 1000000 + sum(c)) // (2 * sum(c)) AS BIGINT)
             AS mean_bits_1e6
    FROM j GROUP BY doc_id
    """,
)
def txt_surprisal(spark, sf_dir):
    """Integer unigram cross-entropy (CCNet-style LM-perplexity quality
    filter): per-doc mean bits via the bitlen gap, exact cross-engine."""
    return textstats.unigram_surprisal(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# BPE merge training (operators/bpe.py): the oracle replays the training
# loop with one CTE block per round — pair counts from a positional unnest,
# argmax with the pinned (cnt DESC, l, r) tie order, and the same
# wrapped-encoding replace() merge (left-to-right non-overlapping in both
# engines — the BPE greedy rule).

from hebrew_ner_spark.operators import bpe  # noqa: E402


def _bpe_ctes(rounds: int) -> str:
    parts = [
        "tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)",
        "w0 AS (SELECT regexp_replace(token, '(.)', ' \\1 ', 'g') AS s,"
        " CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"ax{r} AS (SELECT n, string_split(trim(s), '  ') AS a FROM w{p}"
            f" WHERE len(string_split(trim(s), '  ')) >= 2)"
        )
        parts.append(
            f"px{r} AS (SELECT n, a, generate_subscripts(a, 1) AS i,"
            f" unnest(a) AS l FROM ax{r})"
        )
        parts.append(
            f"p{r} AS (SELECT l, a[i + 1] AS r, CAST(sum(n) AS BIGINT) AS cnt"
            f" FROM px{r} WHERE i < len(a) GROUP BY 1, 2)"
        )
        parts.append(
            f"m{r} AS (SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1)"
        )
        parts.append(
            f"w{r} AS (SELECT replace(w{p}.s,"
            f" ' ' || m{r}.l || '  ' || m{r}.r || ' ',"
            f" ' ' || m{r}.l || m{r}.r || ' ') AS s, n FROM w{p}, m{r})"
        )
    return ",\n    ".join(parts)


_BPE_MERGES_SELECT = " UNION ALL ".join(
    f"SELECT CAST({r} AS BIGINT) AS round, l, r, cnt FROM m{r}"
    for r in range(1, bpe.BPE_ROUNDS + 1)
)


@query(
    "txt_bpe_merges",
    oracle=f"""
    WITH {_bpe_ctes(bpe.BPE_ROUNDS)}
    {_BPE_MERGES_SELECT}
    """,
)
def txt_bpe_merges(spark, sf_dir):
    """BPE tokenizer training: the learned merge table (one row per
    round), replayed bit-for-bit by the unrolled DuckDB training loop."""
    return bpe.bpe_merges(_docs(spark, sf_dir))


@query(
    "txt_bpe_vocab",
    oracle=f"""
    WITH {_bpe_ctes(bpe.BPE_ROUNDS)}
    SELECT replace(s, ' ', '') AS token, n,
           CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_symbols,
           list_aggregate(string_split(trim(s), '  '), 'string_agg', '|')
             AS segmented
    FROM w{bpe.BPE_ROUNDS}
    """,
)
def txt_bpe_vocab(spark, sf_dir):
    """Every vocabulary word segmented by the learned BPE merges — the
    subword split a downstream token counter consumes."""
    return bpe.bpe_vocab(_docs(spark, sf_dir))


@query(
    "txt_bpe_encode",
    oracle=f"""
    WITH {{ctes}},
    seg AS (SELECT replace(s, ' ', '') AS token,
                   string_split(trim(s), '  ') AS pieces
            FROM w{bpe.BPE_ROUNDS}),
    occ AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS word_index,
                   unnest(toks) AS token
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    enc AS (SELECT doc_id, word_index, pieces FROM occ JOIN seg USING (token))
    SELECT doc_id, CAST(word_index AS BIGINT) AS word_index,
           CAST(generate_subscripts(pieces, 1) - 1 AS BIGINT) AS piece_index,
           unnest(pieces) AS piece
    FROM enc
    """.format(ctes=_bpe_ctes(bpe.BPE_ROUNDS)),
)
def txt_bpe_encode(spark, sf_dir):
    """Corpus encoded with the trained merges: vocab-grain segmentation
    joined back onto token occurrences (operators/bpe.py bpe_encode)."""
    return bpe.bpe_encode(load_table(spark, sf_dir, "documents"))


@query(
    "txt_bigram_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pr AS (
      SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
      FROM t, unnest(range(1, len(toks))) AS u(i)),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM pr GROUP BY 1, 2),
    uni AS (SELECT unnest(toks) AS token FROM t),
    uf AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY token),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS _t FROM uni),
    dp AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
           FROM pr GROUP BY 1, 2, 3),
    pb AS (
      SELECT dp.doc_id, dp.c,
             CASE WHEN cb.cb IS NOT NULL
                  THEN length(bin(u1.n)) - length(bin(cb.cb))
                  ELSE {textstats.BACKOFF_BITS} + length(bin(_t)) - length(bin(u2.n))
             END AS s,
             CASE WHEN cb.cb IS NULL THEN dp.c ELSE 0 END AS bk
      FROM dp
      LEFT JOIN cb ON cb.w1 = dp.w1 AND cb.w2 = dp.w2
      JOIN uf u1 ON u1.token = dp.w1
      JOIN uf u2 ON u2.token = dp.w2
      CROSS JOIN tot),
    fb AS (
      SELECT t.doc_id, CAST(1 AS BIGINT) AS c,
             length(bin(_t)) - length(bin(uf.n)) AS s,
             CAST(0 AS BIGINT) AS bk
      FROM t JOIN uf ON uf.token = toks[1] CROSS JOIN tot
      WHERE len(toks) >= 1),
    ub AS (SELECT * FROM pb UNION ALL SELECT * FROM fb)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_scored,
           CAST(sum(bk) AS BIGINT) AS n_backoff,
           CAST(sum(c * s) AS BIGINT) AS bits,
           CAST((2 * sum(c * s) * 1000000 + sum(c)) // (2 * sum(c)) AS BIGINT)
             AS mean_bits_1e6
    FROM ub GROUP BY doc_id
    """,
)
def txt_bigram_score(spark, sf_dir):
    """Integer bigram LM score with Stupid Backoff — the context-aware
    perplexity-filter upgrade; backoff count doubles as an
    out-of-distribution word-order signal (operators/textstats.py
    bigram_score)."""
    return textstats.bigram_score(load_table(spark, sf_dir, "documents"))


_WINNOW_K = textstats.FINGERPRINT_K
_WINNOW_W = textstats.WINNOW_W

# TRUE winnowing oracle — a deliberately different formulation from the
# Spark array algebra: long-form positional gram hashes, then a struct-min
# window frame (CURRENT ROW .. W-1 FOLLOWING) per valid window start, then
# DISTINCT over the selected (pos, hash) pairs. Struct comparison orders
# (h, pos) — min hash, leftmost tie — exactly the Spark array_min rule.
_WINNOW_GRAMS = f"""
wg AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(toks) - {_WINNOW_K} + 1, 0)),
                i -> {{'pos': CAST(i AS BIGINT),
                       'h': {phash_duck(f"array_to_string(toks[i + 1:i + {_WINNOW_K}], ' ')", 0)}}})) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) wt
),
wwin AS (
  SELECT doc_id, g.pos AS pos,
         min({{'h': g.h, 'pos': g.pos}}) OVER
           (PARTITION BY doc_id ORDER BY g.pos
            ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS sel,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM wg
)
"""


@query(
    "txt_winnow",
    oracle=f"""
    WITH {_WINNOW_GRAMS}
    SELECT DISTINCT doc_id, sel.pos AS pos, sel.h AS fp
    FROM wwin
    WHERE pos <= greatest(ng - {_WINNOW_W}, 0)
    """,
)
def txt_winnow(spark, sf_dir):
    """The winnowing fingerprint SET (Schleimer et al. 2003): min-(hash,
    pos) per gram window, deduped — position-robust near-dup evidence
    with the shared-run guarantee (pytest-pinned on planted documents)."""
    return textstats.winnow_fingerprints(_docs(spark, sf_dir))


# --- Heaps-law vocabulary growth --------------------------------------------

_HK = textstats.HEAPS_K

_HFP = f"""
ht AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
hl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM ht),
ho AS (SELECT doc_id,
              CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS off
       FROM hl),
hsh AS (SELECT ht.doc_id, CAST(ix.i AS BIGINT) AS i,
               array_to_string(t[ix.i + 1:ix.i + {_HK}], ' ') AS sh
        FROM ht, LATERAL (SELECT unnest(range(greatest(len(t) - {_HK} + 1, 0))) AS i) ix),
hfp AS (SELECT sh, CAST(min(ho.off + hsh.i) AS BIGINT) AS first_pos
        FROM hsh JOIN ho ON hsh.doc_id = ho.doc_id
        GROUP BY sh)
"""


@query(
    "txt_shingle_first",
    oracle=f"WITH {_HFP} SELECT sh, first_pos FROM hfp",
)
def txt_shingle_first(spark, sf_dir):
    """First global position of every shingle type — the two-level
    offset cumsum must agree with the oracle's single global window."""
    return textstats.shingle_first_pos(_docs(spark, sf_dir))


@query(
    "txt_heaps_curve",
    oracle=f"""
    WITH {_HFP},
    hb AS (SELECT CAST(length(bin(first_pos + 1)) AS BIGINT) AS kbit,
                  count(*) AS new_types
           FROM hfp GROUP BY 1)
    SELECT kbit, CAST((1 << kbit) - 1 AS BIGINT) AS checkpoint, new_types,
           CAST(sum(new_types) OVER (ORDER BY kbit
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS vocab_size
    FROM hb
    """,
)
def txt_heaps_curve(spark, sf_dir):
    """Vocabulary growth at power-of-two token-prefix checkpoints (the
    Heaps-law curve corpus-scaling plans read)."""
    return textstats.heaps_curve(_docs(spark, sf_dir))


@query(
    "txt_vocab_richness",
    oracle="""
    WITH tk AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    tok AS (
      SELECT lang,
             toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]
               || ' ' || toks[CAST(i AS INT) + 2] AS token
      FROM tk, unnest(range(1, len(toks) - 1)) AS u(i)
    ),
    cnt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2),
    fof AS (
      SELECT lang,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM cnt GROUP BY lang
    )
    SELECT lang, n_tokens, n_types, f1, f2,
           CAST(CASE WHEN f2 > 0
                     THEN n_types + (2 * f1 * f1 + 2 * f2) // (4 * f2)
                     ELSE n_types + (f1 * (f1 - 1)) // 2 END AS BIGINT)
             AS chao1,
           (2 * f1 * 1000000 + n_tokens) // (2 * n_tokens) AS unseen_p_1e6
    FROM fof
    """,
)
def txt_vocab_richness(spark, sf_dir):
    """Chao1 + Good-Turing unseen-vocabulary mass per language
    (operators/textstats.vocab_richness)."""
    return textstats.vocab_richness(_docs(spark, sf_dir))


@query(
    "txt_zipf_buckets",
    oracle="""
    WITH tok AS (
      SELECT t.token FROM documents,
      LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
      WHERE t.token <> ''
    ),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
    rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rank FROM cnt),
    b AS (SELECT CAST(length(bin(rank)) AS BIGINT) AS rank_kbit, c,
                 CAST(length(bin(c)) AS BIGINT) AS fbits FROM rk)
    SELECT rank_kbit,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(min(c) AS BIGINT) AS min_freq,
           CAST(max(c) AS BIGINT) AS max_freq,
           CAST((2 * sum(fbits) * 1000000 + count(*)) // (2 * count(*))
                AS BIGINT) AS mean_freq_bits_1e6
    FROM b GROUP BY rank_kbit
    """,
)
def txt_zipf_buckets(spark, sf_dir):
    """Zipf rank-frequency audit in bitlen buckets (zero floats) —
    operators/textstats.zipf_buckets."""
    return textstats.zipf_buckets(_docs(spark, sf_dir))


_STOP_IN = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)


@query(
    "txt_rake_keyphrases",
    oracle=f"""
    WITH rk_t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
    ),
    rk_tok AS (
      SELECT doc_id, pos, token,
             CASE WHEN token IN ({_STOP_IN}) THEN 1 ELSE 0 END AS is_stop
      FROM rk_t WHERE token <> ''
    ),
    rk_seg AS (
      SELECT doc_id, pos, token, is_stop,
             sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
      FROM rk_tok
    ),
    rk_w AS (SELECT doc_id, seg, pos, token FROM rk_seg WHERE is_stop = 0),
    rk_ph AS (
      SELECT doc_id, seg, string_agg(token, ' ' ORDER BY pos) AS phrase,
             CAST(count(*) AS BIGINT) AS plen
      FROM rk_w GROUP BY doc_id, seg
    ),
    rk_st AS (
      SELECT w.doc_id, w.token, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(p.plen) AS BIGINT) AS deg
      FROM rk_w w JOIN rk_ph p ON p.doc_id = w.doc_id AND p.seg = w.seg
      GROUP BY w.doc_id, w.token
    ),
    rk_sc AS (
      SELECT w.doc_id, w.seg,
             CAST(sum((s.deg * {textstats.RAKE_SCALE}) // s.freq) AS BIGINT)
               AS rake_scaled
      FROM rk_w w JOIN rk_st s ON s.doc_id = w.doc_id AND s.token = w.token
      GROUP BY w.doc_id, w.seg
    )
    SELECT DISTINCT p.doc_id, p.phrase, c.rake_scaled
    FROM rk_ph p JOIN rk_sc c ON c.doc_id = p.doc_id AND c.seg = p.seg
    """,
)
def txt_rake_keyphrases(spark, sf_dir):
    """RAKE candidate phrases + exact-integer degree/frequency scores
    (operators/textstats.rake_keyphrases)."""
    return textstats.rake_keyphrases(_docs(spark, sf_dir))


_KN_BIG_CTE = """
knt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
knb AS (
  SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS c12
  FROM (SELECT unnest(list_transform(range(1, len(toks)),
                      i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS p
        FROM knt)
  GROUP BY p.w1, p.w2
),
knc1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                CAST(count(*) AS BIGINT) AS n1w1
         FROM knb GROUP BY w1),
knn1c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1c2 FROM knb GROUP BY w2),
knn1b AS (SELECT CAST(count(*) AS BIGINT) AS n1b FROM knb)
"""


@query(
    "txt_kn_bigrams",
    oracle=f"""
    WITH {_KN_BIG_CTE}
    SELECT b.w1, b.w2, b.c12,
           CAST((greatest(4 * b.c12 - 3, 0) * t.n1b
                 + 3 * c.n1w1 * n.n1c2) * 1000000
                // (4 * c.c1 * t.n1b) AS BIGINT) AS p_1e6
    FROM knb b
    JOIN knc1 c ON c.w1 = b.w1
    JOIN knn1c2 n ON n.w2 = b.w2
    CROSS JOIN knn1b t
    """,
)
def txt_kn_bigrams(spark, sf_dir):
    """Interpolated Kneser-Ney conditional probability per seen bigram
    (D = 3/4 exact rational, continuation counts, micro-unit emit)
    (operators/textstats.py kneser_ney_bigrams)."""
    return textstats.kneser_ney_bigrams(_docs(spark, sf_dir))


@query(
    "txt_kn_normalization",
    oracle=f"""
    WITH {_KN_BIG_CTE},
    knseen AS (
      SELECT b.w1,
             CAST(sum(greatest(4 * b.c12 - 3, 0)) AS BIGINT) AS seen_disc,
             CAST(sum(n.n1c2) AS BIGINT) AS seen_n1c2
      FROM knb b JOIN knn1c2 n ON n.w2 = b.w2 GROUP BY b.w1
    )
    SELECT c.w1, c.c1, c.n1w1,
           CAST(s.seen_disc * t.n1b + 3 * c.n1w1 * t.n1b AS BIGINT) AS lhs,
           CAST(4 * c.c1 * t.n1b AS BIGINT) AS den,
           CAST(CAST(s.seen_disc * t.n1b + 3 * c.n1w1 * t.n1b =
                     4 * c.c1 * t.n1b AS INT) AS BIGINT) AS ok
    FROM knc1 c JOIN knseen s ON s.w1 = c.w1 CROSS JOIN knn1b t
    """,
)
def txt_kn_normalization(spark, sf_dir):
    """Closed-form per-context proof that the KN distribution sums to
    one: the unseen backoff mass telescopes through sum_V N1c2 = N1b,
    so the identity is checkable from seen-bigram tables alone
    (operators/textstats.py kneser_ney_normalization)."""
    return textstats.kneser_ney_normalization(_docs(spark, sf_dir))
