"""Driver-contract entries for the satellite search operators:
multi/sloppy phrase, suggest, MoreLikeThis, function score, rescore,
drill-sideways, highlighter. Oracles reuse entry_impl's float32-exact
BM25 CTE builders."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_spark.entry_impl import (
    BASE_CTES,
    _INV_EXPR,
    _fc,
    _idf_sql,
    _score_expr,
    _term_scores_cte,
    _topk_sql,
    get_searcher,
    register,
)
from lucene_spark.search import query as Q
from lucene_spark.search import extras


# ---- MultiPhraseQuery (search/MultiPhraseQuery.java:54) --------------------

_MP_TERMS = ["table", "row", "part"]
_MP_W = _fc(
    "("
    + " + ".join(
        f"{_idf_sql(f'(SELECT count(*) FROM tf WHERE term=' + repr(t) + ')')}::DOUBLE"
        for t in _MP_TERMS
    )
    + ")"
)


@register(
    "multi_phrase_query",
    f"""WITH {BASE_CTES},
mp0 AS (SELECT DISTINCT doc_id, pos FROM tok WHERE term IN ('table', 'row')),
mp1 AS (SELECT doc_id, pos FROM tok WHERE term = 'part'),
mp AS (
  SELECT mp0.doc_id, count(*)::INTEGER AS freq
  FROM mp0 JOIN mp1 ON mp1.doc_id = mp0.doc_id AND mp1.pos = mp0.pos + 1
  GROUP BY mp0.doc_id
),
mp_w(w) AS (SELECT {_MP_W}),
sc AS (
  SELECT mp.doc_id, {_score_expr('mp_w.w', 'mp.freq', 'i.inv')} AS score
  FROM mp JOIN invn i USING (doc_id) CROSS JOIN mp_w
)
{_topk_sql('sc')}""",
)
def multi_phrase_query(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    q = Q.MultiPhraseQuery("text", (("table", "row"), ("part",)))
    return s.search(q, k=10).select("doc_id", "score")


# ---- Sloppy phrase (search/SloppyPhraseMatcher.java:52, full semantics) ----

from lucene_spark.search.sloppy import duckdb_fold_cte as _sp_fold_cte

_SP_IDF1 = _idf_sql("(SELECT count(*) FROM tf WHERE term='table')")
_SP_IDF2 = _idf_sql("(SELECT count(*) FROM tf WHERE term='part')")
_SP_W = _fc(f"({_SP_IDF1}::DOUBLE + {_SP_IDF2}::DOUBLE)")


@register(
    "sloppy_phrase_query",
    f"""WITH RECURSIVE {BASE_CTES},
sp_a AS (SELECT doc_id, list(pos ORDER BY pos) AS pa FROM tok WHERE term = 'table' GROUP BY doc_id),
sp_b AS (SELECT doc_id, list(pos - 1 ORDER BY pos) AS pb FROM tok WHERE term = 'part' GROUP BY doc_id),
sp_m AS (
  SELECT doc_id, pa, pb, list_sort(list_distinct(pa || pb)) AS posu
  FROM sp_a JOIN sp_b USING (doc_id)
),
{_sp_fold_cte('sp_m', 2)},
sp_w(w) AS (SELECT {_SP_W}),
sc AS (
  SELECT o.doc_id, {_score_expr('sp_w.w', 'o.freq', 'i.inv')} AS score
  FROM sp_fold_out o JOIN invn i USING (doc_id) CROSS JOIN sp_w
  WHERE o.freq > 0
)
{_topk_sql('sc')}""",
)
def sloppy_phrase_query(spark, sf_dir):
    """Sloppy phrase with FULL SloppyPhraseMatcher.java:52 traversal
    semantics: out-of-order matches within slop, 1/(1+matchLength) sloppy
    weights, float32 freq accumulation. Engine side runs the JVM scan-fold
    (no Python); the oracle replays the identical fold as a DuckDB
    recursive CTE (see lucene_spark/search/sloppy.py)."""
    _, s = get_searcher(spark, sf_dir)
    return s.search(Q.PhraseQuery("text", ("table", "part"), slop=2), k=10).select(
        "doc_id", "score"
    )


# ---- suggest (suggest/FSTCompletion.java:48 analog) ------------------------


@register(
    "suggest_prefix",
    f"""WITH {BASE_CTES},
ts AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
SELECT term, df FROM ts WHERE term LIKE 'sc%'
ORDER BY df DESC, term ASC LIMIT 10""",
)
def suggest_prefix(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    return extras.suggest(s, "sc", n=10)


# ---- MoreLikeThis (queries/mlt/MoreLikeThis.java) --------------------------


@register(
    "more_like_this",
    f"""WITH {BASE_CTES},
mlt_tf AS (SELECT term, freq AS tf FROM tf WHERE doc_id = 7),
mlt_df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
mlt_sel AS (
  SELECT t.term, d.df FROM mlt_tf t JOIN mlt_df d USING (term)
  ORDER BY t.tf DESC, d.df ASC, t.term ASC LIMIT 5
),
mlt_w AS (
  SELECT term, {_idf_sql('df')} AS w FROM mlt_sel
),
mlt_s AS (
  SELECT tf.doc_id, {_score_expr('mw.w', 'tf.freq', 'i.inv')} AS s
  FROM tf JOIN mlt_w mw USING (term) JOIN invn i USING (doc_id)
),
sc AS (
  SELECT doc_id, CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM mlt_s WHERE doc_id != 7 GROUP BY doc_id
)
{_topk_sql('sc')}""",
)
def mlt_query(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    return extras.more_like_this(s, doc_id=7, max_terms=5, k=10)


# ---- FunctionScoreQuery (queries/function/FunctionScoreQuery.java:44) ------


@register(
    "function_score_query",
    f"""WITH {BASE_CTES}
SELECT d.doc_id, CAST(d.n_chars * 0.001 + 1.0 AS DOUBLE) AS score
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'data')
ORDER BY d.doc_id""",
)
def function_score_query(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    return extras.function_score(s, Q.TermQuery("text", "data"), "n_chars * 0.001 + 1.0")


# ---- QueryRescorer (search/QueryRescorer.java) -----------------------------


@register(
    "rescore_topk",
    f"""WITH {BASE_CTES},
{_term_scores_cte('rs', 'customer')},
first_pass AS (
  SELECT doc_id, score FROM rs ORDER BY score DESC, doc_id ASC LIMIT 20
)
SELECT f.doc_id,
       CAST(f.score AS DOUBLE) + CAST(d.n_chars / 1000.0 AS DOUBLE) AS score
FROM first_pass f JOIN documents d USING (doc_id)
ORDER BY score DESC, f.doc_id ASC LIMIT 10""",
)
def rescore_topk(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    return extras.rescore(
        s, Q.TermQuery("text", "customer"), window=20, expr="n_chars / 1000.0", k=10
    )


# ---- DrillSideways (facet/DrillSideways.java) ------------------------------


@register(
    "drill_sideways_lang",
    f"""WITH {BASE_CTES}
SELECT d.lang, count(*)::BIGINT AS cnt
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'row')
  AND d.n_chars >= 200
GROUP BY d.lang ORDER BY d.lang""",
)
def drill_sideways_lang(spark, sf_dir):
    """lang counts with the lang drill-down off, n_chars drill-down on."""
    _, s = get_searcher(spark, sf_dir)
    return extras.drill_sideways(
        s,
        Q.TermQuery("text", "row"),
        filters={"lang": F.col("lang") == "en", "n_chars": F.col("n_chars") >= 200},
        dim="lang",
    )


# ---- Highlighter (uhighlight/UnifiedHighlighter.java:96 analog) ------------


@register(
    "highlight_term",
    f"""WITH {BASE_CTES},
{_term_scores_cte('hs', 'spark')},
top AS (SELECT doc_id, score FROM hs ORDER BY score DESC, doc_id ASC LIMIT 5),
firstp AS (
  SELECT doc_id, min(pos)::INTEGER AS first_pos FROM tok
  WHERE term = 'spark' GROUP BY doc_id
),
tk AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9_]+') AS toks FROM documents)
SELECT t.doc_id, t.score, f.first_pos,
       array_to_string(
         tk.toks[greatest(f.first_pos - 2, 0) + 1 : greatest(f.first_pos - 2, 0) + 5],
         ' ') AS snippet
FROM top t JOIN firstp f USING (doc_id) JOIN tk USING (doc_id)
ORDER BY t.doc_id""",
)
def highlight_term_entry(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    return extras.highlight_term(s, "spark", window=2, k=5)


# ---- CombinedFieldQuery (sandbox/search/CombinedFieldQuery.java:79) --------

_LANG_IDX_CACHE: dict = {}


def _get_lang_index(spark, sf_dir):
    from lucene_spark.index.build import IndexConfig, build_index

    if sf_dir not in _LANG_IDX_CACHE:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        cfg = IndexConfig(
            text_col="lang", field_name="lang", doc_id_col="doc_id",
            docs_per_segment=1024, with_positions=False,
        )
        idx = build_index(spark, docs, cfg)
        idx.postings.persist().count()
        _LANG_IDX_CACHE[sf_dir] = idx
    return _LANG_IDX_CACHE[sf_dir]


_CF_SCORE = _score_expr("w.w", "cf.freq", "n.inv")

_CF_ORACLE = f"""WITH {BASE_CTES},
cf_stats AS (
  SELECT greatest(doc_count, (SELECT count(*) FROM documents)) AS doc_count,
         sum_ttf + (SELECT count(*) FROM documents) AS sum_ttf
  FROM fstats
),
cf_avgd AS (
  SELECT CAST(sum_ttf / CAST(doc_count AS DOUBLE) AS FLOAT) AS avgdl FROM cf_stats
),
cf_df(v) AS (
  SELECT greatest(
    (SELECT count(*) FROM tf WHERE term = 'es'),
    (SELECT count(*) FROM documents WHERE lang = 'es'))
),
w(w) AS (
  SELECT CAST(ln(1.0 + (((SELECT doc_count FROM cf_stats) - (SELECT v FROM cf_df)) + 0.5)
                        / ((SELECT v FROM cf_df) + 0.5)) AS FLOAT)
),
cf AS (
  SELECT d.doc_id,
         (coalesce(tf.freq, 0) + CASE WHEN d.lang = 'es' THEN 1 ELSE 0 END)::INTEGER AS freq,
         coalesce(dl.len, 0) + 1 AS clen
  FROM documents d
  LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.term = 'es'
  LEFT JOIN dl ON dl.doc_id = d.doc_id
),
cf_m AS (SELECT * FROM cf WHERE freq > 0),
cf_nb AS (
  SELECT cf_m.doc_id, max(b4.nb) AS nb FROM cf_m JOIN b4 ON b4.floor_len <= cf_m.clen
  GROUP BY cf_m.doc_id
),
n AS (
  SELECT nb.doc_id, {_INV_EXPR} AS inv
  FROM cf_nb nb JOIN b4 t ON t.nb = nb.nb CROSS JOIN cf_avgd a
),
sc AS (
  SELECT cf.doc_id, {_CF_SCORE} AS score
  FROM cf_m cf JOIN n USING (doc_id) CROSS JOIN w
)
{_topk_sql('sc')}"""


@register("combined_field_query", _CF_ORACLE)
def combined_field_query(spark, sf_dir):
    """Term 'es' scored across (text, lang) as one pseudo-field with unit
    weights — freq and length combine, norms re-quantize via byte4."""
    idx_text, _ = get_searcher(spark, sf_dir)
    idx_lang = _get_lang_index(spark, sf_dir)
    return extras.combined_field_topk(
        {"text": (idx_text, 1), "lang": (idx_lang, 1)}, "es", k=10
    )


# ---- BlendedTermQuery (search/BlendedTermQuery.java:47) --------------------

_BL_DF = (
    "greatest((SELECT count(*) FROM tf WHERE term='fast'),"
    " (SELECT count(*) FROM tf WHERE term='batch'))"
)


@register(
    "blended_term_query",
    f"""WITH {BASE_CTES},
bl_w(w) AS (SELECT {_idf_sql(_BL_DF)}),
b1 AS (
  SELECT tf.doc_id, {_score_expr('bl_w.w', 'tf.freq', 'i.inv')} AS score
  FROM tf JOIN invn i USING (doc_id) CROSS JOIN bl_w WHERE tf.term = 'fast'
),
b2 AS (
  SELECT tf.doc_id, {_score_expr('bl_w.w', 'tf.freq', 'i.inv')} AS score
  FROM tf JOIN invn i USING (doc_id) CROSS JOIN bl_w WHERE tf.term = 'batch'
),
u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
agg AS (
  SELECT doc_id, max(score) AS mx, sum(CAST(score AS DOUBLE)) AS sm
  FROM u GROUP BY doc_id
),
sc AS (
  SELECT doc_id,
         CAST(CAST(mx AS DOUBLE)
              + CAST(0.30000001192092896 AS DOUBLE) * (sm - CAST(mx AS DOUBLE)) AS FLOAT) AS score
  FROM agg
)
{_topk_sql('sc')}""",
)
def blended_term_query(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    q = Q.BlendedTermQuery("text", ("fast", "batch"), tie_breaker=0.3)
    return s.search(q, k=10).select("doc_id", "score")


# ---- Intervals (queries/intervals, simplified two-term core) ---------------


@register(
    "intervals_ordered",
    f"""WITH {BASE_CTES},
ia AS (SELECT doc_id, pos AS pa FROM tok WHERE term = 'key'),
ib AS (SELECT doc_id, pos AS pb FROM tok WHERE term = 'value')
SELECT ia.doc_id, count(DISTINCT ia.pa)::BIGINT AS n_windows
FROM ia JOIN ib ON ib.doc_id = ia.doc_id
WHERE ib.pb > ia.pa AND ib.pb - ia.pa <= 4
GROUP BY ia.doc_id ORDER BY ia.doc_id""",
)
def intervals_ordered(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    return extras.interval_within(s, "key", "value", width=5, ordered=True)


@register(
    "intervals_unordered",
    f"""WITH {BASE_CTES},
ua AS (SELECT doc_id, pos AS pa FROM tok WHERE term = 'key'),
ub AS (SELECT doc_id, pos AS pb FROM tok WHERE term = 'value')
SELECT ua.doc_id, count(DISTINCT ua.pa)::BIGINT AS n_windows
FROM ua JOIN ub ON ub.doc_id = ua.doc_id
WHERE ub.pb != ua.pa AND abs(ub.pb - ua.pa) <= 4
GROUP BY ua.doc_id ORDER BY ua.doc_id""",
)
def intervals_unordered(spark, sf_dir):
    _, s = get_searcher(spark, sf_dir)
    return extras.interval_within(s, "key", "value", width=5, ordered=False)
