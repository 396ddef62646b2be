"""Index-backed document classifiers (the ``lucene/classification`` module).

Two classifiers re-expressed as DataFrame plans over the inverted index:

- ``knn_classify`` — ``classification/KNearestNeighborClassifier.java:121``
  (``assignClass`` -> ``classifyFromTopDocs`` -> ``buildListFromTopDocs``
  ``:190``): run a BM25 query built from the analyzed input text, take the
  top-k neighbours, and score each class by its rank-position boost
  ``sum(score / maxScore)`` normalized by k (with the reference's
  ``sumdoc < k`` correction). The reference selects query terms with
  MoreLikeThis; here every analyzed input term becomes a SHOULD clause —
  the MLT interesting-term cut is a recall optimization, not a semantics
  change, and our ``more_like_this`` operator covers that selection.
- ``naive_bayes_classify`` — ``classification/SimpleNaiveBayesClassifier.java:144``:
  per class c, ``log P(c) + sum_w log((hits(w, c) + 1) / den(c))`` where
  ``hits(w, c)`` counts docs of class c containing w (``getWordFreqForClass``
  ``:262``), ``den(c) = avgUniqueTermsPerDoc * docFreq(c) + docsWithClass``
  (``getTextTermFreqForClass`` ``:240``), followed by the log-sum-exp
  normalization to a probability (``normClassificationResults`` ``:292``).
  Everything is computed from the index tables: one postings decode for the
  input's distinct terms (JVM-side joins after that), field stats for the
  unique-terms average — no per-doc Python anywhere.

Both return one row per class, ordered best-first; scores are rounded to 6
decimals so independent engines (Spark vs DuckDB libm) hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.search import query as Q

__all__ = ["knn_classify", "naive_bayes_classify"]


def _analyzer_of(searcher):
    from lucene_spark.analysis.tokenizer import StandardAnalyzer

    cfg = searcher.index.config
    return StandardAnalyzer(
        max_token_length=cfg.max_token_length,
        stopwords=frozenset(cfg.stopwords or ()),
    )


def knn_classify(
    searcher,
    docs: DataFrame,
    text: str,
    class_col: str = "lang",
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """KNearestNeighborClassifier over the index: (label, class_count,
    score) per class present in the BM25 top-k for the input text.

    score = (count * (boost / count)) / k with boost = sum(hit_score /
    max_score), then * k / sumdoc when fewer than k neighbours carry a
    class value — exactly ``buildListFromTopDocs``
    (KNearestNeighborClassifier.java:190-232).
    """
    analyzer = _analyzer_of(searcher)
    terms = list(dict.fromkeys(analyzer.terms(text)))
    if not terms:
        raise ValueError("input text analyzes to no terms")
    field = searcher.index.config.field_name
    q = Q.BooleanQuery.of(should=[Q.TermQuery(field, t) for t in terms])
    top = searcher.search(q, k=k).select("doc_id", "score")
    # k rows max: the windows below are a driver-sized reduce, not a shuffle
    # of corpus data (the top-k join is the only distributed stage).
    # maxScore comes from the overall top hit BEFORE the class-null filter
    # (buildListFromTopDocs reads topDocs.scoreDocs[0] — :196)
    everything = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    top = top.withColumn("max_score", F.max("score").over(everything))
    labeled = top.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(class_col).alias("label")),
        "doc_id",
    ).where(F.col("label").isNotNull())
    per_class = labeled.groupBy("label").agg(
        F.count(F.lit(1)).alias("class_count"),
        F.sum(F.col("score").cast("double") / F.col("max_score").cast("double")).alias(
            "boost"
        ),
    )
    per_class = per_class.withColumn(
        "sumdoc", F.sum("class_count").over(everything)
    )
    raw = F.col("boost") / F.lit(float(k))
    corrected = F.when(
        F.col("sumdoc") < k, raw * F.lit(float(k)) / F.col("sumdoc").cast("double")
    ).otherwise(raw)
    return (
        per_class.select(
            "label",
            "class_count",
            F.round(corrected, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("label"))
    )


def naive_bayes_classify(
    searcher,
    docs: DataFrame,
    text: str,
    class_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimpleNaiveBayesClassifier over the index: (label, log_score, prob)
    per class, best-first.

    log_score follows SimpleNaiveBayesClassifier.java exactly:
    ``log(docFreq(c)) - log(docsWithClass)`` (``calculateLogPrior:278``)
    plus, for EVERY input token occurrence (duplicates kept, ``:212``),
    ``log((hits(w,c) + 1) / (avgUniqueTermsPerDoc * docFreq(c) +
    docsWithClass))``. prob is the log-sum-exp normalization
    (``normClassificationResults:292``).
    """
    analyzer = _analyzer_of(searcher)
    words = analyzer.terms(text)
    if not words:
        raise ValueError("input text analyzes to no terms")
    field = searcher.index.config.field_name
    # multiplicity per distinct word (the reference loops every occurrence)
    mult: dict[str, int] = {}
    for w in words:
        mult[w] = mult.get(w, 0) + 1
    distinct = sorted(mult)

    fs = searcher.index.fieldstats[field]
    # Terms.getSumDocFreq / Terms.getDocCount -> avg unique terms per doc
    avg_unique = fs.sum_doc_freq / float(fs.doc_count)

    classes = (
        docs.where(F.col(class_col).isNotNull())
        .groupBy(F.col(class_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("class_docs"))
    )
    everything = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    classes = classes.withColumn(
        "docs_with_class", F.sum("class_docs").over(everything)
    )

    # one postings decode for the input's distinct terms -> (term, doc_id)
    decoded = searcher._decoded(field, F.col("term").isin(distinct)).select(
        "term", "doc_id"
    )
    decoded = searcher._live(decoded).dropDuplicates(["term", "doc_id"])
    hits = (
        decoded.join(
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(class_col).alias("label")
            ),
            "doc_id",
        )
        .groupBy("term", "label")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    # every (word, class) pair needs a row even at hits=0 (+1 smoothing)
    words_df = docs.sparkSession.createDataFrame(
        [(w, mult[w]) for w in distinct], "term string, mult int"
    )
    grid = classes.crossJoin(words_df).join(hits, ["term", "label"], "left").fillna(
        {"hits": 0}
    )
    den = (
        F.lit(avg_unique) * F.col("class_docs").cast("double")
        + F.col("docs_with_class").cast("double")
    )
    like = F.col("mult").cast("double") * F.log(
        (F.col("hits").cast("double") + F.lit(1.0)) / den
    )
    scored = grid.groupBy("label", "class_docs", "docs_with_class").agg(
        F.sum(like).alias("likelihood")
    )
    log_score = (
        F.log(F.col("class_docs").cast("double"))
        - F.log(F.col("docs_with_class").cast("double"))
        + F.col("likelihood")
    )
    scored = scored.select("label", log_score.alias("log_score"))
    # normClassificationResults: prob_c = exp(log_score_c - logsumexp(all))
    scored = scored.withColumn("smax", F.max("log_score").over(everything))
    scored = scored.withColumn(
        "lse",
        F.col("smax")
        + F.log(F.sum(F.exp(F.col("log_score") - F.col("smax"))).over(everything)),
    )
    return (
        scored.select(
            "label",
            F.round(F.col("log_score"), 6).alias("log_score"),
            F.round(F.exp(F.col("log_score") - F.col("lse")), 6).alias("prob"),
        )
        .orderBy(F.desc("log_score"), F.asc("label"))
    )
