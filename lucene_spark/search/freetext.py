"""Free-text (phrase) suggestions from an n-gram language model.

The ``FreeTextSuggester`` analog (suggest/analyzing/FreeTextSuggester.java:91):
predict the next word from the typed context using shingle counts and
"stupid backoff" smoothing (Brants et al. 2007) — if the bigram model has
no completion for the context, back off to the unigram model and scale by
``ALPHA`` = 0.4 per skipped order (FreeTextSuggester.java:126).

Spark shape: the MODEL BUILD is the scale-heavy part and is one pure-JVM
pass — tokenize with the native SQL analyzer twin, slide every n-gram
window with ``transform(sequence(...))``, explode, and count by gram.
At 100 TB this is a classic map-side-combined aggregation; the model
table is itself queryable/persistable like any index table. LOOKUP
filters the model with a prefix predicate per order (parquet min/max
range-prunes the sorted gram column) and takes a tiny top-N — two short
jobs, no FST needed.

Semantics matched to the reference lookup (:426-:700):

- the typed key analyzes to tokens; the last token is a partial prefix
  unless the key ends with the separator, in which case every completion
  starts a fresh word ("foo " suggests bigram continuations of foo);
- per order (highest first): completions = grams starting with the
  context + last-token prefix that don't extend past one more word;
  score = backoff * count(gram) / count(context) (totTokens for the
  unigram model);
- a completion's final word is only suggested by the HIGHEST order model
  that predicts it (the ``seen`` set, :528); backoff multiplies by ALPHA
  per order step down, including orders whose context was never seen;
- results sort by score descending (stable: higher orders first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ALPHA = 0.4  # FreeTextSuggester.java:126
DEFAULT_GRAMS = 2  # FreeTextSuggester.java:117

__all__ = ["FreeTextSuggester", "ALPHA", "DEFAULT_GRAMS"]


class FreeTextSuggester:
    """Builds (order, gram, count) over a corpus, then predicts next
    words. ``separator`` joins shingle words (default space)."""

    def __init__(self, grams: int = DEFAULT_GRAMS, separator: str = " "):
        if grams < 1:
            raise ValueError("grams must be >= 1")
        if len(separator) != 1 or ord(separator) > 0x7F:
            raise ValueError("separator must be one simple ascii character")
        self.grams = grams
        self.sep = separator
        self.model: DataFrame | None = None
        self.tot_tokens: int | None = None

    def build(self, docs: DataFrame, text_col: str = "text") -> "FreeTextSuggester":
        """One JVM-side pass: tokens array -> all 1..grams shingles ->
        explode -> count. The model DataFrame is (order, gram, count)."""
        from lucene_spark.analysis.sql import sql_tokens

        toks = docs.select(sql_tokens(F.col(text_col)).alias("t"))
        orders = []
        for n in range(1, self.grams + 1):
            grams = F.expr(
                f"transform(sequence(0, size(t) - {n}), "
                f"i -> concat_ws('{self.sep}', slice(t, i + 1, {n})))"
            )
            orders.append(
                # docs shorter than the gram order contribute nothing to
                # this model (Spark's sequence(0, -1) would DESCEND)
                toks.filter(F.size("t") >= n)
                .select(F.explode(grams).alias("gram"))
                .select(F.lit(n).alias("order"), "gram")
            )
        u = orders[0]
        for o in orders[1:]:
            u = u.unionByName(o)
        self.model = u.groupBy("order", "gram").count().persist()
        self.tot_tokens = int(
            self.model.filter(F.col("order") == 1)
            .agg(F.sum("count"))
            .collect()[0][0]
            or 0
        )
        return self

    def _count(self, order: int, gram: str) -> int:
        rows = (
            self.model.filter((F.col("order") == order) & (F.col("gram") == gram))
            .select("count")
            .collect()
        )
        return int(rows[0]["count"]) if rows else 0

    def lookup(self, key: str, num: int = 10) -> list[tuple[str, float]]:
        """[(full suggestion text, stupid-backoff score), ...] best first."""
        if self.model is None:
            raise ValueError("call build() first")
        from lucene_spark.analysis.tokenizer import StandardAnalyzer

        an = StandardAnalyzer()
        tokens = an.terms(key)
        if not tokens:
            raise ValueError("no tokens produced by analyzer")
        # trailing whitespace OR the configured separator: last word complete
        ended = bool(key) and (key[-1].isspace() or key[-1] == self.sep)

        # last-i-gram contexts, mirroring the reference's lastTokens fill
        last: list[str | None] = [None] * self.grams
        for i in range(1, self.grams + 1):
            if len(tokens) >= i:
                last[i - 1] = self.sep.join(tokens[-i:])
        if ended:
            for i in range(self.grams - 1, 0, -1):
                if last[i - 1] is not None:
                    last[i] = last[i - 1] + self.sep
            last[0] = ""

        backoff = 1.0
        seen: set[str] = set()
        results: list[tuple[str, float]] = []
        for gram in range(self.grams - 1, -1, -1):
            token = last[gram]
            if token is None or (token == "" and key):
                continue  # input didn't have enough tokens
            # context = everything before the last separator
            ctx = token.rsplit(self.sep, 1)[0] if self.sep in token else None
            if ctx is not None:
                context_count = self._count(gram, ctx)
                if context_count == 0:
                    backoff *= ALPHA
                    continue
            else:
                context_count = self.tot_tokens
            # completions of the final (possibly partial) word in THIS model:
            # prefix match, no further separator in the completed suffix
            comp = (
                self.model.filter(
                    (F.col("order") == gram + 1)
                    & F.col("gram").startswith(token)
                    & ~F.substring(
                        F.col("gram"), len(token) + 1, 1 << 20
                    ).contains(self.sep)
                )
                .orderBy(F.desc("count"), F.asc("gram"))
                .limit(num + len(seen))
                .collect()
            )
            if not comp:
                backoff *= ALPHA
                continue
            for r in comp:
                full = r["gram"]
                last_word = full.rsplit(self.sep, 1)[-1]
                if last_word in seen:
                    continue
                seen.add(last_word)
                results.append(
                    (full, backoff * float(r["count"]) / float(context_count))
                )
            backoff *= ALPHA
        results.sort(key=lambda x: -x[1])
        return results[:num]
