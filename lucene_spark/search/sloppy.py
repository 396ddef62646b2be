"""Lucene sloppy-phrase semantics (``search/SloppyPhraseMatcher.java:52``).

The reference matcher traverses PhrasePositions with a priority queue,
always advancing the least position; each pop-run emits one match with
``matchLength = end - pp.position`` minimized over the run, weighted
``1/(1 + matchLength)``; the doc's phrase freq is the float32 sum of those
weights in emission order (``PhraseScorer`` accumulation). This matches
out-of-order occurrences within slop ("a b"~2 matches "b a" at distance 2,
SloppyPhraseMatcher javadoc) and — by design — is traversal-greedy, not
all-combinations.

Two engine paths:

1. **Two distinct terms (the common case): a pure JVM fold.** For k=2 the
   PQ traversal reduces to a single left-to-right scan over the merged
   distinct adjusted positions (adjusted = raw - slot offset) carrying a
   small state machine:

   - the traversal visits a *chain* of elements: o1 = max of the two first
     elements, then repeatedly the first element of the OTHER list strictly
     greater than the current chain element;
   - each chain element o emits one match with
     ``matchLength = o - max{y in other list : y <= o}`` (floor includes
     an equal-position element of the other list);
   - ties in adjusted position (term_a at p and term_b at p+1) emit exactly
     one distance-0 match and consume both elements.

   The scan state is (chain type, chain pos, prev position per list, seen
   flags, float32 freq). Equivalence with a faithful port of the Java
   traversal is pinned exhaustively in ``tests/test_sloppy.py`` (all
   position subsets of a small universe + randomized fuzz).

   The same fold is emitted in two dialects: Spark SQL ``aggregate()``
   (whole-stage codegen, no Python) and a DuckDB recursive CTE (the
   driver-side oracle), so both engines run bit-identical float32 math.

2. **General case (3+ slots, repeated terms): a faithful per-doc matcher**
   in Python (Arrow-batched ``applyInPandas``), porting the PQ loop
   including repeat groups (``advanceRpts`` collision rule: always
   advance the lesser of the two colliding positions). Single-term
   repeats initialize by advancing the j-th repeat j times; multi-term
   repeat groups (a term shared by different multi-term slots,
   ``hasMultiTermRpts``) form connected components over shared repeating
   terms and initialize by doc-dependent collision resolution
   (``SloppyPhraseMatcher.java:467-484``).
"""

from __future__ import annotations

__all__ = [
    "sloppy_matches",
    "sloppy_freq",
    "spark_fold_expr",
    "duckdb_fold_cte",
]


# ---------------------------------------------------------------------------
# faithful matcher (general path)
# ---------------------------------------------------------------------------


class _PP:
    __slots__ = ("ord", "offset", "positions", "idx", "position", "rpt_group", "rpt_ind")

    def __init__(self, ord_, offset, positions):
        self.ord, self.offset, self.positions = ord_, offset, positions
        self.idx = -1
        self.position = None
        self.rpt_group = -1
        self.rpt_ind = -1

    def first_position(self):
        self.idx = 0
        self.position = self.positions[0] - self.offset

    def next_position(self):
        self.idx += 1
        if self.idx >= len(self.positions):
            return False
        self.position = self.positions[self.idx] - self.offset
        return True

    def key(self):  # pq order: position, then (query) offset, then ord
        return (self.position, self.offset, self.ord)

    def tp_pos(self):
        return self.position + self.offset


def sloppy_matches(
    slot_positions: list[list[int]],
    slop: int,
    terms: list | None = None,
    offsets: list[int] | None = None,
) -> list[int]:
    """matchLengths emitted by the reference traversal, in emission order.

    slot_positions[i]: sorted raw positions where slot i's term(s) occur
    (for a multi-term slot: the merged union — UnionPostingsEnum).
    terms[i]: slot term identity — a single string, or a tuple/list of
    alternative terms for a multi-term slot. Repeat groups form on shared
    terms: single-term repeats group by equality; multi-term repeats form
    connected components over shared repeating terms
    (``SloppyPhraseMatcher.java:556`` gatherRptGroups /
    ``:672`` unionTermGroups).
    offsets[i]: query position of slot i (default i — consecutive phrase).
    """
    k = len(slot_positions)
    if terms is None:
        term_sets = [(str(i),) for i in range(k)]
    else:
        term_sets = [(t,) if isinstance(t, str) else tuple(t) for t in terms]
    offsets = offsets if offsets is not None else list(range(k))
    pps = [_PP(i, offsets[i], slot_positions[i]) for i in range(k)]
    if any(not p.positions for p in pps):
        return []
    # repeating terms: terms held by more than one slot
    # (SloppyPhraseMatcher.java:620 repeatingTerms)
    t_count: dict[str, int] = {}
    for ts in term_sets:
        for t in set(ts):
            t_count[t] = t_count.get(t, 0) + 1
    rpt_terms = {t for t, c in t_count.items() if c > 1}
    rpt_pps = [p for p in pps if rpt_terms & set(term_sets[p.ord])]
    has_multi = any(len(set(term_sets[p.ord])) > 1 for p in rpt_pps)
    rpt_groups: list[list[_PP]] = []
    if not has_multi:
        # simple case: groups are slots holding the same (single) term
        groups: dict[str, list[_PP]] = {}
        for p in rpt_pps:
            groups.setdefault(term_sets[p.ord][0], []).append(p)
        rpt_groups = [g for g in groups.values() if len(g) > 1]
    elif rpt_pps:
        # multi-term repeats: union intersecting repeating-term sets until
        # disjoint (connected components on the slot/term bipartite graph,
        # unionTermGroups), then bucket each repeating pp by its component
        comps: list[set[str]] = []
        for p in rpt_pps:
            merged = set(term_sets[p.ord]) & rpt_terms
            rest = []
            for c in comps:
                if c & merged:
                    merged |= c
                else:
                    rest.append(c)
            rest.append(merged)
            comps = rest
        buckets: list[list[_PP]] = [[] for _ in comps]
        for p in rpt_pps:
            for gi, c in enumerate(comps):
                if c & set(term_sets[p.ord]):
                    buckets[gi].append(p)
                    break
        rpt_groups = [b for b in buckets if len(b) > 1]
    for gi, g in enumerate(rpt_groups):
        g.sort(key=lambda p: p.offset)
        for j, p in enumerate(g):
            p.rpt_group = gi
            p.rpt_ind = j
    end = [float("-inf")]

    def advance_pp(pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > end[0]:
            end[0] = pp.position
        return True

    def lesser(p1: _PP, p2: _PP) -> _PP:
        if p1.position < p2.position or (
            p1.position == p2.position and p1.offset < p2.offset
        ):
            return p1
        return p2

    def collide(pp: _PP) -> _PP | None:
        tp = pp.tp_pos()
        for p2 in rpt_groups[pp.rpt_group]:
            if p2 is not pp and p2.tp_pos() == tp:
                return p2
        return None

    for p in pps:
        p.first_position()
    # advanceRepeatGroups (SloppyPhraseMatcher.java:467): start condition
    # is "no collisions inside any group"
    if has_multi:
        # multi-term: collisions depend on the doc, resolve by repeatedly
        # advancing the lesser of each colliding pair; restart the scan
        # when a lower-index pp moved
        for rg in rpt_groups:
            i = 0
            while i < len(rg):
                incr = 1
                pp = rg[i]
                while True:
                    c = collide(pp)
                    if c is None:
                        break
                    pp2 = lesser(pp, c)
                    if not pp2.next_position():
                        return []
                    if pp2.rpt_ind < i:
                        incr = 0
                        break
                i += incr
    else:
        # single-term: the j-th repeating pp starts advanced j times
        for rg in rpt_groups:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return []
    heap = list(pps)
    for p in pps:
        if p.position > end[0]:
            end[0] = p.position

    def heap_pop() -> _PP:
        heap.sort(key=_PP.key)
        return heap.pop(0)

    def heap_top() -> _PP:
        heap.sort(key=_PP.key)
        return heap[0]

    def advance_rpts(pp: _PP) -> bool:
        if pp.rpt_group < 0:
            return True
        while True:
            c = collide(pp)
            if c is None:
                return True
            pp = lesser(pp, c)
            if not advance_pp(pp):
                return False

    matches: list[int] = []
    positioned = True
    while positioned:
        pp = heap_pop()
        match_length = end[0] - pp.position
        nxt = heap_top().position
        while advance_pp(pp):
            if rpt_groups and not advance_rpts(pp):
                positioned = False
                break
            if pp.position > nxt:
                heap.append(pp)
                if match_length <= slop:
                    matches.append(match_length)
                    break
                pp = heap_pop()
                nxt = heap_top().position
                match_length = end[0] - pp.position
            else:
                ml2 = end[0] - pp.position
                if ml2 < match_length:
                    match_length = ml2
        else:
            positioned = False
        if not positioned:
            if match_length <= slop:
                matches.append(match_length)
            break
    return matches


def sloppy_freq(
    slot_positions: list[list[int]],
    slop: int,
    terms: list[str] | None = None,
    offsets: list[int] | None = None,
):
    """float32 sloppy frequency: sum of 1/(1+matchLength) accumulated in
    float32 in emission order (PhraseScorer's ``freq += sloppyWeight()``)."""
    import numpy as np

    f = np.float32(0.0)
    one = np.float32(1.0)
    for ml in sloppy_matches(slot_positions, slop, terms, offsets):
        f = np.float32(f + np.float32(one / np.float32(1 + ml)))
    return f


# ---------------------------------------------------------------------------
# k=2 fold, generated for both dialects
# ---------------------------------------------------------------------------
#
# State struct fields:
#   ct  int     chain type: -1 none, 0 = list A, 1 = list B
#   cp  bigint  chain position
#   pva bigint  last A element strictly before current (NULL = none)
#   pvb bigint  last B element before current
#   sa  boolean A seen
#   sb  boolean B seen
#   fr  float   float32 freq accumulator


def _fold_pieces(acc: str, q: str, pa: str, pb: str, slop: int, d: dict):
    """Shared condition templates; d maps dialect-specific function names."""
    has_a = f"{d['contains']}({pa}, {q})"
    has_b = f"{d['contains']}({pb}, {q})"
    fla = f"(CASE WHEN {has_a} THEN {q} ELSE {acc}.pva END)"
    flb = f"(CASE WHEN {has_b} THEN {q} ELSE {acc}.pvb END)"
    emit = f"""(CASE
      WHEN {acc}.ct = -1 THEN
        (CASE WHEN ({acc}.sa OR {has_a}) AND ({acc}.sb OR {has_b}) THEN
           (CASE WHEN {has_a} AND NOT {acc}.sa AND {acc}.sb THEN 0 ELSE 1 END)
         ELSE -1 END)
      WHEN {acc}.ct = 0 THEN
        (CASE WHEN {has_b} AND {q} > {acc}.cp
                   AND ({acc}.pvb IS NULL OR {acc}.pvb <= {acc}.cp)
              THEN 1 ELSE -1 END)
      ELSE
        (CASE WHEN {has_a} AND {q} > {acc}.cp
                   AND ({acc}.pva IS NULL OR {acc}.pva <= {acc}.cp)
              THEN 0 ELSE -1 END)
      END)"""
    ml = f"(CASE WHEN {emit} = 0 THEN {q} - {flb} WHEN {emit} = 1 THEN {q} - {fla} ELSE NULL END)"
    fields = {
        "ct": f"(CASE WHEN {emit} >= 0 THEN {emit} ELSE {acc}.ct END)",
        "cp": f"(CASE WHEN {emit} >= 0 THEN CAST({q} AS BIGINT) ELSE {acc}.cp END)",
        "pva": f"(CASE WHEN {has_a} THEN CAST({q} AS BIGINT) ELSE {acc}.pva END)",
        "pvb": f"(CASE WHEN {has_b} THEN CAST({q} AS BIGINT) ELSE {acc}.pvb END)",
        "sa": f"({acc}.sa OR {has_a})",
        "sb": f"({acc}.sb OR {has_b})",
        # float32 accumulation: float+float is exact in double, the final
        # CAST rounds once == native float addition; the weight is the
        # double quotient rounded to float (1f/(1f+matchLength))
        "fr": (
            f"(CASE WHEN {emit} >= 0 AND {ml} <= {slop} THEN "
            f"CAST({acc}.fr + CAST(1.0/(1.0 + {ml}) AS FLOAT) AS FLOAT) "
            f"ELSE {acc}.fr END)"
        ),
    }
    return fields


def spark_fold_expr(posu: str, pa: str, pb: str, slop: int) -> str:
    """Spark SQL expression (string for F.expr): float32 sloppy freq from
    `posu` (sorted merged distinct adjusted positions, array<int>), `pa`
    (slot-0 adjusted positions, array<int>), `pb` (slot-1 adjusted)."""
    d = {"contains": "array_contains"}
    fields = _fold_pieces("acc", "q", pa, pb, slop, d)
    init = (
        "named_struct('ct', -1, 'cp', CAST(-1 AS BIGINT), "
        "'pva', CAST(NULL AS BIGINT), 'pvb', CAST(NULL AS BIGINT), "
        "'sa', false, 'sb', false, 'fr', CAST(0.0 AS FLOAT))"
    )
    merge = "named_struct(" + ", ".join(
        f"'{k}', {v}" for k, v in fields.items()
    ) + ")"
    return f"aggregate({posu}, {init}, (acc, q) -> {merge}, acc -> acc.fr)"


def duckdb_fold_cte(base: str, slop: int, name: str = "sp_fold") -> str:
    """DuckDB recursive-CTE fragment computing the same fold.

    `base` must be a relation (doc_id, pa INT[], pb INT[], posu INT[])
    with posu = sorted distinct merged adjusted positions. Produces CTEs
    ending in ``{name}_out(doc_id, freq)`` with the float32 sloppy freq.
    (A list_reduce formulation hits a DuckDB 1.0 lambda mis-evaluation on
    large repeated CASE trees — the recursive CTE evaluates each step as a
    plain projection, which matches the Spark aggregate() fold exactly.)
    """
    d = {"contains": "list_contains"}
    q = f"m.posu[f.i]"
    fields = _fold_pieces("f", q, "m.pa", "m.pb", slop, d)
    return f"""{name} AS (
  SELECT doc_id, 1 AS i, -1 AS ct, CAST(-1 AS BIGINT) AS cp,
         CAST(NULL AS BIGINT) AS pva, CAST(NULL AS BIGINT) AS pvb,
         false AS sa, false AS sb, CAST(0.0 AS FLOAT) AS fr
  FROM {base}
  UNION ALL
  SELECT f.doc_id, f.i + 1,
         {fields['ct']} AS ct,
         {fields['cp']} AS cp,
         {fields['pva']} AS pva,
         {fields['pvb']} AS pvb,
         {fields['sa']} AS sa,
         {fields['sb']} AS sb,
         {fields['fr']} AS fr
  FROM {name} f JOIN {base} m USING (doc_id)
  WHERE f.i <= len(m.posu)
),
{name}_out AS (
  SELECT f.doc_id, f.fr AS freq
  FROM {name} f JOIN {base} m USING (doc_id)
  WHERE f.i = len(m.posu) + 1
)"""
