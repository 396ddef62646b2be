"""TermAutomatonQuery (``sandbox/.../TermAutomatonQuery.java``): an
automaton over token positions — the "graph phrase" query that subsumes
synonym graphs, optional tokens and wildcard (ANY) gaps.

Each transition consumes exactly one token position; a document matches
when some accepting path aligns with consecutive positions. The automaton
must be ACYCLIC (the practical shape — Lucene builds these from token
graphs); matching lowers to `longest-path` rounds of position equi-joins:

- the frontier relation holds (doc_id, start, nxt, state) = "a partial
  path from `start` has consumed positions start..nxt-1 and sits in
  `state`";
- a term transition extends the frontier by joining the posting positions
  of its label at position `nxt`;
- an ANY transition joins the doclens table (positions are dense 0..len-1,
  so "any token at nxt" == nxt < length);
- rows whose state is accepting emit the interval [start, nxt-1].

Everything is unions of equi-joins over the same exploded position
relation the phrase operators use — JVM-side, no Python matching loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["TermAutomaton", "automaton_matches", "automaton_count"]

ANY = None  # transition label matching any single token


@dataclass(frozen=True)
class TermAutomaton:
    """transitions: (from_state, to_state, label) with label a term string
    or ANY (None); state 0 is initial; `accept` holds accepting states."""

    transitions: tuple[tuple[int, int, str | None], ...]
    accept: frozenset[int]

    def __post_init__(self):
        # verify acyclic (defines the join-round bound) via Kahn's order
        states = {0} | {s for s, t, _ in self.transitions for s in (s, t)}
        out = {s: [] for s in states}
        indeg = {s: 0 for s in states}
        for s, t, _ in self.transitions:
            out[s].append(t)
            indeg[t] += 1
        queue = [s for s in states if indeg[s] == 0]
        seen = 0
        while queue:
            s = queue.pop()
            seen += 1
            for t in out[s]:
                indeg[t] -= 1
                if indeg[t] == 0:
                    queue.append(t)
        if seen != len(states):
            raise ValueError("TermAutomaton must be acyclic")

    def longest_path(self) -> int:
        depth = {0: 0}
        # topological relaxation (transitions are few; O(V*E) fine)
        changed = True
        n = 0
        while changed:
            changed = False
            n += 1
            if n > len(self.transitions) + 2:
                break
            for s, t, _ in self.transitions:
                if s in depth and depth.get(t, -1) < depth[s] + 1:
                    depth[t] = depth[s] + 1
                    changed = True
        return max(depth.values(), default=0)


def automaton_matches(searcher, auto: TermAutomaton) -> DataFrame:
    """(doc_id, start, end) distinct accepted intervals, live docs only."""
    field = searcher.index.config.field_name
    terms = sorted({t for _, _, t in auto.transitions if t is not None})
    if not terms:
        raise NotImplementedError("automaton needs at least one term label")
    pos = (
        searcher._decoded(field, F.col("term").isin(terms), with_positions=True)
        .select("term", "doc_id", F.explode("positions").alias("p"))
    )
    lens = searcher.index.doclens.select("doc_id", F.col("length").alias("_len"))

    def step_parts(frontier: DataFrame, from_states: set[int]):
        parts = []
        reached = set()
        for s, t, label in auto.transitions:
            if s not in from_states:
                continue
            reached.add(t)
            f = frontier.filter(F.col("state") == s)
            if label is None:
                nxt = (
                    f.join(lens, "doc_id")
                    .filter(F.col("nxt") < F.col("_len"))
                    .select(
                        "doc_id",
                        "start",
                        (F.col("nxt") + 1).alias("nxt"),
                        F.lit(t).alias("state"),
                    )
                )
            else:
                nxt = (
                    f.join(
                        pos.filter(F.col("term") == label).select(
                            "doc_id", F.col("p").alias("_p")
                        ),
                        "doc_id",
                    )
                    .filter(F.col("_p") == F.col("nxt"))
                    .select(
                        "doc_id",
                        "start",
                        (F.col("nxt") + 1).alias("nxt"),
                        F.lit(t).alias("state"),
                    )
                )
            parts.append(nxt)
        return parts, reached

    # initial frontier, anchored at the EARLIEST term transition: walking
    # only ANY-labelled edges from the initial state yields states
    # reachable after d wildcard tokens; each term transition out of such
    # a state anchors on its label's real positions with start = p - d
    # (positions are dense 0..len-1, so the d preceding wildcard tokens
    # exist iff start >= 0). This replaces the old ANY-initial
    # explode(sequence(0, len-1)) over the whole doclens table — an
    # ANY-first automaton no longer materializes every position of every
    # doc (corpus-wide at 100 TB); a path with no term transition at all
    # cannot be anchored and raises, like the acyclicity check.
    any_depths: dict[int, set[int]] = {0: {0}}
    stack = [0]
    while stack:
        s_ = stack.pop()
        for a, b, label in auto.transitions:
            if a == s_ and label is None:
                new = {d + 1 for d in any_depths[s_]}
                before = any_depths.get(b, set())
                if not new <= before:
                    any_depths[b] = before | new
                    stack.append(b)
    if any(s_ in auto.accept for s_ in any_depths):
        raise NotImplementedError(
            "TermAutomaton accepting path with no term-labelled transition "
            "(all-ANY prefix reaching an accept state) cannot be anchored — "
            "add a term transition to every accepting path"
        )
    init_parts = []
    init_states = set()
    for s_, t, label in auto.transitions:
        if s_ not in any_depths or label is None:
            continue
        init_states.add(t)
        for d in sorted(any_depths[s_]):
            anchored = pos.filter(F.col("term") == label)
            if d > 0:
                anchored = anchored.filter(F.col("p") >= d)
            init_parts.append(
                anchored.select(
                    "doc_id",
                    (F.col("p") - F.lit(d)).alias("start"),
                    (F.col("p") + 1).alias("nxt"),
                    F.lit(t).alias("state"),
                )
            )
    frontier = init_parts[0]
    for p_ in init_parts[1:]:
        frontier = frontier.unionByName(p_)

    accepted: list[DataFrame] = []

    def take_accepts(f: DataFrame, states: set[int]):
        acc = states & auto.accept
        if acc:
            accepted.append(
                f.filter(F.col("state").isin([int(a) for a in acc])).select(
                    "doc_id", "start", (F.col("nxt") - 1).alias("end")
                )
            )

    states = init_states
    take_accepts(frontier, states)
    for _ in range(auto.longest_path()):
        parts, reached = step_parts(frontier, states)
        if not parts:
            break
        frontier = parts[0]
        for p_ in parts[1:]:
            frontier = frontier.unionByName(p_)
        states = reached
        take_accepts(frontier, states)

    if not accepted:
        return searcher.index.docs.select(
            "doc_id", F.lit(0).alias("start"), F.lit(0).alias("end")
        ).limit(0)
    out = accepted[0]
    for a in accepted[1:]:
        out = out.unionByName(a)
    return searcher._live(out.distinct())


def automaton_count(searcher, auto: TermAutomaton) -> DataFrame:
    """(doc_id, n_matches) — distinct accepted intervals per doc."""
    return (
        automaton_matches(searcher, auto)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
    )


def from_token_stream(tokens) -> TermAutomaton:
    """TokenStreamToTermAutomatonQuery.java:38 — build the automaton from
    an analyzed token stream with position overlaps: state i = "about to
    consume position i" (positions renumbered densely), each token adds a
    transition state[pos] -> state[pos + pos_length] labelled with its
    term, and a position HOLE (stopword gap) adds an ANY transition. The
    last position's state accepts.

    `tokens` is an iterable of (term, position) pairs or objects with
    .term/.position (the FilteredAnalyzer Token shape); overlapping
    tokens (posIncr 0 — synonyms, WDGF variants) become parallel
    transitions, which is exactly the graph-query role the reference
    converter serves."""
    pairs = []
    for t in tokens:
        if isinstance(t, tuple):
            term, pos = t
        else:
            term, pos = t.term, t.position
        pairs.append((str(term), int(pos)))
    if not pairs:
        raise ValueError("empty token stream")
    positions = sorted({p for _, p in pairs})
    # dense state numbering over OCCUPIED positions; a gap between
    # consecutive occupied positions inserts ANY transitions (the
    # reference maps posIncr>1 holes to setAccept-less ANY states)
    state_of = {}
    state = 0
    transitions: list[tuple[int, int, str | None]] = []
    prev = None
    for p in positions:
        if prev is not None:
            for _ in range(p - prev - 1):
                transitions.append((state, state + 1, ANY))
                state += 1
        state_of[p] = state
        state += 1
        prev = p
    final = state
    for term, p in pairs:
        s = state_of[p]
        nxt = final if p == positions[-1] else s + 1
        transitions.append((s, nxt, term))
    return TermAutomaton(tuple(transitions), frozenset({final}))
