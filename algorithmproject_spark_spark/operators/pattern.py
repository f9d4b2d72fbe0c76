"""General fixed-length sequence-pattern matcher — MATCH_RECOGNIZE's
core, compiled to one window pass.

``queries/cep.py`` hand-compiles ONE pattern (error burst + recovery,
subsequence semantics). This operator is the general library form for
ANY fixed symbol list under STRICT CONTIGUITY over the relevant
substream — MATCH_RECOGNIZE's default `PATTERN (A B C)` semantics:

1. restrict each key's stream to rows matching ANY pattern symbol
   (the "relevant alphabet" — other event types are invisible to the
   pattern, like rows outside the PARTITION's pattern variables);
2. one (key)-partitioned, (ts, id)-ordered window; ``lead(k)`` reads
   the next k relevant rows' symbols and times;
3. a match starts at a row iff symbol_0 matches here, symbol_i
   matches at lead(i), and every step's time gap is within its
   bound — pure column predicates, map-side after the single keyed
   sort.

Cost: one shuffle of the RELEVANT rows (already filtered), window
state = the lead buffer (pattern length), per key. Arbitrary pattern
length k costs k-1 lead columns, never a join — contrast the naive
k-way self-join compilation, which shuffles the stream k times.

Semantics note: contiguity is over the FILTERED substream. For
subsequence-with-carried-closing-symbol patterns (skip irrelevant
symbols of the same alphabet), see queries/cep.py's technique of
riding a backward-min column through the lead.

Reference parity: none — no ordered-sequence analytics in the
reference; with queries/cep.py this completes the pattern family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def match_contiguous_pattern(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    symbols: list[Column],
    max_gaps_us: list[int],
) -> DataFrame:
    """Match starts for the pattern ``symbols[0] symbols[1] ...`` under
    strict contiguity over the relevant substream.

    ``symbols``: boolean Columns over the event row (evaluated before
    filtering; a row is RELEVANT iff any symbol matches it).
    ``max_gaps_us``: length ``len(symbols) - 1``; bound on
    ``t[i+1] - t[i]`` in micros.

    Returns one row per match: ``(key, t_start, t_end, span_us)``.
    """
    if len(symbols) < 2:
        raise ValueError("pattern needs at least 2 symbols")
    if len(max_gaps_us) != len(symbols) - 1:
        raise ValueError("need exactly len(symbols)-1 gap bounds")
    t = F.unix_micros(F.col(ts_col))
    sym_cols = [s.alias(f"__s{i}") for i, s in enumerate(symbols)]
    cond = F.col("__s0")
    for i in range(1, len(symbols)):
        cond = cond | F.col(f"__s{i}")
    relevant = events.select(
        F.col(key_col).alias("key"),
        t.alias("t"),
        F.col(order_col).alias("__o"),
        *sym_cols,
    ).filter(cond)
    w = Window.partitionBy("key").orderBy("t", "__o")
    led = relevant.select(
        "key",
        "t",
        *[F.col(f"__s{i}") for i in range(len(symbols))],
        *[
            F.lead(f"__s{i}", i).over(w).alias(f"__ls{i}")
            for i in range(1, len(symbols))
        ],
        *[
            F.lead("t", i).over(w).alias(f"__lt{i}")
            for i in range(1, len(symbols))
        ],
    )
    match = F.col("__s0")
    for i in range(1, len(symbols)):
        prev_t = F.col("t") if i == 1 else F.col(f"__lt{i - 1}")
        match = (
            match
            & F.coalesce(F.col(f"__ls{i}"), F.lit(False))
            & ((F.col(f"__lt{i}") - prev_t) <= F.lit(max_gaps_us[i - 1]))
        )
    last = f"__lt{len(symbols) - 1}"
    return led.filter(match).select(
        F.col("key"),
        F.col("t").alias("t_start"),
        F.col(last).alias("t_end"),
        (F.col(last) - F.col("t")).alias("span_us"),
    )


def match_skip_to_next(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    symbols: list[Column],
    max_gaps_us: list[int],
) -> DataFrame:
    """Match the pattern under SKIP-TILL-NEXT-MATCH (relaxed
    contiguity): events between steps are allowed; each step binds to
    the FIRST row matching its symbol strictly after the previous
    step's row in ``(ts, order)`` order (FlinkCEP ``followedBy``
    semantics — greedy, no branching; the explore-all-alternatives
    variant is ``followedByAny``/skip-till-any, deliberately not this
    operator: its match count is combinatorial and the greedy form is
    what funnels mean).

    A step's gap bound is checked against the bound row; because the
    first candidate minimizes the step time, exceeding the bound at
    step i+1's FIRST row does not imply failure for later anchors —
    but for THIS anchor the match fails (no backtracking), exactly the
    NFA-without-branching semantics. Deterministic: ties on ts break
    by ``order_col``.

    Shape: one shuffle of the relevant substream, then ``k-1``
    backward window passes over the SAME (key, ts desc, order desc)
    sort — pass ``i`` computes, per row, the first following
    ``symbols[i]`` row as a struct carrying the (already computed)
    rest-of-chain times, so the anchor row reads the whole binding
    from one nested column. Window state is a running min, O(1) per
    row; no lead buffer, no join, any pattern length.

    Returns one row per anchored match: ``(key, t_start, t_end,
    span_us)``.
    """
    k = len(symbols)
    if k < 2:
        raise ValueError("pattern needs at least 2 symbols")
    if len(max_gaps_us) != k - 1:
        raise ValueError("need exactly len(symbols)-1 gap bounds")
    t = F.unix_micros(F.col(ts_col))
    sym_cols = [s.alias(f"__s{i}") for i, s in enumerate(symbols)]
    cond = F.col("__s0")
    for i in range(1, k):
        cond = cond | F.col(f"__s{i}")
    df = events.select(
        F.col(key_col).alias("key"),
        t.alias("t"),
        F.col(order_col).alias("__o"),
        *sym_cols,
    ).filter(cond)
    # "strictly after in (t, __o) order" = the preceding rows of the
    # DESCENDING sort; running min over that frame finds the first
    # following occurrence, struct-ordered by (t, __o) so ties are
    # deterministic and the carried chain never affects the ordering
    w_desc = (
        Window.partitionBy("key")
        .orderBy(F.col("t").desc(), F.col("__o").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = None
    for i in range(k - 1, 0, -1):
        fields = [F.col("t").alias("t"), F.col("__o").alias("o")]
        if prev is not None:
            fields.append(F.col(prev).alias("nxt"))
        df = df.withColumn(
            f"__f{i}",
            F.min(F.when(F.col(f"__s{i}"), F.struct(*fields))).over(w_desc),
        )
        prev = f"__f{i}"
    # anchor rows: walk the nested chain for the step times
    step_t = []
    node = F.col("__f1")
    for i in range(1, k):
        step_t.append(node["t"])
        if i < k - 1:
            node = node["nxt"]
    match = F.col("__s0")
    prev_t = F.col("t")
    for i, st in enumerate(step_t):
        match = match & st.isNotNull() & (
            (st - prev_t) <= F.lit(max_gaps_us[i])
        )
        prev_t = st
    last_t = step_t[-1]
    return df.filter(match).select(
        "key",
        F.col("t").alias("t_start"),
        last_t.alias("t_end"),
        (last_t - F.col("t")).alias("span_us"),
    )
