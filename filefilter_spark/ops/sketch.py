"""Sketch-based profiling operators — sub-shuffle summaries for 100 TB
corpus statistics.

The reference has no sketch tier (its profiling is plain SQL over the
embedded engine); this module adds the summaries a web-scale pipeline
actually runs: heavy-hitter tokens without shuffling the full token
multiset. The design rule matches the rest of the dedup tier: a
PROBABILISTIC structure generates candidates cheaply, then an EXACT
bounded pass restores engine-checkable correctness — so the operator
still carries a plain-SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from filefilter_spark.ops.text import tokens


def _mg_update(counters: dict, item: str, capacity: int) -> bool:
    """One Misra-Gries update: increment if tracked, insert if room,
    else decrement everything (dropping zeros). Returns True when a
    decrement happened — an eviction-free summary is EXACT counts."""
    if item in counters:
        counters[item] += 1
        return False
    if len(counters) < capacity:
        counters[item] = 1
        return False
    dead = []
    for k in counters:
        counters[k] -= 1
        if counters[k] == 0:
            dead.append(k)
    for k in dead:
        del counters[k]
    return True


def _mg_trim(counters: dict, capacity: int) -> tuple[dict, bool]:
    """Standard Misra-Gries merge trim: if more than ``capacity``
    counters survive a summary merge, subtract the (capacity+1)-th
    largest count from all and drop non-positives. Keeps ≤ capacity
    entries and preserves the bound (any absent token's true count
    ≤ N/capacity). Returns (trimmed, did_trim) — a trim counts as an
    eviction for the exactness proof."""
    if len(counters) <= capacity:
        return counters, False
    kth = sorted(counters.values(), reverse=True)[capacity]
    return {t: c - kth for t, c in counters.items() if c > kth}, True


def frequent_tokens(
    df: DataFrame,
    k: int = 10,
    capacity: int = 256,
    text_col: str = "text",
    tree_threshold: int = 64,
) -> DataFrame:
    """EXACT top-k most frequent tokens, computed the 100 TB way:

    1. **Sketch pass** (corpus never shuffles): each partition folds
       its token stream into a Misra-Gries summary of ``capacity``
       counters (mapInPandas). Past ``tree_threshold`` partitions an
       intermediate repartition(√P) merge level folds ~√P partials each
       (the standard MG merge: sum counts, then subtract the
       (capacity+1)-th largest and drop non-positives — preserves the
       N/capacity bound), so once evictions occur driver traffic is
       O(√P × capacity) instead of O(P × capacity). That merge level
       does shuffle — but only the ≤capacity+2-row partials (a
       near-free repartition that buys full P-way fold parallelism;
       rationale at the call site below), never the token stream. Eviction-free
       summaries are never trimmed — they hold EXACT complete counts
       (the vocabulary simply fits), and completeness is what lets
       small-vocab corpora skip the proof bound; their driver traffic
       is the true vocab size. The candidate set — and the recount
       broadcast below — is bounded by max(k, capacity) either way.
    2. **Exact recount** (bounded shuffle): only the sketch's candidate
       tokens are re-counted exactly — the aggregation's input is the
       candidates' postings, not the full token multiset.
    3. **Exactness proof**: Misra-Gries guarantees any token absent
       from the merged summary has true frequency ≤ N/capacity. If the
       k-th candidate's exact count exceeds that bound, no missing
       token can displace it and the top-k is PROVABLY exact — which
       is what lets this op carry a plain ``GROUP BY ... LIMIT k``
       oracle. Otherwise the data is too flat for the capacity and the
       op raises with the capacity that would have sufficed, instead
       of silently returning a maybe-wrong answer.

    Returns ``(tok, n)``, ordered by (n desc, tok) — deterministic
    ties. Compare: the plain exact top-k shuffles every token
    occurrence; this shuffles only ~capacity postings plus a
    per-partition summary. capacity ≫ k is cheap insurance (256
    counters per partition is nothing) and loosens the proof bound
    linearly.
    """
    import pandas as pd

    tok_rows = df.select(F.explode(tokens(text_col)).alias("tok"))

    def fold(batches):
        counters: dict = {}
        n = 0
        evicted = False
        for b in batches:
            col = b["tok"]
            n += len(col)
            for t in col:
                evicted |= _mg_update(counters, t, capacity)
        if n:
            toks = list(counters) + [None] + ([None] if evicted else [])
            cnts = list(counters.values()) + [n] + ([-1] if evicted else [])
            yield pd.DataFrame({"tok": toks, "cnt": cnts})

    def merge_fold(batches):
        merged: dict = {}
        total = 0
        evicted = False
        for b in batches:
            for tok, cnt in zip(b["tok"], b["cnt"]):
                if tok is None:
                    if cnt == -1:
                        evicted = True
                    else:
                        total += int(cnt)
                else:
                    merged[tok] = merged.get(tok, 0) + int(cnt)
        # Trim only once evictions have occurred: an eviction-free
        # union holds EXACT counts and must stay complete (that is
        # what lets small-vocab corpora skip the proof bound); once
        # any partition evicted, the proof path needs only the
        # N/capacity bound, which the MG trim preserves.
        if evicted:
            merged, _ = _mg_trim(merged, capacity)
        if total or merged:
            toks = list(merged) + [None] + ([None] if evicted else [])
            cnts = list(merged.values()) + [total] + ([-1] if evicted else [])
            yield pd.DataFrame({"tok": toks, "cnt": cnts})

    partial_df = tok_rows.mapInPandas(fold, "tok string, cnt long")
    n_parts = tok_rows.rdd.getNumPartitions()
    if n_parts > tree_threshold:
        # Tree fan-in via repartition, NOT coalesce: coalesce is a
        # narrow dependency, so it would collapse the corpus-sized
        # scan+tokenize+MG fold itself down to √P tasks. The partials
        # are tiny (≤ capacity+2 rows each), so a shuffle of them is
        # nearly free — repartition puts a stage boundary in, keeping
        # the fold at full P-way parallelism while the driver still
        # sees only O(√P × capacity) rows.
        import math

        partial_df = partial_df.repartition(
            max(1, int(math.ceil(math.sqrt(n_parts))))
        ).mapInPandas(merge_fold, "tok string, cnt long")
    partials = partial_df.collect()
    merged: dict = {}
    total = 0
    any_evicted = False
    for row in partials:
        if row["tok"] is None:
            if row["cnt"] == -1:
                any_evicted = True
            else:
                total += row["cnt"]
        else:
            # Merging MG summaries by summing tracked counts keeps the
            # superset guarantee: a token absent from EVERY partial has
            # per-partition freq ≤ n_p/capacity, which sums to
            # ≤ N/capacity overall.
            merged[row["tok"]] = merged.get(row["tok"], 0) + row["cnt"]
    if any_evicted:
        merged, _ = _mg_trim(merged, capacity)

    if not merged:
        if any_evicted:
            # Evictions wiped every counter (e.g. an all-distinct token
            # stream thrashing the summary): the true top-k is unknown
            # and an empty answer would be a silent lie.
            raise ValueError(
                f"top-{k} not provable at capacity {capacity}: evictions "
                "emptied the summary; retry with capacity > the distinct "
                "token count"
            )
        return tok_rows.groupBy("tok").count().limit(0).selectExpr(
            "tok", "count AS n"
        )

    candidates = sorted(merged, key=lambda t: (-merged[t], t))
    if not any_evicted:
        # Eviction-free ⇒ merged counts are exact AND complete, so the
        # top-k is already decided here; only those k tokens need the
        # (re)count that feeds the returned DataFrame.
        candidates = candidates[:k]
    # Broadcast-join the candidate set rather than embedding it as an
    # isin() literal: the literal would bloat the plan (and its codegen)
    # linearly in candidate count, while a broadcast hash join keeps
    # the recount a streaming O(1)-probe scan. ≤ max(k, capacity) rows,
    # so the broadcast is bytes.
    cand_df = df.sparkSession.createDataFrame(
        [(t,) for t in candidates], "tok string"
    )
    exact = (
        tok_rows.join(F.broadcast(cand_df), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(k)
    )
    rows = exact.collect()
    bound = total / capacity
    # Proof obligation: every token NOT in the sketch has true count
    # <= bound — but only when some partition actually EVICTED. An
    # eviction-free run means every partial held exact counts, so the
    # merged summary covers every token and the top-k is exact however
    # small the vocabulary (fewer distinct tokens than k is then a
    # correct short answer, not a failure). With evictions: k full
    # ranks must beat the bound, or (fewer candidates than k) the
    # bound itself must rule out any unseen token.
    if any_evicted:
        provable = rows[k - 1]["n"] > bound if len(rows) >= k else bound < 1
        if not provable:
            import math

            if len(rows) >= k:
                hint = f"retry with capacity >= {math.ceil(total / rows[k - 1]['n']) + 1}"
            else:
                hint = (
                    f"fewer than {k} candidates survived eviction — "
                    "retry with capacity > the distinct token count"
                )
            raise ValueError(
                f"top-{k} not provable at capacity {capacity}: bound "
                f"N/capacity = {bound:.0f} not beaten; {hint}"
            )
    out = df.sparkSession.createDataFrame(rows, "tok string, n long")
    return out.orderBy(F.desc("n"), F.asc("tok"))
