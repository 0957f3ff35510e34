"""Changelog (retraction) layer: RowKind-tagged streams and
retraction-consuming aggregation.

Reference semantics (SURVEY §1.4 — "the single most important semantic to
replicate"):
- RowKind: flink-core/.../types/RowKind.java:25-52 — INSERT(+I),
  UPDATE_BEFORE(-U), UPDATE_AFTER(+U), DELETE(-D). Carried here as a
  `__rowkind` string column (Spark has no first-class changelog rows).
- Producing op: DeduplicateKeepLastRowFunction emits -U(old)/+U(new) pairs
  when a key's latest row changes — `changelog_keep_last` mirrors that with
  per-key state.
- Consuming op: GroupAggFunction.processElement
  (flink-table-runtime-blink/.../aggregate/GroupAggFunction.java:121)
  accumulates on +I/+U and retracts on -U/-D — `retract_aggregate` is the
  signed-sum formulation of exactly that: SUM(sign * x), COUNT = SUM(sign).

Composition model: a changelog-producing stateful op feeds downstream aggs
through the signed-sum rewrite. Signed sums are associative/commutative, so
the downstream agg is an ordinary Catalyst hash aggregate — retraction
support costs nothing extra at scale (no second stateful operator needed
for the batch-replay path; the streaming path chains through foreachBatch).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_parent_spark.streaming.stateful import _micros_double

ROWKIND_COL = "__rowkind"
INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE = "+I", "-U", "+U", "-D"


def rowkind_sign(kind: Column | None = None) -> Column:
    """+1 for +I/+U, -1 for -U/-D."""
    kind = kind if kind is not None else F.col(ROWKIND_COL)
    return F.when(kind.isin(INSERT, UPDATE_AFTER), F.lit(1)).otherwise(F.lit(-1))


def changelog_keep_last(
    sdf: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Keep-last dedup emitting a full changelog: first row per key emits
    +I; every later row (in order_col order) emits -U(previous) then
    +U(new). State: the current row per key (bounded)."""
    out_cols = list(dict.fromkeys([*key_cols, order_col, *payload_cols]))
    dt = dict(sdf.dtypes)
    out_schema = (
        ", ".join(f"`{c}` {dt[c]}" for c in out_cols) + f", `{ROWKIND_COL}` string"
    )
    state_schema = "cur struct<" + ", ".join(f"{c}: {dt[c]}" for c in out_cols) + ">"

    oi = out_cols.index(order_col)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np  # noqa: PLC0415

        cur: tuple | None = tuple(state.get[0]) if state.exists else None
        # hot loop (chain stage at volume): tuple rows + column-wise output
        # — no per-record dicts for the ~3 rows of changelog traffic each
        # input row produces at steady state
        out_lists: list[list] = [[] for _ in out_cols]
        rk: list[str] = []
        rk_append = rk.append
        for pdf in pdfs:
            sub = pdf[out_cols].sort_values(order_col, kind="stable")
            for row in sub.itertuples(index=False, name=None):
                if cur is None:
                    for li, x in zip(out_lists, row):
                        li.append(x)
                    rk_append(INSERT)
                elif row[oi] >= cur[oi]:
                    for li, x in zip(out_lists, cur):
                        li.append(x)
                    rk_append(UPDATE_BEFORE)
                    for li, x in zip(out_lists, row):
                        li.append(x)
                    rk_append(UPDATE_AFTER)
                else:
                    continue  # late row older than current version: ignored
                cur = row
        if cur is not None:
            # the state pickler rejects numpy scalars — unbox them
            state.update(
                (
                    tuple(
                        x.item() if isinstance(x, np.generic) else x
                        for x in cur
                    ),
                )
            )
        yield pd.DataFrame(
            {
                **dict(zip(out_cols, out_lists)),
                ROWKIND_COL: rk,
            },
            columns=[*out_cols, ROWKIND_COL],
        )

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def retract_aggregate(
    changelog: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, str] | None = None,
    count_alias: str = "n",
) -> DataFrame:
    """Retraction-consuming aggregate over a RowKind-tagged relation:
    COUNT and SUMs accumulate +1/+x for +I/+U and -1/-x for -U/-D.
    sum_cols: {output_alias: source_col}; sums go through decimal for the
    cross-engine determinism contract."""
    sign = rowkind_sign()
    aggs = [F.sum(sign).alias(count_alias)]
    for alias, src in (sum_cols or {}).items():
        aggs.append(
            F.sum((sign * F.col(src)).cast("decimal(30,6)")).cast("double").alias(alias)
        )
    out = changelog.groupBy(*group_cols).agg(*aggs)
    # groups whose net count dropped to zero were fully retracted away
    return out.filter(F.col(count_alias) > 0)


def normalize_step(cur, kind, new):
    """One step of the ChangelogNormalize state machine: given the current
    version (or None) and an incoming (RowKind, values), return
    (next_version, emissions) where each emission is (kind, values,
    emit_sub). Pure — shared by the stateful operator and the property
    tests so the tested rules ARE the shipped rules."""
    if kind in (INSERT, UPDATE_AFTER):
        if cur is None:
            return new, [(INSERT, new, 1)]
        return new, [(UPDATE_BEFORE, cur, 0), (UPDATE_AFTER, new, 1)]
    if kind == DELETE and cur is not None:
        return None, [(DELETE, cur, 1)]
    # DELETE of an absent key, or a source-side UPDATE_BEFORE: dropped
    return cur, []


def changelog_normalize(
    sdf: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    rowkind_col: str = ROWKIND_COL,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Ingest a FOREIGN changelog/upsert stream (the consuming side the
    reference exercises in ChangelogSourceITCase; runtime equivalent:
    ChangelogNormalizeOperator over an upsert source). Input rows carry a
    RowKind column produced elsewhere; per-key state is the current
    version, and the output is the normalized changelog:

    - +I/+U with no current version    -> +I(new)
    - +I/+U with a current version     -> -U(old), +U(new)
    - -D with a current version        -> -D(old); key becomes absent
    - -D with no current version       -> dropped (delete of absent key)
    - incoming -U                      -> dropped (normalize rebuilds
                                          update-before from its own state,
                                          so upsert sources need not send it)

    Emitted rows carry the triggering row's (order, tiebreak) position plus
    `emit_sub` (0 = the -U half, 1 = the +I/+U/-D half) so the changelog
    has a deterministic total order under replay. State: one row per key."""
    out_cols = list(dict.fromkeys([*key_cols, order_col, *value_cols]))
    if tiebreak_col and tiebreak_col not in out_cols:
        out_cols.append(tiebreak_col)
    dt = dict(sdf.dtypes)
    out_schema = (
        ", ".join(f"`{c}` {dt[c]}" for c in out_cols)
        + f", `{rowkind_col}` string, `emit_sub` int"
    )
    vschema = ", ".join(f"{c}: {dt[c]}" for c in value_cols)
    state_schema = f"cur struct<{vschema}>, present boolean"
    in_cols = [*out_cols, rowkind_col]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        cur = (
            dict(zip(value_cols, state.get[0]))
            if state.exists and state.get[1]
            else None
        )
        recs: list[dict] = []
        for pdf in pdfs:
            recs.extend(pdf[in_cols].to_dict("records"))
        recs.sort(
            key=lambda r: (r[order_col], r[tiebreak_col] if tiebreak_col else 0)
        )
        emitted: list[dict] = []

        def emit(rec: dict, kind: str, vals: dict, sub: int) -> None:
            row = {c: rec[c] for c in out_cols}
            row.update({c: vals[c] for c in value_cols})
            row[rowkind_col] = kind
            row["emit_sub"] = sub
            emitted.append(row)

        for rec in recs:
            new = {c: rec[c] for c in value_cols}
            cur, steps = normalize_step(cur, rec[rowkind_col], new)
            for kind, vals, sub in steps:
                emit(rec, kind, vals, sub)
        state.update(
            (
                tuple((cur or {}).get(c) for c in value_cols),
                cur is not None,
            )
        )
        yield pd.DataFrame(emitted, columns=[*out_cols, rowkind_col, "emit_sub"])

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def retract_join(
    left_cl: DataFrame,
    right_cl: DataFrame,
    key_cols: Sequence[str],
    left_payload: Sequence[str],
    right_payload: Sequence[str],
    order_col: str,
    rowkind_col: str = ROWKIND_COL,
    tiebreak_col: str | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Retraction-consuming streaming INNER join (the two-input
    StreamingJoinOperator over changelog inputs, re-derived): both sides
    carry RowKind; per join key the state holds each side's live-row
    multiset, and every input row emits join deltas against the OTHER
    side's current state — +I rows for an accumulate message, -D
    retractions for a retract message. Downstream, the net changelog
    (sum of +1/-1 per joined row) materializes to exactly the join of the
    two final states.

    State is the pair of live multisets per key — the same cost the
    reference pays (JoinRecordStateView per input). Rows are processed in
    (order_col, tiebreak) order for a deterministic replay trace.

    seq_col: optionally number each emitted delta per key with a
    monotone, RESTART-SAFE sequence (persisted counter) — the causal
    order Flink's per-key network channels guarantee implicitly. A
    downstream stateful consumer re-reading this changelog from files
    (the foreachBatch composition hop) must sort by it, or +I/-D pairs
    can scramble across the materialization.

    Out-of-order retractions ACROSS micro-batches (r12): when THIS
    operator's own inputs are file-replayed changelogs, a batch boundary
    can deliver a retract message a whole batch before its accumulate
    (per-batch ord-sorting cannot repair a cross-batch inversion). An
    unmatched retraction is held in a pending multiset in state and
    annihilates the matching accumulate on arrival — the row never joins
    — rather than being dropped and leaving a stale live row. The
    reference never sees this (per-key FIFO network channels); the
    parquet-hop composition model does."""
    lcols = list(dict.fromkeys([*key_cols, *left_payload]))
    rcols = list(dict.fromkeys([*key_cols, *right_payload]))
    ldt = dict(left_cl.dtypes)
    rdt = dict(right_cl.dtypes)
    from pyspark.sql import functions as F

    lsel = left_cl.select(
        *lcols,
        *[F.lit(None).cast(rdt[c]).alias(f"__r_{c}") for c in right_payload],
        F.col(order_col).alias("__ord"),
        *([F.col(tiebreak_col).alias("__tie")] if tiebreak_col else [F.lit(0).alias("__tie")]),
        F.col(rowkind_col).alias("__kind"),
        F.lit("L").alias("__side"),
    )
    rsel = right_cl.select(
        *key_cols,
        *[F.lit(None).cast(ldt[c]).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        F.col(order_col).alias("__ord"),
        *([F.col(tiebreak_col).alias("__tie")] if tiebreak_col else [F.lit(0).alias("__tie")]),
        F.col(rowkind_col).alias("__kind"),
        F.lit("R").alias("__side"),
    )
    both = lsel.unionByName(rsel)

    l_schema = ", ".join(f"`{c}` {ldt[c]}" for c in left_payload)
    r_schema = ", ".join(f"`{c}` {rdt[c]}" for c in right_payload)
    key_schema = ", ".join(f"`{c}` {ldt[c]}" for c in key_cols)
    out_schema = f"{key_schema}, {l_schema}, {r_schema}, `{rowkind_col}` string"
    if seq_col:
        out_schema += f", `{seq_col}` bigint"
    state_schema = (
        "lbuf array<struct<" + l_schema.replace("`", "") + ">>, "
        "rbuf array<struct<" + r_schema.replace("`", "") + ">>, "
        "emit_seq bigint, "
        "lpend array<struct<" + l_schema.replace("`", "") + ">>, "
        "rpend array<struct<" + r_schema.replace("`", "") + ">>"
    )
    in_cols = [*key_cols, *left_payload,
               *[f"__r_{c}" for c in right_payload], "__ord", "__tie",
               "__kind", "__side"]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        lbuf = [tuple(t) for t in (state.get[0] if state.exists else [])]
        rbuf = [tuple(t) for t in (state.get[1] if state.exists else [])]
        emit_seq = state.get[2] if state.exists else 0
        lpend = [tuple(t) for t in ((state.get[3] or []) if state.exists else [])]
        rpend = [tuple(t) for t in ((state.get[4] or []) if state.exists else [])]
        recs: list[dict] = []
        for pdf in pdfs:
            recs.extend(pdf[in_cols].to_dict("records"))
        # a retraction carries ITS ROW's original timestamp, so at an equal
        # (ord, tie) the accumulate message must process before the
        # retract of the same row (same causal convention as
        # streaming_retract_top_n's kind ranking)
        kind_rank = {INSERT: 0, UPDATE_AFTER: 1, UPDATE_BEFORE: 2, DELETE: 2}
        recs.sort(
            key=lambda r: (
                r["__ord"],
                r["__tie"],
                kind_rank.get(r["__kind"], 3),
            )
        )
        emitted: list[dict] = []
        keyd = dict(zip(key_cols, key))

        def emit(lvals, rvals, op):
            nonlocal emit_seq
            rec = {
                **keyd,
                **dict(zip(left_payload, lvals)),
                **dict(zip(right_payload, rvals)),
                rowkind_col: op,
            }
            if seq_col:
                rec[seq_col] = emit_seq
            emit_seq += 1
            emitted.append(rec)

        for rec in recs:
            acc = rec["__kind"] in (INSERT, UPDATE_AFTER)
            if rec["__side"] == "L":
                lv = tuple(rec[c] for c in left_payload)
                if acc:
                    if lv in lpend:
                        lpend.remove(lv)  # early retraction annihilates it
                    else:
                        lbuf.append(lv)
                        for rv in rbuf:
                            emit(lv, rv, INSERT)
                elif lv in lbuf:
                    lbuf.remove(lv)
                    for rv in rbuf:
                        emit(lv, rv, DELETE)
                else:
                    lpend.append(lv)  # retraction ahead of its accumulate
            else:
                rv = tuple(rec[f"__r_{c}"] for c in right_payload)
                if acc:
                    if rv in rpend:
                        rpend.remove(rv)
                    else:
                        rbuf.append(rv)
                        for lv in lbuf:
                            emit(lv, rv, INSERT)
                elif rv in rbuf:
                    rbuf.remove(rv)
                    for lv in lbuf:
                        emit(lv, rv, DELETE)
                else:
                    rpend.append(rv)
        state.update((lbuf, rbuf, emit_seq, lpend, rpend))
        yield pd.DataFrame(
            emitted,
            columns=[*key_cols, *left_payload, *right_payload, rowkind_col,
                     *([seq_col] if seq_col else [])],
        )

    return both.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_group_agg_changelog(
    sdf: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    order_col: str,
    tiebreak_col: str | None = None,
    count_alias: str = "n",
    sum_alias: str = "total",
) -> DataFrame:
    """Retraction-EMITTING unbounded group aggregation — the producing
    half of GroupAggFunction (flink-table-runtime-blink/.../aggregate/
    GroupAggFunction.java:121 sends UPDATE_BEFORE(old agg) +
    UPDATE_AFTER(new agg) downstream on every accumulate after the
    first). Per key: running COUNT and SUM; the first input row emits
    +I(agg), every later row emits -U(previous agg) then +U(new agg) —
    per-ROW emission granularity like the reference (no minibatch
    folding), so even a single replay batch produces the full retraction
    trace for downstream retract joins / retractable Top-N.

    The sum accumulates as integer micros (exact, order-independent,
    restart-safe — the engine's decimal-accumulation contract), surfaced
    as double."""
    from decimal import ROUND_HALF_UP, Decimal  # noqa: PLC0415

    dt = dict(sdf.dtypes)
    key_schema = ", ".join(f"`{c}` {dt[c]}" for c in key_cols)
    out_schema = (
        f"{key_schema}, `{count_alias}` bigint, `{sum_alias}` double, "
        f"`{ROWKIND_COL}` string, `__seq` bigint"
    )
    state_schema = "acc_micros bigint, cnt bigint"
    in_cols = list(
        dict.fromkeys(
            [*key_cols, value_col, order_col,
             *([tiebreak_col] if tiebreak_col else [])]
        )
    )
    _Q = Decimal("0.000001")

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        acc, cnt = (state.get if state.exists else (0, 0))
        frames = [pdf[in_cols] for pdf in pdfs]
        sort_cols = [order_col, tiebreak_col] if tiebreak_col else [order_col]
        # stable sort: the dict-based predecessor used list.sort, so ties
        # beyond (order, tiebreak) must keep arrival order
        batch = (
            pd.concat(frames).sort_values(sort_cols, kind="stable")
            if frames
            else pd.DataFrame(columns=in_cols)
        )
        # hot loop (2 emissions/row at volume): column-wise output build —
        # no per-record dicts — with dispatch names hoisted to locals.
        # __seq derives from the PERSISTED consumed-row count, so the
        # causal order stays monotone across micro-batches/restarts;
        # _micros_double keeps sums correctly rounded past 2^53 micros
        # (the sf0.1 hunt's double-rounding class).
        n_out: list[int] = []
        s_out: list[float] = []
        rk_out: list[str] = []
        seq_out: list[int] = []
        nap, sap, rap, qap = (
            n_out.append, s_out.append, rk_out.append, seq_out.append
        )
        dec, q, md = Decimal, _Q, _micros_double
        for v in batch[value_col]:
            if cnt > 0:
                nap(cnt)
                sap(md(acc))
                rap(UPDATE_BEFORE)
                qap(2 * cnt)
            acc += int(dec(float(v)).quantize(q, rounding=ROUND_HALF_UP) * 1_000_000)
            prev = cnt
            cnt += 1
            nap(cnt)
            sap(md(acc))
            rap(UPDATE_AFTER if prev else INSERT)
            qap(2 * prev + 1)
        state.update((acc, cnt))
        n = len(n_out)
        yield pd.DataFrame(
            {
                **{c: [k] * n for c, k in zip(key_cols, key)},
                count_alias: pd.Series(n_out, dtype="int64"),
                sum_alias: pd.Series(s_out, dtype="float64"),
                ROWKIND_COL: rk_out,
                "__seq": pd.Series(seq_out, dtype="int64"),
            },
            columns=[*key_cols, count_alias, sum_alias, ROWKIND_COL, "__seq"],
        )

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
