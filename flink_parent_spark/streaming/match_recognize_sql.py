"""SQL MATCH_RECOGNIZE clause: parse + execute against the CEP engine.

Reference: Calcite's MATCH_RECOGNIZE grammar wired through
StreamExecMatch.scala:68 / MatchCodeGenerator.scala into flink-cep. Here the
clause is parsed with a small recognizer and DEFINE predicates are evaluated
BY CATALYST as boolean columns before matching — SQL expression semantics
stay Spark's, the Python matcher only reads precomputed booleans (and so
stays off the per-predicate hot path).

Supported clause surface:

    MATCH_RECOGNIZE (
      PARTITION BY k [, ...]
      ORDER BY ts
      [MEASURES ... [ONE ROW PER MATCH]]
      [AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO FIRST v | TO LAST v]
      PATTERN ( A B+ C? [D*] [{- X -}] ) | PATTERN ( PERMUTE (A, B, ...) )
      [WITHIN INTERVAL 'n' unit]
      [SUBSET U = (A, B) [, ...]]
      DEFINE A AS <sql bool expr>, B AS <sql bool expr> [, ...]
    )

Stage-qualified references (A.col) normalize to bare columns — same-row
semantics. PREV(X.col[, n]) in DEFINE is rewritten (batch mode) to a
Catalyst `LAG(col, n) OVER (PARTITION BY keys ORDER BY order, id)` window
expression — partition navigation stays JVM-side (whole-stage codegen),
and because the LAG window hash-partitions on the same keys as the
matcher's groupBy, Catalyst reuses one exchange. In streaming mode PREV
compiles to matcher-side MatchCtx.prev navigation instead, with the
watermark-held operator retaining max-offset rows of navigation context
past its GC frontier so PREV can reach behind a completed match. DEFINE
conditions using match-state navigation (FIRST/LAST over a pattern
variable, NEXT lookahead) cannot be precomputed per-row; those are
compiled by `_compile_nav_predicate` into MatchCtx predicates evaluated
inside the matcher."""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, functions as F

from flink_parent_spark.streaming.cep import AfterMatchSkip, Pattern, cep_pattern

_SECTION_RE = re.compile(
    r"PARTITION\s+BY\s+(?P<part>[\w,\s]+?)\s+ORDER\s+BY\s+(?P<order>\w+)"
    r"(?:\s+MEASURES\s+(?P<measures>.*?))?"
    r"(?:\s+(?P<per_match>ONE\s+ROW\s+PER\s+MATCH|ALL\s+ROWS\s+PER\s+MATCH))?"
    r"(?:\s+AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW"
    r"|TO\s+FIRST\s+\w+|TO\s+LAST\s+\w+))?"
    r"\s+PATTERN\s*\(\s*(?P<pattern>(?:PERMUTE\s*\([^)]*\)|[^)])+)\)"
    r"(?:\s+WITHIN\s+INTERVAL\s+'(?P<wn>[\d.]+)'\s+(?P<wu>\w+))?"
    r"(?:\s+SUBSET\s+(?P<subset>(?:\w+\s*=\s*\([^)]*\)\s*,?\s*)+))?"
    r"\s+DEFINE\s+(?P<define>.+)$",
    re.IGNORECASE | re.DOTALL,
)

# SUBSET entry: U = (A, B)
_SUBSET_RE = re.compile(r"(\w+)\s*=\s*\(([^)]*)\)")

# MEASURES entry: FIRST(S.col) | LAST(S.col) | COUNT(S.*) | S.col, AS alias
_MEASURE_RE = re.compile(
    r"^\s*(?:(?P<fn>FIRST|LAST|COUNT)\s*\(\s*)?(?P<stage>\w+)\.(?P<col>\w+|\*)\s*\)?"
    r"\s+AS\s+(?P<alias>\w+)\s*$",
    re.IGNORECASE,
)

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
}


_SQL_KEYWORDS = {"and", "or", "not", "true", "false", "null"}


def _compile_nav_predicate(expr: str):
    """Compile a DEFINE condition containing match-state navigation
    (FIRST/LAST over a pattern variable, optionally PREV/NEXT) into a
    MatchCtx predicate.

    Reference: MatchCodeGenerator.scala generates code against the CEP
    IterativeCondition context for exactly these calls; here a restricted
    SQL-expression grammar (comparisons, arithmetic, AND/OR/NOT, literals)
    is translated to a Python expression over (row, ctx). NULL from
    navigation past the available rows makes the condition FALSE (SQL
    three-valued logic collapses to false at the WHERE boundary)."""
    # protect string literals from identifier/operator rewriting
    literals: list[str] = []

    def stash(g: re.Match) -> str:
        literals.append(g.group(0))
        return f"\x00{len(literals) - 1}\x00"

    e = re.sub(r"'[^']*'", stash, expr)

    e = re.sub(
        r"\b(PREV|NEXT)\s*\(\s*(?:\w+\.)?(\w+)\s*(?:,\s*(\d+))?\s*\)",
        lambda g: f'c.{g.group(1).lower()}("{g.group(2)}", {g.group(3) or 1})',
        e,
        flags=re.IGNORECASE,
    )
    e = re.sub(
        r"\b(FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*\)",
        lambda g: f'c.{g.group(1).lower()}("{g.group(2)}", "{g.group(3)}")',
        e,
        flags=re.IGNORECASE,
    )
    # qualified stage refs (A.col) -> current-row access (same-row semantics)
    e = re.sub(r"\b(?!c\.)(\w+)\.(\w+)\b", r'r["\2"]', e)
    e = e.replace("<>", "!=")
    e = re.sub(r"(?<![<>!=])=(?!=)", "==", e)

    # bare identifiers -> row refs; keep keywords / our locals / numbers
    def ident(g: re.Match) -> str:
        w = g.group(0)
        lw = w.lower()
        if lw in _SQL_KEYWORDS:
            return {"true": "True", "false": "False", "null": "None"}.get(lw, lw)
        if w in ("r", "c") or w.isdigit():
            return w
        return f'r["{w}"]'

    e = re.sub(r"(?<![\w\".\x00])[A-Za-z_]\w*(?![\w\"(])", ident, e)
    for i, lit in enumerate(literals):
        e = e.replace(f"\x00{i}\x00", lit)

    code = compile(e, "<define-nav>", "eval")

    def pred(r, c, _code=code):
        try:
            v = eval(_code, {"__builtins__": {}}, {"r": r, "c": c})  # noqa: S307
        except TypeError:  # comparison with NULL navigation -> unknown -> false
            return False
        return bool(v) if v is not None else False

    return pred


def match_recognize_sql(
    df: DataFrame, clause: str, id_col: str, streaming: bool = False
) -> DataFrame:
    """Execute a MATCH_RECOGNIZE clause body over df. Output: one row per
    matched event (key cols, id, match_id, stage, seq, event_ts).

    streaming=True runs the match in the watermark-held streaming CEP
    operator (StreamExecMatch.scala's deployment mode — `df` must be a
    streaming DataFrame with a watermark on the ORDER BY column). The
    full clause set runs in that mode: ONE ROW PER MATCH + MEASURES emit
    the single measures row when the match finalizes under the watermark,
    `{- -}` output exclusion and PERMUTE alternation run in the held
    operator, and DEFINE may use PREV (compiled to matcher-side
    MatchCtx.prev physical navigation, with the operator retaining
    max-offset consumed rows as navigation context past its GC
    frontier)."""
    m = _SECTION_RE.search(clause.strip())
    if not m:
        raise ValueError("unsupported MATCH_RECOGNIZE clause shape")
    partition_by = [c.strip() for c in m.group("part").split(",") if c.strip()]
    order_by = m.group("order").strip()
    skip = AfterMatchSkip.SKIP_PAST_LAST
    if m.group("skip"):
        s = re.sub(r"\s+", " ", m.group("skip").upper()).strip()
        if s == "TO NEXT ROW":
            skip = AfterMatchSkip.SKIP_TO_NEXT
        elif s.startswith("TO FIRST "):
            skip = AfterMatchSkip.skip_to_first(m.group("skip").split()[-1])
        elif s.startswith("TO LAST "):
            skip = AfterMatchSkip.skip_to_last(m.group("skip").split()[-1])
    tokens = m.group("pattern").split()
    within = None
    if m.group("wn"):
        unit = m.group("wu").lower().rstrip("s")
        within = dt.timedelta(seconds=float(m.group("wn")) * _UNIT_SECONDS[unit])

    # DEFINE A AS expr, B AS expr  (split on commas at top parenthesis level)
    defines: dict[str, str] = {}
    depth, cur, parts = 0, [], []
    for ch in m.group("define"):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    for p in parts:
        dm = re.match(r"\s*(?P<n>\w+)\s+AS\s+(?P<e>.+)", p, re.IGNORECASE | re.DOTALL)
        if not dm:
            raise ValueError(f"bad DEFINE entry: {p!r}")
        defines[dm.group("n")] = dm.group("e").strip()

    # evaluate DEFINE predicates as Catalyst boolean columns
    over = (
        f"OVER (PARTITION BY {', '.join(partition_by)} "
        f"ORDER BY {order_by}, {id_col})"
    )

    def rewrite_prev(expr: str) -> str:
        # PREV(X.col[, n]) -> LAG(col, n) OVER (partition, order) — SQL
        # partition navigation, evaluated by Catalyst ahead of the matcher
        return re.sub(
            r"\bPREV\s*\(\s*(?:\w+\.)?(\w+)\s*(?:,\s*(\d+))?\s*\)",
            lambda g: f"LAG({g.group(1)}, {g.group(2) or 1}) {over}",
            expr,
            flags=re.IGNORECASE,
        )

    work = df
    pred_cols: dict[str, str] = {}
    nav_preds: dict[str, object] = {}
    # PREV() is physical partition navigation (can reach rows BEHIND the
    # match, Calcite/Flink semantics). Batch mode precomputes it as a
    # Catalyst LAG window (JVM-side); streaming mode compiles it into a
    # matcher-side MatchCtx.prev navigation instead and tells the
    # watermark-held operator to retain max-offset rows of navigation
    # context past its GC frontier (nav_prev_depth below).
    nav_prev_depth = 0
    if streaming:
        for expr in defines.values():
            for g in re.finditer(
                r"\bPREV\s*\(\s*(?:\w+\.)?\w+\s*(?:,\s*(\d+))?\s*\)",
                expr,
                re.IGNORECASE,
            ):
                nav_prev_depth = max(nav_prev_depth, int(g.group(1) or 1))
    for name, expr in defines.items():
        needs_nav = bool(
            re.search(r"\b(FIRST|LAST|NEXT)\s*\(", expr, re.IGNORECASE)
        ) or (streaming and re.search(r"\bPREV\s*\(", expr, re.IGNORECASE))
        if needs_nav:
            # match-state / physical navigation: needs the matcher's
            # MatchCtx — cannot precompute as a Catalyst column
            nav_preds[name] = _compile_nav_predicate(expr)
            continue
        bare = re.sub(r"\b\w+\.(\w+)", r"\1", rewrite_prev(expr))
        col = f"__mr_{name}"
        work = work.withColumn(col, F.expr(bare))
        pred_cols[name] = col

    # SUBSET U = (A, B): union variables usable in MEASURES navigation
    # (Calcite SqlMatchRecognize SUBSET clause / Flink MatchRecognizeITCase)
    subsets: dict[str, list[str]] = {}
    if m.group("subset"):
        for sm in _SUBSET_RE.finditer(m.group("subset")):
            subsets[sm.group(1)] = [
                v.strip() for v in sm.group(2).split(",") if v.strip()
            ]

    def attach_pred(p: Pattern, name: str) -> Pattern:
        if name in nav_preds:
            return p.where(nav_preds[name])
        if name in pred_cols:
            c = pred_cols[name]
            # NULL (None/NaN) from e.g. LAG past the partition edge is FALSE
            return p.where(
                lambda r, c=c: r[c] is not None and r[c] == r[c] and bool(r[c])
            )
        return p  # undefined variable matches any row (SQL default)

    # PERMUTE(A, B, ...): Calcite expands to the alternation of all
    # orderings with the declared order preferred — built here as one
    # pattern per permutation, tried leftmost-first by find_matches_any.
    pm = re.match(
        r"^PERMUTE\s*\(([^)]*)\)$", m.group("pattern").strip(), re.IGNORECASE
    )
    alternatives: list[Pattern] = []
    excluded: set[str] = set()
    if pm:
        import itertools  # noqa: PLC0415

        pvars = [v.strip() for v in pm.group(1).split(",") if v.strip()]

        def chain(order: tuple[str, ...]) -> Pattern:
            p: Pattern | None = None
            for name in order:
                p = Pattern.begin(name) if p is None else p.next(name)
                p = attach_pred(p, name)
            return p.within(within) if within is not None else p

        variants = [chain(o) for o in itertools.permutations(pvars)]
        pat, alternatives = variants[0], variants[1:]
    else:
        # SQL-standard contiguity: the pattern is a regex over CONSECUTIVE
        # rows (Calcite/Flink semantics) — gaps must be written as explicit
        # catch-all stages, e.g. PATTERN (V {- X*? -} P). `{- ... -}` is
        # output exclusion: those stages match rows but are not emitted.
        # Quantifiers are greedy by default; a trailing `?` (`*?`, `+?`)
        # makes them reluctant.
        pat = None
        in_exclusion = False
        for token in tokens:
            if token == "{-":
                in_exclusion = True
                continue
            if token == "-}":
                in_exclusion = False
                continue
            tm = re.match(r"^(?P<name>\w+)(?P<suf>\+\??|\*\??|\?)?$", token)
            if not tm:
                raise ValueError(f"bad PATTERN token: {token!r}")
            name, suffix = tm.group("name"), tm.group("suf") or ""
            if in_exclusion:
                excluded.add(name)
            pat = Pattern.begin(name) if pat is None else pat.next(name)
            pat = attach_pred(pat, name)
            if suffix.startswith("+"):
                # SQL MATCH_RECOGNIZE quantifiers bind consecutive rows
                pat = pat.one_or_more().consecutive()
                if suffix != "+?":
                    pat = pat.greedy()
            elif suffix.startswith("*"):
                pat = pat.times(0, None).consecutive()
                pat._stages[-1].max_times = -1
                pat._stages[-1].greedy = suffix != "*?"
            elif suffix == "?":
                pat = pat.optional()
        if within is not None:
            pat = pat.within(within)

    one_row = bool(m.group("per_match")) and "ONE" in m.group("per_match").upper()
    measures_src = m.group("measures")
    if streaming and not (one_row and measures_src):
        # streaming clause set completed (StreamExecMatch.scala:68 parity):
        # {- -} exclusion and PERMUTE run in the watermark-held operator;
        # ONE ROW PER MATCH + MEASURES takes the emit-at-finalization path
        # below.
        from flink_parent_spark.streaming.cep import (  # noqa: PLC0415
            cep_pattern_stream_watermarked,
        )

        return cep_pattern_stream_watermarked(
            work, pat, partition_by, order_by, id_col, skip,
            exclude=frozenset(excluded), alternatives=alternatives,
            nav_prev_depth=nav_prev_depth,
        )
    if not (one_row and measures_src):
        return cep_pattern(
            work, pat, partition_by, order_by, id_col, skip,
            exclude=frozenset(excluded), alternatives=alternatives,
        )

    # ONE ROW PER MATCH with MEASURES: run the matcher per key and emit one
    # aggregated row per match.
    measures = []
    for entry in measures_src.split(","):
        mm = _MEASURE_RE.match(entry)
        if not mm:
            raise ValueError(f"unsupported MEASURES entry: {entry!r}")
        measures.append(
            (
                (mm.group("fn") or "FIRST").upper(),
                mm.group("stage"),
                mm.group("col"),
                mm.group("alias"),
            )
        )

    import pandas as pd  # noqa: PLC0415

    dtypes = dict(work.dtypes)
    out_fields = [f"`{c}` {dtypes[c]}" for c in partition_by]
    out_fields.append("`match_id` bigint")
    for fn, _stage, col, alias in measures:
        out_fields.append(
            f"`{alias}` bigint" if fn == "COUNT" else f"`{alias}` {dtypes[col]}"
        )
    out_schema = ", ".join(out_fields)
    cols = list(work.columns)

    def measures_of(match, rows_by_idx):
        rec = {}
        for fn, stage, col, alias in measures:
            members = subsets.get(stage)
            staged = [
                rows_by_idx[idx]
                for s, idx in match
                if (s in members if members else s == stage)
            ]
            if fn == "COUNT":
                rec[alias] = len(staged)
            elif not staged:
                rec[alias] = None
            elif fn == "LAST":
                rec[alias] = staged[-1][col]
            else:  # FIRST / bare S.col
                rec[alias] = staged[0][col]
        return rec

    if streaming:
        # ONE ROW PER MATCH + MEASURES on the watermark-held path: the
        # single measures row is emitted when the match finalizes (its
        # growable tail is closed per the watermark) — the reference's
        # StreamExecMatch output contract.
        from flink_parent_spark.streaming.cep import (  # noqa: PLC0415
            cep_pattern_stream_watermarked,
        )

        def emit(match, sealed, match_ordinal):
            rec = {k: sealed[match[0][1]][k] for k in partition_by}
            rec["match_id"] = match_ordinal
            rec.update(measures_of(match, sealed))
            return [rec]

        return cep_pattern_stream_watermarked(
            work, pat, partition_by, order_by, id_col, skip,
            alternatives=alternatives,
            emit=emit,
            emit_schema_suffix=", ".join(out_fields[len(partition_by):]),
            emit_columns=["match_id", *[a for *_, a in measures]],
            nav_prev_depth=nav_prev_depth,
        )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_by, id_col])
        rows = pdf[cols].to_dict("records")
        if alternatives:
            from flink_parent_spark.streaming.cep import (  # noqa: PLC0415
                find_matches_any,
            )

            matches = find_matches_any([pat, *alternatives], rows, order_by, skip)
        else:
            matches = pat.find_matches(rows, order_by, skip)
        recs = []
        for mid, match in enumerate(matches):
            rec = {k: rows[match[0][1]][k] for k in partition_by}
            rec["match_id"] = mid
            rec.update(measures_of(match, rows))
            recs.append(rec)
        return pd.DataFrame(
            recs, columns=[*partition_by, "match_id", *[a for *_, a in measures]]
        )

    return work.groupBy(*partition_by).applyInPandas(per_key, out_schema)
