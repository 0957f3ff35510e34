"""Group-window emit strategies: early-fire / late-fire / allowed lateness.

Reference: flink-table-planner-blink
.../plan/utils/WindowEmitStrategy.scala — the `table.exec.emit.*` config
surface that turns a group-window aggregate from emit-once-on-window-close
into an UPDATING stream: early firings emit periodic partial results
before the watermark closes the window (EventTimeTriggers.afterEndOfWindow
.withEarlyFirings(ProcessingTimeTriggers.every(delay))), late firings
re-emit corrected results for late-but-within-allowed-lateness rows
(.withLateFirings), and `produceUpdates` flips the changelog mode.

Spark-first mapping (no custom operator needed — Structured Streaming's
output modes ARE these trigger shapes):

- early-fire  -> `update` output mode: every micro-batch emits the CURRENT
  partial of each window the batch touched, before the watermark closes it.
  The early-fire DELAY maps to the micro-batch processing-time trigger
  interval (delay 0 = every-element in the reference = Spark's default
  as-fast-as-possible trigger).
- final on watermark -> the last update for a window arrives when its
  state is finalized by the watermark; with no early/late fire the plain
  `append` mode emits exactly once at that point (the reference's default
  AfterEndOfWindow trigger).
- late-fire within allowed lateness -> Spark fuses lateness into the
  watermark: `withWatermark(ts, allowed_lateness)` keeps window state open
  so late rows (within the delay) re-fire updated results per micro-batch
  in `update` mode. Flink keeps the two knobs separate (watermark controls
  the on-time firing, allowedLateness keeps state); the fused form
  produces the same update sequence with the on-time firing shifted to
  the fused watermark — documented divergence.
- beyond-lateness drop: Flink's WindowOperator compares a row against the
  watermark AT ARRIVAL and drops it immediately; Spark drops a late row
  only once its window state has been EVICTED, and eviction lags the
  watermark by one micro-batch — so a too-late row arriving in the very
  batch where its window would be evicted still merges (verified against
  vanilla Spark; with the state already evicted the drop is
  deterministic in both output modes). One-micro-batch divergence window,
  documented here and pinned in tests/test_emit_strategy.py.

Validation mirrors WindowEmitStrategy.checkValidation: session windows
reject emit strategies; late-fire requires positive allowed lateness;
negative delays rejected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

# Duration unit table — TimeUtils.parseDuration's unit labels (flink-core
# .../util/TimeUtils.java TimeUnit singular/plural/short forms), plus the
# compound form Spark's CalendarInterval accepts ("1 hour 30 minutes").
_UNIT_MS = {
    "ms": 1, "milli": 1, "millis": 1,
    "millisecond": 1, "milliseconds": 1,
    "s": 1000, "sec": 1000, "secs": 1000, "second": 1000, "seconds": 1000,
    "min": 60_000, "mins": 60_000, "minute": 60_000, "minutes": 60_000,
    "h": 3_600_000, "hour": 3_600_000, "hours": 3_600_000,
    "d": 86_400_000, "day": 86_400_000, "days": 86_400_000,
}

_SEGMENT_RE = re.compile(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*")


def duration_ms(value: str, key: str = "duration") -> int:
    """Parse a duration string to milliseconds. Accepts suffix form
    ('500ms', '2h'), long form ('2 hours', '1 d', '1 day'), compound form
    ('1 hour 30 minutes'), and a bare integer (milliseconds — Flink's
    TimeUtils default unit). Raises ValueError naming the offending
    key/value instead of a bare int()/dict-lookup failure."""
    v = value.strip()
    if not v:
        raise ValueError(f"{key}: empty duration string")
    if v.isdigit():
        return int(v)  # bare number = milliseconds (TimeUtils default)
    total = 0.0
    pos = 0
    for m in _SEGMENT_RE.finditer(v):
        if m.start() != pos:
            break
        unit = m.group(2).lower()
        mult = _UNIT_MS.get(unit)
        if mult is None:
            raise ValueError(
                f"{key}: unrecognized duration unit {m.group(2)!r} in "
                f"{value!r} (supported: {sorted(set(_UNIT_MS))})"
            )
        total += float(m.group(1)) * mult
        pos = m.end()
    if pos != len(v) or total == 0.0 and pos == 0:
        raise ValueError(
            f"{key}: cannot parse duration {value!r} (expected e.g. "
            "'500ms', '2 hours', '1 day', '1 hour 30 minutes')"
        )
    return int(total)


@dataclass(frozen=True)
class WindowEmitStrategy:
    """table.exec.emit.* parity (WindowEmitStrategy.scala:34-96)."""

    is_event_time: bool = True
    is_session_window: bool = False
    early_fire_enabled: bool = False
    early_fire_delay_ms: int | None = None
    late_fire_enabled: bool = False
    late_fire_delay_ms: int | None = None
    allow_lateness_ms: int = 0

    def __post_init__(self):
        # checkValidation() parity
        if self.is_session_window and (
            self.early_fire_enabled or self.late_fire_enabled
        ):
            raise ValueError(
                "Session window doesn't support EMIT strategy currently."
            )
        if (
            self.is_event_time
            and self.late_fire_enabled
            and self.allow_lateness_ms <= 0
        ):
            raise ValueError(
                "The 'AFTER WATERMARK' emit strategy requires positive "
                "allowed lateness."
            )
        if self.early_fire_enabled and (
            self.early_fire_delay_ms is None or self.early_fire_delay_ms < 0
        ):
            raise ValueError(
                "Early-fire delay should not be null or negative value when "
                "early-fire emit strategy is enabled."
            )
        if self.late_fire_enabled and (
            self.late_fire_delay_ms is None or self.late_fire_delay_ms < 0
        ):
            raise ValueError(
                "Late-fire delay should not be null or negative value when "
                "late-fire emit strategy is enabled."
            )

    @property
    def produce_updates(self) -> bool:
        """WindowEmitStrategy.produceUpdates: the aggregate becomes an
        updating stream (late trigger is ignored in processing time)."""
        if self.is_event_time:
            return self.early_fire_enabled or self.late_fire_enabled
        return self.early_fire_enabled

    @property
    def output_mode(self) -> str:
        return "update" if self.produce_updates else "append"

    @property
    def trigger_interval(self) -> str | None:
        """Micro-batch trigger realizing the early-fire delay; None = the
        default as-fast-as-possible trigger (delay 0 / every element)."""
        if self.early_fire_enabled and (self.early_fire_delay_ms or 0) > 0:
            return f"{self.early_fire_delay_ms} milliseconds"
        return None

    def watermark_delay(self, base_delay: str = "0 seconds") -> str:
        """The fused watermark delay: base out-of-orderness + allowed
        lateness (Spark keeps window state until the watermark passes
        window end, so lateness extends the watermark)."""
        if self.allow_lateness_ms <= 0:
            return base_delay
        base_ms = duration_ms(base_delay, key="base watermark delay")
        return f"{base_ms + self.allow_lateness_ms} milliseconds"

    @staticmethod
    def from_config(
        config: "dict[str, str]",
        is_event_time: bool = True,
        is_session_window: bool = False,
    ) -> "WindowEmitStrategy":
        """Build from the reference's TableConfig keys
        (table.exec.emit.early-fire.enabled/delay,
        table.exec.emit.late-fire.enabled/delay,
        table.exec.emit.allow-lateness)."""

        def _ms(key: str) -> int | None:
            v = config.get(key)
            if v is None:
                return None
            return duration_ms(v, key=key)

        return WindowEmitStrategy(
            is_event_time=is_event_time,
            is_session_window=is_session_window,
            early_fire_enabled=config.get(
                "table.exec.emit.early-fire.enabled", "false"
            ).lower()
            == "true",
            early_fire_delay_ms=_ms("table.exec.emit.early-fire.delay"),
            late_fire_enabled=config.get(
                "table.exec.emit.late-fire.enabled", "false"
            ).lower()
            == "true",
            late_fire_delay_ms=_ms("table.exec.emit.late-fire.delay"),
            allow_lateness_ms=_ms("table.exec.emit.allow-lateness") or 0,
        )


def tumble_agg_emit(
    sdf: DataFrame,
    ts_col: str,
    size: str,
    keys,
    agg_exprs,
    strategy: WindowEmitStrategy,
    base_watermark_delay: str = "0 seconds",
    slide: str | None = None,
) -> tuple[DataFrame, str]:
    """Tumbling (or, with `slide`, hopping) group-window aggregate under an
    emit strategy: returns (windowed aggregate DataFrame, required sink
    output mode). The caller starts the sink with the returned mode (and
    `strategy.trigger_interval` as the processing-time trigger when
    early-fire has a delay). Session windows are rejected by the strategy
    itself (reference validation)."""
    wm = strategy.watermark_delay(base_watermark_delay)
    win_col = F.window(ts_col, size, slide) if slide else F.window(ts_col, size)
    win = sdf.withWatermark(ts_col, wm).groupBy(win_col, *keys)
    out = win.agg(*agg_exprs)
    return out, strategy.output_mode
