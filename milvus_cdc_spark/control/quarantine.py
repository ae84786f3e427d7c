"""Error quarantine (T10): auto-pause a task after repeated failures.

Reference: core/writer/fail_protect.go:28-99 — a counter of errors per
rolling window; when it trips, the task is paused with the failure reason
(server/cdc_impl.go:807-814). Same semantics here, wrapped around pipeline
execution; the registry pauses the task and records the reason.
"""

from __future__ import annotations

import time


class ErrorQuarantine:
    def __init__(self, max_errors: int = 3, window_sec: float = 60.0):
        self.max_errors = max_errors
        self.window_sec = window_sec
        self._errors: list[tuple[float, str]] = []

    def record(self, reason: str, now: float | None = None) -> None:
        now = time.monotonic() if now is None else now
        self._errors.append((now, reason))
        cutoff = now - self.window_sec
        self._errors = [(t, r) for t, r in self._errors if t >= cutoff]

    def tripped(self, now: float | None = None) -> bool:
        now = time.monotonic() if now is None else now
        cutoff = now - self.window_sec
        return sum(1 for t, _ in self._errors if t >= cutoff) >= self.max_errors

    @property
    def last_reason(self) -> str:
        return self._errors[-1][1] if self._errors else ""
