"""Batch/trigger policy (T5) — the reference's Packer flush rules.

Reference defaults (server/msgpacker/packer.go:9-14): flush when the buffer
reaches 10 msgs, OR 512 KB payload, OR the 5000 ms timer fires, OR the
global memory budget (4 GB) is exceeded (pack_checker.go:64-101).

In Spark the *mechanism* is the trigger + source rate options
(``trigger(processingTime=...)``, ``maxOffsetsPerTrigger``,
``maxFilesPerTrigger``); this module keeps the *policy* explicit so a
pipeline can translate reference-style thresholds into source options and
tests can pin the semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_MAX_COUNT = 10          # packer.go:11
DEFAULT_MAX_MSG_BYTES = 512 * 1024   # packer.go:12
DEFAULT_TIMER_MS = 5000         # packer.go:10
DEFAULT_MEMORY_BUDGET = 4 << 30  # packer.go:13


@dataclass
class PackerPolicy:
    max_count: int = DEFAULT_MAX_COUNT
    max_bytes: int = DEFAULT_MAX_MSG_BYTES
    timer_ms: int = DEFAULT_TIMER_MS
    memory_budget: int = DEFAULT_MEMORY_BUDGET

    def should_flush(
        self, count: int, batch_bytes: int, elapsed_ms: int, global_bytes: int = 0
    ) -> bool:
        return (
            count >= self.max_count
            or batch_bytes >= self.max_bytes
            or elapsed_ms >= self.timer_ms
            or global_bytes >= self.memory_budget
        )

    def to_trigger_options(self, avg_msg_bytes: int) -> dict[str, str]:
        """Translate to Spark source/trigger options: the count and byte
        caps become maxOffsetsPerTrigger; the timer becomes the processing
        interval. Memory is Spark-managed (unified memory manager + spill),
        which replaces the reference's blocking MemoryProtector."""
        by_count = self.max_count
        by_bytes = max(1, self.max_bytes // max(1, avg_msg_bytes))
        return {
            "maxOffsetsPerTrigger": str(min(by_count, by_bytes)),
            "processingTime": f"{self.timer_ms} milliseconds",
        }
