"""Thread-scoped persist ledgers for multi-stage query builds.

Several operator families persist expensive intermediates (shingle
frames, IVF/PQ build outputs, per-round graph edge lists) whose returned
DataFrames the CALLER consumes lazily after the build function returns —
so the build cannot unpersist at exit. The contract everywhere is
deferred release: the next call of the same family releases the prior
call's frames (an early release only ever costs recompute, never
correctness, because every frame is deterministic).

Through round 8 those ledgers were module-global ``list[DataFrame]``
objects, which meant two queries running concurrently on ONE
SparkSession could release each other's still-live persists and trigger
a recompute storm (round-8 verdict, "what's wrong" #1). This class keeps
the exact list API the call sites already use (``append`` / ``extend`` /
``pop`` / truthiness) but backs it with ``threading.local()``:

- Concurrent queries on a shared SparkSession run on separate driver
  threads (the documented Spark pattern for concurrent job submission),
  so each thread sees a PRIVATE ledger and can never drain another
  in-flight query's frames.
- Within one thread, calls run serially, so releasing the previous
  call's frames at the next call's entry remains safe — unchanged
  semantics for the single-threaded bench/driver harness.

Frames persisted by a thread that never calls the family again are
released by ``spark.catalog.clearCache()`` (the bench harness does this
between queries) or session teardown, same as before.
"""

from __future__ import annotations

import threading
from typing import Iterable, Iterator

from pyspark.sql import DataFrame


class CacheRegistry:
    """A per-thread list of persisted DataFrames with a drain operation.

    Mirrors the subset of the ``list`` API the operator modules use so
    existing ``_X_CACHES.append(df)`` / ``while _X_CACHES: ...pop()``
    call sites work unchanged.
    """

    def __init__(self, name: str) -> None:
        self._name = name
        self._local = threading.local()

    @property
    def _frames(self) -> list[DataFrame]:
        frames = getattr(self._local, "frames", None)
        if frames is None:
            frames = []
            self._local.frames = frames
        return frames

    def append(self, df: DataFrame) -> None:
        self._frames.append(df)

    def extend(self, dfs: Iterable[DataFrame]) -> None:
        self._frames.extend(dfs)

    def pop(self) -> DataFrame:
        return self._frames.pop()

    def __len__(self) -> int:
        return len(self._frames)

    def __bool__(self) -> bool:
        return bool(self._frames)

    def __iter__(self) -> Iterator[DataFrame]:
        return iter(self._frames)

    def release(self) -> None:
        """Unpersist every frame this THREAD registered, newest first."""
        frames = self._frames
        while frames:
            frames.pop().unpersist(False)
