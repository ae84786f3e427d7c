"""Per-microbatch duration breakdown for the suite's streaming queries.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_streaming_query.py \
       <name>[,name...]

Registers a StreamingQueryListener, runs each streaming suite query
once, and dumps every microbatch's durationMs phases (addBatch = the
actual work; latestOffset/walCommit/commitOffsets = machinery) plus
state-operator commit metrics — the UI-less stand-in for the Structured
Streaming tab.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from milvus_cdc_spark import suite  # noqa: E402
from milvus_cdc_spark.session import get_spark  # noqa: E402

EVENTS: list = []


class _Capture(StreamingQueryListener):
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        d = dict(p.durationMs or {})
        row = {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "durationMs": d,
            "state": [
                {
                    "op": getattr(so, "operatorName", "?"),
                    "rowsTotal": so.numRowsTotal,
                    "commitMs": so.commitTimeMs,
                }
                for so in (p.stateOperators or [])
            ],
        }
        EVENTS.append(row)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("profile_streaming_query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.streams.addListener(_Capture())

    for name in names:
        spec = suite.QUERIES[name]
        EVENTS.clear()
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        total = time.time() - t0
        # listener events arrive asynchronously; give the bus a moment
        time.sleep(2.0)
        print(f"==== {name}: total={total:.3f}s rows={n}")
        tsum = 0.0
        for e in EVENTS:
            d = e["durationMs"]
            trig = d.get("triggerExecution", 0)
            tsum += trig / 1000.0
            print(
                f"  batch {e['batchId']}: rows={e['numInputRows']} "
                f"trigger={trig}ms addBatch={d.get('addBatch')}ms "
                f"getBatch={d.get('getBatch')}ms "
                f"latestOffset={d.get('latestOffset')}ms "
                f"walCommit={d.get('walCommit')}ms "
                f"commitOffsets={d.get('commitOffsets')}ms"
            )
            for so in e["state"]:
                print(
                    f"    state[{so['op']}]: rowsTotal={so['rowsTotal']} "
                    f"commit={so['commitMs']}ms"
                )
        print(f"  sum triggerExecution = {tsum:.2f}s of {total:.2f}s total")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
