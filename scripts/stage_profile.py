"""Stage-level profile of one query via the Spark UI REST API.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/stage_profile.py <name>[,name...] [reps]

Runs the query (after the bench's sf0.001 warm-up) in a session with the
UI enabled, then dumps per-stage wall/run/cpu times and shuffle bytes —
the headless stand-in for the Stages tab (guide §7.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
    os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    + ";spark.ui.enabled=true"
)

from milvus_cdc_spark import suite  # noqa: E402
from milvus_cdc_spark.session import get_spark  # noqa: E402


def _stages(app_id: str, port: int) -> list[dict]:
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("stage_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    app_id = spark.sparkContext.applicationId
    port = int(spark.conf.get("spark.ui.port", "4040"))
    for name in names:
        _one(spark, name, reps, sf_dir, app_id, port)
    spark.stop()


def _one(spark, name: str, reps: int, sf_dir: str, app_id: str, port: int) -> None:
    spec = suite.QUERIES[name]
    print(f"==== {name}")
    try:
        spec.fn(spark, "/root/testdata/sf0.001").count()
    except Exception as e:
        print(f"warm-up failed: {e!r}", file=sys.stderr)
    spark.catalog.clearCache()

    for rep in range(reps):
        before = {s["stageId"] for s in _stages(app_id, port)}
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        t_fn = time.time() - t0
        t1 = time.time()
        df.count()
        t_count = time.time() - t1
        spark.catalog.clearCache()
        print(f"== rep {rep}: t_fn={t_fn:.3f} t_count={t_count:.3f} "
              f"total={t_fn + t_count:.3f}")
        rows = []
        for s in _stages(app_id, port):
            if s["stageId"] in before:
                continue
            sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            comp = s.get("completionTime")
            wall = -1.0
            if sub and comp:
                fmt = "%Y-%m-%dT%H:%M:%S.%f"
                wall = (
                    time.mktime(time.strptime(comp[:23], fmt))
                    + float(comp[20:23]) / 1000
                    - time.mktime(time.strptime(sub[:23], fmt))
                    - float(sub[20:23]) / 1000
                )
            rows.append((
                s["stageId"], wall, s["numCompleteTasks"],
                s["executorRunTime"] / 1000.0,
                s["executorCpuTime"] / 1e9,
                s["shuffleReadBytes"] / 1e6,
                s["shuffleWriteBytes"] / 1e6,
                s["inputBytes"] / 1e6,
                s["name"][:60],
            ))
        rows.sort(key=lambda r: -r[1])
        print(f"{'stage':>5} {'wall_s':>7} {'tasks':>5} {'run_s':>7} "
              f"{'cpu_s':>7} {'shR_MB':>7} {'shW_MB':>7} {'in_MB':>7}  name")
        for r in rows[:25]:
            print(f"{r[0]:>5} {r[1]:>7.2f} {r[2]:>5} {r[3]:>7.2f} "
                  f"{r[4]:>7.2f} {r[5]:>7.1f} {r[6]:>7.1f} {r[7]:>7.1f}  {r[8]}")
        tot_wall = sum(r[1] for r in rows if r[1] > 0)
        print(f"sum stage wall = {tot_wall:.2f}s over {len(rows)} stages")


if __name__ == "__main__":
    main()
