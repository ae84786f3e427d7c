"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the config choices are the ones that matter
on a real cluster too: AQE for runtime re-planning (skew joins, partition
coalescing), Arrow for any pandas-UDF path, UTC session timezone so event-time
semantics are unambiguous, and a shuffle-partition count sized to the
parallelism at hand rather than the 200 default.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

#: Vendored minimal protobuf runtime (vendor/pbshim/google/protobuf): lets
#: PySpark's transformWithStateInPandas run where google.protobuf is not
#: installed. Activated ONLY when the real library is absent.
_PBSHIM_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "vendor", "pbshim"
)


def ensure_protobuf() -> None:
    """Make ``google.protobuf`` importable — by the real library if
    installed, else by the vendored minimal runtime.

    Must run BEFORE the JVM launches: Python workers inherit the launching
    process's ``PYTHONPATH`` (PythonWorkerFactory merges it into the worker
    env), and transformWithState's state-server protocol runs in those
    workers. ``get_spark`` calls this ahead of session construction.
    """
    try:
        import google.protobuf  # noqa: F401  (the real one wins)
        return
    except ImportError:
        pass
    # Appended, not prepended: anything the environment already resolves
    # must keep winning. (The shim's ``google`` package is additionally
    # namespace-friendly via extend_path — see vendor/pbshim/google.)
    if _PBSHIM_DIR not in sys.path:
        sys.path.append(_PBSHIM_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    if _PBSHIM_DIR not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            (existing + os.pathsep if existing else "") + _PBSHIM_DIR
        )
    # If a protobuf-less ``google`` (e.g. the PEP-420 namespace package from
    # google-auth) was already imported — including by the probe above — the
    # sys.path append alone is invisible to it: graft the shim's google dir
    # onto the cached module's __path__ so ``google.protobuf`` resolves.
    cached = sys.modules.get("google")
    if cached is not None:
        shim_google = os.path.join(_PBSHIM_DIR, "google")
        paths = list(getattr(cached, "__path__", []))
        if shim_google not in paths:
            cached.__path__ = paths + [shim_google]


def get_spark(app_name: str = "milvus_cdc_spark", shuffle_partitions: int | None = None) -> SparkSession:
    ensure_protobuf()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) is unreadable by Spark natively; read the
        # raw int64 and let the catalog convert (truncate) to microseconds.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Input-split sizing must match the data scale (SURVEY §6 / the
        # 100 TB brief): the default 128 MB leaves the ≤11 MB single-file
        # test tables as one-split scans that serialize 32 cores. 4 MB
        # spreads the local fixtures across the machine; a cluster run at
        # real scale overrides via SPARK_GRAFT_MAX_PARTITION_BYTES (128 MB+).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        # AQE coalesces post-shuffle partitions by BYTES, and the default
        # 1 MB floor under-parallelizes expression-dense stages whose
        # array payloads arrive via broadcast joins (the candidate-verify
        # frames of the dedup/vector families measured 2-task stages with
        # 30 cores idle). 64 KB lets AQE keep CPU-heavy small-byte stages
        # wide; interleaved on/off A/Bs over 22 queries at sf0.1 were
        # uniformly flat-to-better (banded_cosine −58 %, near_dup_clusters
        # −36 %, zero regressions, values identical — SCALE.md §5q). At
        # real scale post-shuffle partitions dwarf both floors and the
        # 64 MB advisory target governs; the floor binds exactly when
        # bytes underestimate work.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"),
        )
    )
    # Generic conf passthrough for A/B measurement and cluster overrides:
    # semicolon-separated key=value pairs, applied last so they win over
    # the defaults above. Static SQL confs (e.g. codegen cache sizing)
    # only take effect when set here, before the JVM launches — which is
    # exactly why this hook lives in the session factory rather than in
    # per-query code.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in extra.split(";"):
        pair = pair.strip()
        if not pair or "=" not in pair:
            continue
        key, _, value = pair.partition("=")
        builder = builder.config(key.strip(), value.strip())
    return builder.getOrCreate()
