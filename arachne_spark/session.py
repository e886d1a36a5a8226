"""SparkSession builder with the engine's scale-oriented defaults.

Local mode here stands in for a multi-executor cluster (BASELINE.md scaling
protocol): the same configs — AQE with skew-join splitting and partition
coalescing, Arrow for pandas UDFs, shuffle partitions sized to cores — are the
ones a 1000-executor deployment would set (with shuffle partitions scaled to
cluster cores instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "arachne_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master`` (or env SPARK_GRAFT_MASTER) overrides the default
    ``local[cores]`` — e.g. ``local-cluster[4,4,6144]`` runs 4 SEPARATE
    executor JVMs with 4 cores / 6 GiB each, the closest sandbox stand-in for
    a real cluster (each executor gets its own heap, GC, and shuffle state —
    the resources a real 4x cluster multiplies). ``cores`` should then be the
    TOTAL core count so shuffle partitions size correctly."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cores}]"
    if master.startswith("local-cluster"):
        # executors resolve the driver over loopback; avoid hostname lookups
        os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    # Python workers (pandas UDF / mapInPandas) must import arachne_spark no
    # matter the driver's cwd; on a real cluster this is spark-submit
    # --py-files, locally it's PYTHONPATH inheritance.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # decouple pre-shuffle parallelism from the static partition count:
        # a fixed cores-scaled number makes per-partition aggregate state
        # grow linearly with data (a 256M-row distinct at 8 partitions
        # builds 32M-row hash tables and spills — spill is extra DRAM
        # traffic, the one resource a single box cannot scale). A high
        # initial count bounds per-partition state at every input size and
        # AQE coalesces back to advisory-size/parallelism afterwards —
        # the same setting a 1000-executor deployment runs with.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get(
                "SPARK_GRAFT_INIT_PARTS", str(max(shuffle_partitions * 8, 128))
            ),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    exec_mem = os.environ.get("SPARK_GRAFT_EXECUTOR_MEM")
    if exec_mem:
        b = b.config("spark.executor.memory", exec_mem)
    # Shuffle/broadcast IO codec A/B knob (default: Spark's lz4). zstd
    # halves shuffle bytes at some CPU cost — relevant where shuffle
    # bandwidth is the scaling-limited resource (this sandbox's shared
    # DRAM; spinning-disk or thin-NIC clusters).
    codec = os.environ.get("SPARK_GRAFT_IO_CODEC")
    if codec:
        b = b.config("spark.io.compression.codec", codec)
    # Runtime bloom-filter A/B knob: Spark's defaults (creation side <=10MB,
    # application side >=10GB scan) never inject for this engine's
    # mid-sized joins; SPARK_GRAFT_BLOOM=1 widens both so sparse joins
    # (e.g. a transitive-property self-join with no chains in the data)
    # get probe-side bloom pruning before the shuffle.
    if os.environ.get("SPARK_GRAFT_BLOOM") == "1":
        b = (
            b.config(
                "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
                "512MB",
            ).config(
                "spark.sql.optimizer.runtime.bloomFilter."
                "applicationSideScanSizeThreshold",
                "64MB",
            )
        )
    # Shuffle/spill files default to /tmp — on this sandbox a SINGLE shared
    # virtual disk whose bandwidth does not grow with executor count (an
    # anti-scaling artifact the steal counter cannot see). On a real cluster
    # every executor has its own local SSD, so per-executor shuffle bandwidth
    # scales with the cluster. SPARK_GRAFT_LOCAL_DIR (e.g. /dev/shm/...)
    # restores that property locally; unset keeps Spark's default.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    # Prefer shuffled-hash-join over sort-merge (DEFAULT ON): the engine's
    # hot joins are equi-joins on 8-byte dictionary ids; SMJ pays two full
    # sorts per join (including provably-sparse ones like prp-trp's
    # self-join), SHJ builds a per-partition hash table instead. Catalyst
    # still only picks SHJ when the build side estimates small enough per
    # partition (canBuildLocalHashMap) and keeps SMJ otherwise, so the
    # spill-safe fallback survives at 100 TB. Measured (8M-file KG pair,
    # identical checksums): infer -26% at 1x4, e2e -19% at 4x4.
    # RISK (ADVICE r4): SHJ's build-side hash map does NOT spill — a
    # misestimated or skewed build partition can OOM where SMJ was safe.
    # Mitigations that keep this default sane at cluster scale: AQE skew
    # handling is on, the estimate gate (canBuildLocalHashMap vs
    # maxPartitionBytes * shuffledHashJoinFactor) still rejects big build
    # sides, and the engine's hot build sides are driver-counted deltas or
    # TBox slices with known sizes. If an OOM is ever traced here, set
    # SPARK_GRAFT_PREFER_SHJ=0 — it restores Spark's SMJ preference (also
    # the A/B knob).
    if os.environ.get("SPARK_GRAFT_PREFER_SHJ", "1") != "0":
        b = b.config("spark.sql.join.preferSortMergeJoin", "false")
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
