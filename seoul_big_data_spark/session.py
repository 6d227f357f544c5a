"""SparkSession factory tuned for the test/bench environment.

Local mode is a single JVM with N executor threads; the same configs are the
right defaults on a real cluster except ``spark.driver.memory`` (which on a
cluster sizes only the driver) and ``spark.sql.shuffle.partitions`` (which at
100 TB should be sized so post-shuffle partitions land near
``spark.sql.files.maxPartitionBytes``; AQE coalescing makes the static number
a ceiling, not a target).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "seoul_big_data_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned local SparkSession.

    AQE is on so runtime statistics re-plan joins (broadcast demotion /
    promotion, skew-join splitting, partition coalescing) — the knobs that
    matter most when the same plan must survive a 100x scale-up.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_SHIPPED: set[int] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable on Spark's Python workers regardless of
    the driver's cwd/PYTHONPATH: zip it once per session and ``addPyFile``.

    Needed only by operators whose closures reference package functions
    (mapInPandas/applyInPandas paths); pure column-expression queries run
    entirely in the JVM and never import Python on workers."""
    key = id(spark)
    if key in _SHIPPED:
        return
    import hashlib
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # Content-addressed archive name (r8): a fixed path raced between
    # concurrent sessions — Spark's addFile refuses a re-shipped file whose
    # CONTENTS changed under the same name ("...zip exists and does not
    # match contents"), so a pytest run rebuilding the zip mid-flight
    # poisoned every mapInPandas query in a parallel plan-audit session.
    # Hash the package sources into the name: same code → same path
    # (reuse), different code → different path (no collision).
    digest = hashlib.md5()
    for root, _dirs, files in sorted(os.walk(pkg_dir)):
        for fn in sorted(files):
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                digest.update(p.encode())
                with open(p, "rb") as fh:
                    digest.update(fh.read())
    tag = digest.hexdigest()[:12]
    base = os.path.join(
        tempfile.gettempdir(), f"seoul_big_data_spark_ship_{tag}"
    )
    zip_path = base + ".zip"
    if not os.path.exists(zip_path):
        tmp = shutil.make_archive(f"{base}.build{os.getpid()}", "zip",
                                  os.path.dirname(pkg_dir),
                                  os.path.basename(pkg_dir))
        os.replace(tmp, zip_path)  # atomic: concurrent builders converge
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)
