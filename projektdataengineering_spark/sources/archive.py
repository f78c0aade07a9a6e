"""Processed-file archival — the reference's R10 file lifecycle
(/root/reference/spark_tasks/weather_task.py:105-126) as a reusable op.

Layout reproduced exactly (O6): each consumed input file moves to

    <archive_root>/<dataset>/<YYYY-MM-DD>/<HHMMSS>_<basename>

with the date/time taken from a caller-supplied tz-aware datetime (the
reference stamps Europe/Berlin wall time; we take the timestamp as an
argument so runs are reproducible and testable).

Implementation goes through the driver JVM's Hadoop FileSystem exactly
like the reference does via py4j — which means it works unchanged on
file://, hdfs:// and s3a:// URIs (on object stores a "rename" is the
store's server-side copy+delete; still one call here). Renames happen
AFTER the write action commits — the reference has the same ordering,
and a crash between write and rename only re-offers already-loaded
files, which the HWM filter / dedup_incremental then drops (O4 fix).

For continuous ingestion the Structured Streaming file source does this
natively (`cleanSource=archive`, `sourceArchiveDir`); this helper is the
batch-mode equivalent.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession


def archive_files(
    spark: SparkSession,
    files: list[str],
    archive_root: str,
    dataset: str,
    when: datetime,
) -> list[str]:
    """Move each file to the dated archive layout; returns destinations.

    ``files`` is typically ``df.inputFiles()`` of the consumed scan
    (R9 lineage). Missing sources raise — silently skipping would hide
    double-processing bugs.
    """
    jvm = spark.sparkContext._jvm  # noqa: SLF001 — same boundary the reference uses
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    conf = jsc.hadoopConfiguration()
    day = when.strftime("%Y-%m-%d")
    hms = when.strftime("%H%M%S")

    moved: list[str] = []
    for src in files:
        src_path = jvm.org.apache.hadoop.fs.Path(src)
        fs = src_path.getFileSystem(conf)
        dst_dir = jvm.org.apache.hadoop.fs.Path(f"{archive_root}/{dataset}/{day}")
        fs.mkdirs(dst_dir)
        dst = jvm.org.apache.hadoop.fs.Path(dst_dir, f"{hms}_{src_path.getName()}")
        if not fs.rename(src_path, dst):
            raise IOError(f"archive rename failed: {src} -> {dst}")
        moved.append(dst.toString())
    return moved
