"""Checkpoint filesystem IO through the Hadoop FileSystem API.

Crawl state (snapshot dirs + manifest commit markers) must live wherever
the cluster's checkpoint URI points — local disk in tests, ``s3a://`` or
``hdfs://`` under spark-submit (tools/submit_crawl.py ``--ckpt``). Driver-
side ``os.path`` calls only work for local paths, so every list/exists/
read/write here goes through ``Path.getFileSystem(hadoopConf)`` — the same
resolver Spark's own writers use, honoring the session's fs.* configuration
for any scheme.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry basenames of a directory ([] when it doesn't exist)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        # py4j passes primitive arrays by value, so read via IOUtils
        # (bundled with Hadoop) instead of a mutate-my-buffer loop
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create-or-overwrite a small text file (commit markers). Written to a
    temporary sibling then renamed — rename is atomic on HDFS/local (and
    single-object PUT semantics make the non-atomic S3 rename still safe
    for a marker file that is only ever read after it fully exists)."""
    fs, p = _fs_path(spark, path)
    tmp = p.suffix(".tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(text.encode("utf-8"))
    finally:
        stream.close()
    if fs.exists(p):
        fs.delete(p, False)
    # Hadoop rename reports most failures by returning false, not raising
    if not fs.rename(tmp, p):
        raise IOError(f"rename {tmp} -> {p} failed; commit marker not written")


def delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete (True if something was removed)."""
    fs, p = _fs_path(spark, path)
    return bool(fs.delete(p, True))
