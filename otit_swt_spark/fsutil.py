"""Scheme-agnostic filesystem helpers via the Hadoop FileSystem API.

Python ``open()``/``shutil`` only reach the local filesystem, but dataset
paths may be hdfs:// or s3a:// — anything Spark's Hadoop configuration
supports. These helpers route small sidecar reads/writes and recursive
deletes through the same FileSystem the DataFrame writers use, so index
sidecars and merge staging behave identically on every scheme.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path_str: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return hpath.getFileSystem(conf), hpath, jvm

def delete(spark: SparkSession, path_str: str) -> None:
    """Recursive delete (no error when absent)."""
    fs, hpath, _ = _fs(spark, path_str)
    fs.delete(hpath, True)


def exists(spark: SparkSession, path_str: str) -> bool:
    fs, hpath, _ = _fs(spark, path_str)
    return bool(fs.exists(hpath))


def write_text(spark: SparkSession, path_str: str, content: str) -> None:
    fs, hpath, _ = _fs(spark, path_str)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic-where-the-FS-allows rename (HDFS, POSIX local). Returns False
    when the destination already exists — the compare-and-swap primitive
    the WAP publish step builds on. (S3A rename is copy+delete and only
    best-effort; production S3 tables would pair this with a DynamoDB-style
    lock, exactly as Delta/Iceberg do.)"""
    fs, hsrc, jvm = _fs(spark, src)
    hdst = jvm.org.apache.hadoop.fs.Path(dst)
    if fs.exists(hdst):
        return False
    return bool(fs.rename(hsrc, hdst))


def create_exclusive(spark: SparkSession, path_str: str) -> bool:
    """Atomically create an empty file, returning False if it already
    exists — the single-winner claim primitive the WAP publish builds on.
    Local paths go through ``java.io.File.createNewFile`` (O_CREAT|O_EXCL,
    atomic on POSIX — Hadoop's RawLocalFileSystem exists-then-create is
    TOCTOU and cannot be used for mutual exclusion); other schemes use
    ``FileSystem.createNewFile`` (atomic at the HDFS NameNode; S3A is
    best-effort and production tables there pair this with an external
    lock service, exactly as Delta/Iceberg do)."""
    fs, hpath, jvm = _fs(spark, path_str)
    scheme = hpath.toUri().getScheme()
    if scheme is None or scheme == "file":
        f = jvm.java.io.File(hpath.toUri().getPath())
        parent = f.getParentFile()
        if parent is not None:
            parent.mkdirs()
        return bool(f.createNewFile())
    return bool(fs.createNewFile(hpath))


def listdir(spark: SparkSession, path_str: str) -> list[str]:
    """Child basenames of a directory ([] when absent)."""
    fs, hpath, _ = _fs(spark, path_str)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def read_text(spark: SparkSession, path_str: str) -> str:
    fs, hpath, jvm = _fs(spark, path_str)
    stream = fs.open(hpath)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8"))
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def modification_time_ms(spark: SparkSession, path_str: str) -> int:
    """Epoch millis of the path's last modification (Hadoop FileStatus);
    raises if the path does not exist."""
    fs, hpath, _ = _fs(spark, path_str)
    return int(fs.getFileStatus(hpath).getModificationTime())
