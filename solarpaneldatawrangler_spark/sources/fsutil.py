"""Small Hadoop FileSystem helpers shared by the durable stores and
the release sink — FS-agnostic (local, HDFS, S3A), unlike os.path /
driver-local open(). One place for the py4j plumbing so create-flag /
encoding / close-handling fixes can't drift between call sites."""

from __future__ import annotations


def hadoop_fs(spark, path: str):
    """(FileSystem, Path, jvm) for ``path`` via the session's Hadoop
    configuration."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def write_text_file(spark, file_path: str, data: str) -> None:
    """One small text file. Single-object create (overwrite), atomic
    on every FS Spark targets."""
    fs, hpath, _jvm = hadoop_fs(spark, file_path)
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(data.encode("utf-8")))
    finally:
        stream.close()


def read_text_file(spark, file_path: str) -> str:
    """Read one small text file. (A Spark reader can't: underscore-
    prefixed files are hidden from Spark scans even when addressed
    directly.)"""
    fs, hpath, jvm = hadoop_fs(spark, file_path)
    stream = fs.open(hpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
