"""S3/O5 — log-file line scan and file-listing sort (SURVEY §2.1, §2.6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rclabsapi_spark.sources.files import list_log_files, read_log_lines


@pytest.fixture()
def log_dir(tmp_path):
    lines = {
        "app-2024.01.01.log": [
            "2024-01-01 00:00:01 INFO comp1 started",
            "2024-01-01 00:00:02 ERROR comp2 boom",
        ],
        "app-2024.01.02.log": [
            "2024-01-02 00:00:01 WARN comp1 slow request",
            "2024-01-02 00:00:02 INFO comp2 ok",
            "2024-01-02 00:00:03 ERROR comp1 boom again",
        ],
    }
    for name, ls in lines.items():
        (tmp_path / name).write_text("\n".join(ls) + "\n")
    return str(tmp_path)


def test_read_log_lines_scan_and_search(spark, log_dir):
    """S3 — line scan; P12 substring search over lines."""
    df = read_log_lines(spark, log_dir)
    assert df.count() == 5
    boom = df.filter(F.col("value").contains("boom"))
    assert boom.count() == 2
    # the file column supports the per-file semantics of the reference
    assert df.select("src_file").distinct().count() == 2


def test_read_log_lines_parsed_fields(spark, log_dir):
    """The structured view: ts/level/component parsed from the line."""
    df = read_log_lines(spark, log_dir, parse=True)
    by_level = {
        r["level"]: r["cnt"]
        for r in df.groupBy("level").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert by_level == {"INFO": 2, "ERROR": 2, "WARN": 1}
    assert df.filter(F.col("ts").isNull()).count() == 0


def test_list_log_files_sorted(spark, log_dir):
    """O5 — listLogFiles(sortBy) over file metadata."""
    by_name = list_log_files(spark, log_dir, sort_by="name").collect()
    assert [r["name"] for r in by_name] == [
        "app-2024.01.01.log",
        "app-2024.01.02.log",
    ]
    by_size = list_log_files(spark, log_dir, sort_by="size", ascending=False).collect()
    assert by_size[0]["size_bytes"] >= by_size[1]["size_bytes"]
    with pytest.raises(ValueError):
        list_log_files(spark, log_dir, sort_by="bogus")


def test_jsonl_roundtrip_preserves_rows(spark, tmp_path):
    """parquet → JSONL → parquet roundtrip conserves rows and values
    (modulo JSON's type surface: timestamps re-read via the declared
    schema, not inference)."""
    from rclabsapi_spark.catalog import load_table
    from rclabsapi_spark.sources.files import read_jsonl, write_jsonl

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, num_files=2)

    back = read_jsonl(spark, path, schema=docs.schema)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
