"""sources.read_docs: path vs table-identifier resolution."""

from __future__ import annotations

import pytest

from posik_engine_spark import sources


def test_read_docs_parquet_path_adapts(spark):
    d = sources.read_docs(spark, "/root/testdata/sf0.001/documents.parquet")
    assert d.columns == sources.DOCS_COLUMNS
    assert d.count() == 500


def test_read_docs_table_identifier(spark):
    base = sources.read_docs(spark, "/root/testdata/sf0.001/documents.parquet")
    base.createOrReplaceTempView("_docs_tmp")
    spark.sql(
        "CREATE OR REPLACE GLOBAL TEMPORARY VIEW docs_src AS SELECT * FROM _docs_tmp"
    )
    d = sources.read_docs(spark, "global_temp.docs_src")
    assert d.columns == sources.DOCS_COLUMNS
    assert d.count() == 500


def test_read_docs_bad_table_schema(spark):
    spark.sql(
        "CREATE OR REPLACE GLOBAL TEMPORARY VIEW not_docs AS SELECT 1 AS x"
    )
    with pytest.raises(ValueError, match="lacks docs columns"):
        sources.read_docs(spark, "global_temp.not_docs")
