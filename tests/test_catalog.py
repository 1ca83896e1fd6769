"""Index-management surface (S5-S8, A3/A4): DDL, upsert, point ops."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from gocrawl_spark.catalog import Warehouse
from gocrawl_spark.schema import ARTICLE


@pytest.fixture()
def wh(spark):
    return Warehouse(spark, tempfile.mkdtemp(prefix="wh_"))


def test_ddl_lifecycle(wh):
    assert not wh.table_exists("articles")
    wh.ensure_article_index()
    wh.ensure_page_index()
    assert wh.table_exists("articles") and wh.table_exists("pages")
    wh.ensure_article_index()  # idempotent
    # parquet round-trip normalizes nullability; names+types must hold
    assert [(f.name, f.dataType) for f in wh.table("articles").schema.fields] == [
        (f.name, f.dataType) for f in ARTICLE.fields
    ]
    assert [n for n, _ in wh.list_tables()] == ["articles", "pages"]
    wh.drop_table("pages")
    assert not wh.table_exists("pages")
    with pytest.raises(ValueError):
        wh.create_table("../evil", ARTICLE)


def test_upsert_is_idempotent_by_id(spark, wh):
    wh.create_table("docs", spark.createDataFrame([], "id string, body string").schema)
    v1 = spark.createDataFrame([("a", "one"), ("b", "two")], "id string, body string")
    wh.upsert("docs", v1)
    assert wh.count("docs") == 2
    # same id overwrites (ES doc-id semantics), new id appends
    v2 = spark.createDataFrame([("b", "TWO"), ("c", "three")], "id string, body string")
    wh.upsert("docs", v2)
    rows = {r.id: r.body for r in wh.table("docs").collect()}
    assert rows == {"a": "one", "b": "TWO", "c": "three"}


def test_point_get_delete_count(spark, wh):
    df = spark.createDataFrame(
        [("x", "hello"), ("y", "world")], "id string, body string"
    )
    wh.upsert("d2", df)
    assert wh.get("d2", "x").body == "hello"
    assert wh.get("d2", "zzz") is None
    wh.delete("d2", "x")
    assert wh.get("d2", "x") is None
    assert wh.count("d2") == 1
    assert wh.count("d2", F.col("body").contains("wor")) == 1
