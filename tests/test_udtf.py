"""SQL-callable UDTF tokenizer (extensibility surface)."""

from __future__ import annotations

from mapreducewordcount_spark.functions.udtf_tokenize import register_udtfs


def test_udtf_lateral_join_matches_column_tokenizer(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [("'Hello' WORLD -- 42",), ("",), (None,)], "value string"
    ).createOrReplaceTempView("lines")

    rows = spark.sql("""
        SELECT t.word FROM lines, LATERAL tokenize_words(value) t
    """).collect()
    assert [r.word for r in rows] == ["hello", "world", "42"]

    # direct invocation form
    single = spark.sql("SELECT * FROM tokenize_words('A b C')").collect()
    assert [r.word for r in single] == ["a", "b", "c"]
