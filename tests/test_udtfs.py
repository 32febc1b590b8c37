"""SQL-visible Python UDTFs (SURVEY.md §2J-J2): LATERAL table functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.functions.udtfs import register_udtfs
from historic_score_etl_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_split_chunks_lateral_roundtrip(spark):
    register_udtfs(spark)
    docs = load_table(spark, SF, "documents").limit(50)
    docs.createOrReplaceTempView("docs_v")
    out = spark.sql(
        """
        SELECT doc_id, s.rec, s.chunk
        FROM docs_v, LATERAL split_chunks(text, 100) s
        """
    )
    # chunks reassemble to the original text, in rec order
    rebuilt = (
        out.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("rec", "chunk"))), lambda s: s["chunk"])
            ).alias("rebuilt")
        )
    )
    joined = docs.join(rebuilt, "doc_id")
    assert joined.where(F.col("rebuilt") != F.col("text")).count() == 0
    assert out.count() >= 50


def test_tokenize_records_lateral(spark):
    register_udtfs(spark)
    spark.sql("SELECT 'a,b\n1,2' AS raw").createOrReplaceTempView("raw_v")
    rows = spark.sql(
        "SELECT t.pos, t.field, t.tok FROM raw_v, LATERAL tokenize_records(raw) t"
    ).collect()
    assert [(r.pos, r.field, r.tok) for r in rows] == [
        (0, 0, "a"),
        (1, 1, "b"),
        (2, 2, "1"),
        (3, 3, "2"),
    ]
