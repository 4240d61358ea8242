"""IVF build-once/search-many split: persisted-index round-trip
equality and dynamic partition pruning on the bucket-partitioned scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_n3_spark.operators.similarity import ivf_index, ivf_search, ivf_topk

EMBS = "/root/testdata/sf0.001/embeddings.parquet"


def test_persisted_index_search_equals_direct(spark, tmp_path):
    """Searching a written-and-re-read bucket-partitioned index returns
    exactly what the one-shot build+search form returns."""
    embs = spark.read.parquet(EMBS)
    path = str(tmp_path / "ivfidx")
    ivf_index(embs).write.partitionBy("bucket").parquet(path)
    idx = spark.read.parquet(path)
    got = sorted(map(tuple, ivf_search(
        idx, embs.where(F.col("vec_id") < 20), hamming=1).collect()))
    want = sorted(map(tuple, ivf_topk(embs, hamming=1).collect()))
    assert got == want and len(got) > 0


def test_persisted_index_probe_prunes_partitions(spark, tmp_path):
    """The probe join dynamically prunes the index scan to the probed
    shell's bucket partitions (the broadcast query side feeds a DPP
    subquery into the partition filter) — at 100 TB each query batch
    reads only its shell, never the whole index."""
    embs = spark.read.parquet(EMBS)
    path = str(tmp_path / "ivfidx")
    ivf_index(embs).write.partitionBy("bucket").parquet(path)
    idx = spark.read.parquet(path)
    out = ivf_search(idx, embs.where(F.col("vec_id") < 5), hamming=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters: [" in plan, plan


def test_index_schema_is_the_contract(spark):
    idx = ivf_index(spark.read.parquet(EMBS))
    assert set(idx.columns) == {"bucket", "vec_id", "et"}
    # one row per corpus vector — the index is corpus-sized, never more
    assert idx.count() == spark.read.parquet(EMBS).count()


def test_multitable_persisted_index_round_trip(spark, tmp_path):
    """The multi-table split obeys the same persistence contract: a
    written-and-re-read bucket-partitioned multi-table index returns
    exactly the one-shot ivf_topk_tables result, and the probe join
    dynamically prunes the scan to the probed buckets."""
    from rdf_n3_spark.operators.similarity import (
        ivf_index_tables,
        ivf_search_tables,
        ivf_topk_tables,
    )

    embs = spark.read.parquet(EMBS)
    path = str(tmp_path / "ivfidx_mt")
    ivf_index_tables(embs).write.partitionBy("bucket").parquet(path)
    idx = spark.read.parquet(path)
    got = sorted(map(tuple, ivf_search_tables(
        idx, embs.where(F.col("vec_id") < 20)).collect()))
    want = sorted(map(tuple, ivf_topk_tables(embs).collect()))
    assert got == want and len(got) > 0
    plan = (
        ivf_search_tables(idx, embs.where(F.col("vec_id") < 5))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters: [" in plan, plan
    # index is tables× the corpus — the documented multi-table trade
    assert ivf_index_tables(embs).count() == 8 * embs.count()
