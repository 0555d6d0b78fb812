"""Source shims: Iceberg degradation + distributed generator determinism."""

from __future__ import annotations

from p_id_text_extraction_spark.sources.iceberg import append_spans, has_iceberg, read_table
from p_id_text_extraction_spark.sources.transcripts import distributed_transcripts, gen_conv


def test_iceberg_degrades_to_parquet(spark, tmp_path):
    assert has_iceberg(spark) is False  # no runtime jars in this container
    df = read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() == 500
    append_spans(df.limit(5), str(tmp_path / "sink"))
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 5


def test_distributed_generator_deterministic(spark):
    a = distributed_transcripts(spark, 20).orderBy("conv_id", "turn_idx").collect()
    b = distributed_transcripts(spark, 20).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    # coordination-free: any slice regenerable locally
    local = gen_conv("conv-000003")
    remote = [r for r in a if r.conv_id == "conv-000003"]
    assert len(local) == len(remote)
    assert [t["text"] for t in local] == [r.text for r in remote]
