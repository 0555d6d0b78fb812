"""extract_full on the driver's documents-derived transcripts must match
the oracle byte-for-byte (the driver only rows-only-checks this query, so
the equality evidence lives here) -- plus unicode offset consistency."""

from __future__ import annotations

from p_id_text_extraction_spark.oracle.pipeline import extract_table
from p_id_text_extraction_spark.plans.pipeline import extract_pipeline, extract_pipeline_fused
from p_id_text_extraction_spark.sources.transcripts import derive_transcripts_from_documents, transcripts_df

KEY = ["conv_id", "turn_idx", "span_rank"]


def test_documents_derived_byte_equality(spark):
    turns_df = derive_transcripts_from_documents(spark, "/root/testdata/sf0.001")
    turns = [r.asDict() for r in turns_df.collect()]
    got = [
        (r.conv_id, r.turn_idx, r.span_rank, r.start, r.end, r.text, r.kind,
         r.method, r.confidence, list(r.provenance), r.is_grouped)
        for r in extract_pipeline(turns_df).orderBy(*KEY).collect()
    ]
    want = [
        (r["conv_id"], r["turn_idx"], r["span_rank"], r["start"], r["end"], r["text"],
         r["kind"], r["method"], r["confidence"], r["provenance"], r["is_grouped"])
        for r in extract_table(turns)
    ]
    assert len(got) == len(want) > 400
    assert got == want


def test_unicode_offsets_consistent(spark):
    """JVM substr/length index by code points, Python by code points --
    emoji (supplementary plane) and CJK must produce identical spans."""
    turns = [
        {"conv_id": "u", "turn_idx": 0, "role": "user",
         "text": "Grinning face 😀 emoji and 中文文本 inside an ordinary sentence here.",
         "tool": None, "ts": None},
        {"conv_id": "u", "turn_idx": 1, "role": "user",
         "text": "<div><p>café naïve über 😺😸 content paragraph with words</p>"
                 "<nav><a href='/a'>A</a> | <a href='/b'>B</a> | <a href='/c'>C</a></nav></div>",
         "tool": None, "ts": None},
    ]
    got = [
        (r.conv_id, r.turn_idx, r.span_rank, r.start, r.end, r.text)
        for r in extract_pipeline(transcripts_df(spark, turns)).orderBy(*KEY).collect()
    ]
    want = [
        (r["conv_id"], r["turn_idx"], r["span_rank"], r["start"], r["end"], r["text"])
        for r in extract_table(turns)
    ]
    assert got == want
    assert any("😀" in t[5] for t in got)

    # the fused kernel indexes in Python code points end-to-end; its output
    # must carry the identical supplementary-plane offsets
    fused = [
        (r.conv_id, r.turn_idx, r.span_rank, r.start, r.end, r.text)
        for r in extract_pipeline_fused(transcripts_df(spark, turns)).orderBy(*KEY).collect()
    ]
    assert fused == want
