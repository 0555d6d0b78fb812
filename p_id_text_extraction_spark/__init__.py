"""PySpark-native main-content extraction engine over transcript tables.

A from-scratch reimplementation of the *semantics* of
ExMonsterJoker/P-ID-text-extraction (tile -> detect -> group -> crop ->
recognize -> coordinate-convert, see /root/reference run_pipeline.py:355-365)
as an idiomatic Spark DataFrame dataflow over tables of multi-turn
conversation / agent transcripts:

    parse (payload normalize)      ~ PDF_to_image.py:48-63
    segment (overlapping blocks)   ~ src/data_loader/sahi_slicer.py:79-135
    detect (content-span classify) ~ src/text_detection/text_detection.py:49-104
    suppress (containment sweep)   ~ src/grouping/grouping_logic.py:190-255
    cluster (interval union)       ~ src/grouping/grouping_logic.py:438-532
    merge (span + provenance agg)  ~ src/grouping/grouping_logic.py:266-322
    crop (padded clamped slice)    ~ src/cropping/cropping_Images.py:41-49
    normalize (confidence gate)    ~ src/text_detection/text_recognition.py:111-131
    coord (offset scaling)         ~ src/convert_coord.py:17-23
    order (stable span_rank)       ~ src/cropping/cropping_Images.py:35,55

Two physical strategies, byte-identical by construction (both call the
same pure-Python `oracle` kernels the test oracle uses):

  * relational (`plans.pipeline.extract_pipeline`): every stage after the
    Arrow-batched detect kernel is Catalyst-native column/window/aggregate
    logic -- 1 exchange, full per-stage observability;
  * fused (`plans.pipeline.extract_pipeline_fused`): the whole per-turn
    pipeline in one mapInPandas kernel -- Scan -> MapInPandas, ZERO
    exchanges, the minimal-communication plan (every post-detect stage is
    (conv_id, turn_idx)-local).

Alongside: training-data operators (dedup sketches, ANN, text quality,
multimodal plumbing, corpus curation) -- all value-hash-verified against
generated DuckDB oracle twins via engine-portable integer/md5 arithmetic.
"""

from p_id_text_extraction_spark.config import ExtractConfig

__all__ = ["ExtractConfig"]
__version__ = "0.1.0"
