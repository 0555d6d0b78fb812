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

Design bet: every relational stage (suppress/cluster/merge/crop/coord/order)
is pure Catalyst-native column/window/aggregate logic; Python appears only in
Arrow-batched pandas UDF kernels (parse+segment+detect, normalize), which
call the same pure-Python `spec` module the test oracle uses -- so per-turn
byte-equality between the distributed pipeline and the oracle is structural.
"""

from p_id_text_extraction_spark.config import ExtractConfig

__all__ = ["ExtractConfig"]
__version__ = "0.1.0"
