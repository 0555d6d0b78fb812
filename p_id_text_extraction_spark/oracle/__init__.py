"""Executable spec + pure-Python oracle for the extraction pipeline."""

from p_id_text_extraction_spark.oracle import spec
from p_id_text_extraction_spark.oracle.pipeline import extract_table, extract_turn

__all__ = ["spec", "extract_table", "extract_turn"]
