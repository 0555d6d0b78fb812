"""Arrow-batched pandas UDF kernels -- the only Python in the hot path.

Two kernels, mirroring where the reference *has* to run a model
(text_detection.py:72-81, text_recognition.py:56-131); everything else in
the pipeline is pure Catalyst column/window/aggregate logic.  Both kernels
call the shared `oracle.spec` functions, so distributed output is
byte-identical to the pure-Python oracle by construction.

Batches arrive via Arrow (`spark.sql.execution.arrow.pyspark.enabled`);
regexes compile once per executor process at import time -- the analogue of
loading TrOCR once per process (text_recognition.py:37-51).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from p_id_text_extraction_spark.config import DEFAULT_CONFIG, ExtractConfig
from p_id_text_extraction_spark.oracle import spec

CANDIDATE_STRUCT = T.StructType([
    T.StructField("block_idx", T.IntegerType(), False),
    T.StructField("block_id", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("conf_milli", T.IntegerType(), False),
    T.StructField("line_start", T.IntegerType(), False),
    T.StructField("line_end", T.IntegerType(), False),
])

DETECT_RESULT = T.StructType([
    T.StructField("norm_text", T.StringType(), False),
    T.StructField("payload_kind", T.StringType(), False),
    T.StructField("cands", T.ArrayType(CANDIDATE_STRUCT), False),
])

NORMALIZE_RESULT = T.StructType([
    T.StructField("text", T.StringType(), False),
    T.StructField("method", T.StringType(), False),
])


def make_detect_udf(cfg: ExtractConfig = DEFAULT_CONFIG):
    """parse + segment + detect in one kernel.

    Emitting ``array<struct>`` from a scalar pandas UDF and `posexplode`-ing
    (instead of `mapInPandas`) is deliberate: a projection preserves the
    child's output partitioning attributes, so after the single upfront
    ``repartition(conv_id, turn_idx)`` every downstream window/aggregate
    runs with ZERO additional exchanges.  `mapInPandas` rewrites the whole
    schema and forfeits that (SURVEY.md section 3.1).
    """

    @pandas_udf(DETECT_RESULT)
    def detect(conv_id: pd.Series, turn_idx: pd.Series, text: pd.Series,
               role: pd.Series, tool: pd.Series) -> pd.DataFrame:
        norm_texts: list[str] = []
        kinds: list[str] = []
        cands_col: list[list[dict]] = []
        for cid, tix, txt, rl, tl in zip(conv_id, turn_idx, text, role, tool):
            norm_text, payload_kind = spec.parse_payload(
                txt if isinstance(txt, str) else None,
                rl if isinstance(rl, str) else None,
                tl if isinstance(tl, str) else None,
            )
            cands: list[dict] = []
            for idx, b_start, b_end in spec.segment_offsets(len(norm_text), cfg):
                bid = spec.block_id(cid, int(tix), idx)
                for s, e, kind, conf in spec.detect_spans(norm_text, b_start, b_end, cfg):
                    g_start, g_end = b_start + s, b_start + e
                    ls, le = spec.line_bounds(norm_text, g_start, g_end)
                    cands.append({
                        "block_idx": idx,
                        "block_id": bid,
                        "start": g_start,
                        "end": g_end,
                        "kind": kind,
                        "conf_milli": conf,
                        "line_start": ls,
                        "line_end": le,
                    })
            norm_texts.append(norm_text)
            kinds.append(payload_kind)
            cands_col.append(cands)
        return pd.DataFrame({"norm_text": norm_texts, "payload_kind": kinds, "cands": cands_col})

    return detect


def make_normalize_udf(cfg: ExtractConfig = DEFAULT_CONFIG):
    """Confidence-gated text normalizer (text_recognition.py:111-131 analogue)."""

    @pandas_udf(NORMALIZE_RESULT)
    def normalize(cropped: pd.Series, conf_milli: pd.Series) -> pd.DataFrame:
        texts: list[str] = []
        methods: list[str] = []
        for txt, conf in zip(cropped, conf_milli):
            out, method = spec.normalize_text(txt if isinstance(txt, str) else "", int(conf), cfg)
            texts.append(out)
            methods.append(method)
        return pd.DataFrame({"text": texts, "method": methods})

    return normalize
