"""Transcript sources: deterministic synthetic generator + derived tables.

The input table shape is authoritative from BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp)``.  In production this is an Iceberg table partitioned by
``bucket(16, conv_id)``; this sandbox has no Iceberg runtime jars, so the
reader falls back to parquet with the identical schema (the scan operator,
SURVEY.md S1).  All synthesis is seeded and derived purely from
``(conv_id, turn_idx)`` -- regenerating any slice is reproducible without
coordination, which is also how the 100 TB bench table would be minted
(parallel, deterministic, no driver-side data).
"""

from __future__ import annotations

import hashlib
import json
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

_WORDS = (
    "the quick brown fox jumps over lazy dog while seventeen engineers "
    "review pipeline design documents about distributed query execution "
    "plans and partition pruning strategies for columnar storage systems "
    "every morning before coffee because throughput matters greatly here"
).split()

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "exec", "browse"]
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_NAV_LINKS = ["Home", "About", "Products", "Contact", "Blog", "Careers", "Support", "Docs"]


def _rng(conv_id: str, turn_idx: int, salt: str = "") -> random.Random:
    h = hashlib.md5(f"{conv_id}|{turn_idx}|{salt}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _sentence(rng: random.Random) -> str:
    n = rng.randint(5, 14)
    words = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(words).capitalize() + "."


def _prose(rng: random.Random, lo: int = 1, hi: int = 20) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


def _html_payload(rng: random.Random) -> str:
    links = rng.sample(_NAV_LINKS, rng.randint(4, 7))
    nav = "<nav>" + " | ".join(f'<a href="https://example.com/{l.lower()}">{l}</a>' for l in links) + "</nav>"
    main = f"<div class=\"main\"><p>{_prose(rng, 2, 8)}</p><p>{_prose(rng, 1, 5)}</p></div>"
    footer = f"<footer>© 2026 Example Corp | <a href=\"/terms\">Terms</a> | <a href=\"/privacy\">Privacy</a></footer>"
    return f"<html><body>{nav}{main}{footer}</body></html>"


def _markdown_payload(rng: random.Random) -> str:
    parts = [f"# {_sentence(rng)}", _prose(rng, 1, 4)]
    if rng.random() < 0.7:
        code_lines = "\n".join(f"    x_{i} = compute({rng.randint(0, 99)})" for i in range(rng.randint(2, 6)))
        parts.append(code_lines)
    parts.append(_prose(rng, 1, 3))
    return "\n".join(parts)


def _tool_json_payload(rng: random.Random) -> str:
    return json.dumps({"status": "ok", "latency_ms": rng.randint(1, 500), "text": _prose(rng, 1, 6)})


def _degenerate_payload(rng: random.Random) -> str:
    choice = rng.randint(0, 4)
    if choice == 0:
        return ""
    if choice == 1:
        return "   \t  "
    if choice == 2:
        return "x"
    if choice == 3:
        return "a" * rng.randint(300, 900)  # one giant unbroken token
    # all-boilerplate turn -> zero spans survive
    return "Home | About | Contact | Blog\n© 2026 Example Corp | Terms | Privacy"


def gen_text(conv_id: str, turn_idx: int) -> str:
    """Deterministic payload for one turn (FIXTURES.md payload mix)."""
    rng = _rng(conv_id, turn_idx, "payload")
    r = rng.random()
    if r < 0.40:
        return _prose(rng)
    if r < 0.65:
        return _html_payload(rng)
    if r < 0.80:
        return _markdown_payload(rng)
    if r < 0.90:
        return _tool_json_payload(rng)
    return _degenerate_payload(rng)


def gen_turn(conv_id: str, turn_idx: int, conv_offset_min: int = 0) -> dict:
    rng = _rng(conv_id, turn_idx, "meta")
    role = _ROLES[(turn_idx + rng.randint(0, 1)) % 3]
    tool = rng.choice(_TOOLS) if role == "tool" else None
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": gen_text(conv_id, turn_idx),
        "tool": tool,
        "ts": _EPOCH + timedelta(minutes=conv_offset_min + turn_idx),
    }


def gen_turns(n_convs: int, max_turns: int = 5, seed: int = 42, zipf: bool = False) -> list[dict]:
    """Deterministic fixture table (FIXTURES.md section 1 sizes)."""
    master = random.Random(seed)
    turns: list[dict] = []
    for i in range(n_convs):
        conv_id = f"conv-{i:06d}"
        if zipf:
            n = min(max_turns, max(1, int(master.paretovariate(1.5))))
        else:
            n = master.randint(1, max_turns)
        offset = master.randint(0, 10_000)
        for t in range(n):
            turns.append(gen_turn(conv_id, t, offset))
    return turns


def gen_skew_turns(seed: int = 42) -> list[dict]:
    """Skew fixture: 50 normal convs + one hot conv with 5000 turns, some huge."""
    turns = gen_turns(50, max_turns=20, seed=seed)
    hot = "conv-hot000"
    for t in range(5000):
        row = gen_turn(hot, t, 0)
        if t % 250 == 0:
            rng = _rng(hot, t, "mega")
            row["text"] = _prose(rng, 400, 500)  # ~200KB mega-turn
        turns.append(row)
    return turns


def conv_turn_count(conv_id: str, max_turns: int = 50) -> int:
    """Turns in a conversation, derived purely from the conv id."""
    h = hashlib.md5(f"{conv_id}|nturns".encode()).digest()
    return 1 + int.from_bytes(h[:4], "big") % max_turns


def gen_conv(conv_id: str, max_turns: int = 50) -> list[dict]:
    """All turns of one conversation -- self-contained, no shared RNG, so
    any worker can mint any slice independently (the property that lets a
    100 TB bench table be generated in parallel with zero coordination)."""
    h = hashlib.md5(f"{conv_id}|offset".encode()).digest()
    offset = int.from_bytes(h[:4], "big") % 10_000
    return [gen_turn(conv_id, t, offset) for t in range(conv_turn_count(conv_id, max_turns))]


def distributed_transcripts(spark: SparkSession, n_convs: int, max_turns: int = 50,
                            partitions: int = 256) -> DataFrame:
    """Deterministic transcripts table minted IN PARALLEL on executors:
    spark.range over conv indices -> mapInPandas generating each conv's
    turns.  Identical output for identical (n_convs, max_turns).

    ``partitions`` sets the pre-generation fan-out (the default 256 output
    files = 8 task waves at 32 cores -- fine-grained tasks smooth the
    zipf-sized stragglers at the tail of the stage).  Scale it UP for big
    corpora: the repartition shuffles only the conv-id LONGS, so this is
    the cheap place to control output file count -- repartitioning the
    generated text afterwards shuffles the whole corpus."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(gen_conv(f"conv-{int(i):06d}", max_turns))
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])

    return spark.range(n_convs).repartition(partitions).mapInPandas(kernel, TRANSCRIPT_SCHEMA)


def transcripts_df(spark: SparkSession, turns: list[dict]) -> DataFrame:
    rows = [(t["conv_id"], t["turn_idx"], t["role"], t["text"], t["tool"], t["ts"]) for t in turns]
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Scan operator (SURVEY.md S1).

    Production: ``spark.read.format("iceberg").load(table)`` with partition
    pruning on ``bucket(16, conv_id)``.  A path holding an Iceberg-format
    table reads through snapshot-planned scan metadata
    (sources/iceberg_format.py); plain parquet otherwise, with the same
    schema; column pruning + predicate pushdown still apply.
    """
    from p_id_text_extraction_spark.sources import iceberg_format
    if iceberg_format.table_exists(path):
        df = iceberg_format.read_table(spark, path)
        return df.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields])
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)


def derive_transcripts_from_documents(spark: SparkSession, sf_dir: str, n_convs: int = 50) -> DataFrame:
    """Map the driver's synthetic ``documents`` table onto the transcript
    shape (deterministic, SQL-mirrorable in the DuckDB oracle):
    ``conv_id = 'conv-' || lpad(doc_id % n_convs, 6, '0')``,
    ``turn_idx = doc_id div n_convs``.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("conv-"), F.lpad((F.col("doc_id") % n_convs).cast("string"), 6, "0")).alias("conv_id"),
        (F.col("doc_id") / n_convs).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "user").when(F.col("doc_id") % 3 == 1, "assistant").otherwise("tool").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(mins=F.col("doc_id").cast("int"))).alias("ts"),
    )
