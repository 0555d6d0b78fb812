"""Streaming tests: foreachBatch extraction == batch pipeline; watermarked
stateful rollup emits finalized windows and drops late data."""

from __future__ import annotations

from datetime import datetime

from p_id_text_extraction_spark.oracle.pipeline import extract_table
from p_id_text_extraction_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_turns, transcripts_df
from p_id_text_extraction_spark.streaming.extract_stream import extract_stream
from p_id_text_extraction_spark.streaming.rollup_stream import hourly_rollup_stream


def test_stream_matches_oracle(spark, tmp_path):
    turns = gen_turns(10, max_turns=4, seed=5)
    src = str(tmp_path / "src")
    # two "arrival waves" -> two files the stream picks up
    transcripts_df(spark, turns[: len(turns) // 2]).coalesce(1).write.mode("append").parquet(src)
    transcripts_df(spark, turns[len(turns) // 2:]).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = extract_stream(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = [
        (r.conv_id, r.turn_idx, r.span_rank, r.text)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .orderBy("conv_id", "turn_idx", "span_rank").collect()
    ]
    want = [(r["conv_id"], r["turn_idx"], r["span_rank"], r["text"]) for r in extract_table(turns)]
    assert got == want

    # retry idempotence: replaying the same micro-batches (fresh WAL, same
    # batch ids, same output dir) must overwrite, not duplicate -- the
    # at-least-once foreachBatch contract (ADVICE round 1)
    q2 = extract_stream(stream, str(tmp_path / "out"), str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    got2 = [
        (r.conv_id, r.turn_idx, r.span_rank, r.text)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .orderBy("conv_id", "turn_idx", "span_rank").collect()
    ]
    assert got2 == want


def test_stream_iceberg_catalog_matches_and_is_idempotent(spark, tmp_path):
    """foreachBatch over an Iceberg-format sink: per-batch atomic
    overwrite snapshots, replay with a fresh WAL overwrites instead of
    duplicating, output equals the oracle."""
    from p_id_text_extraction_spark.sources import iceberg_format as ice
    turns = gen_turns(10, max_turns=4, seed=5)
    src = str(tmp_path / "src")
    transcripts_df(spark, turns[: len(turns) // 2]).coalesce(1).write.mode("append").parquet(src)
    transcripts_df(spark, turns[len(turns) // 2:]).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "out_ice")
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = extract_stream(stream, out, str(tmp_path / "ck1"), catalog="iceberg")
    q.awaitTermination(120)
    want = [(r["conv_id"], r["turn_idx"], r["span_rank"], r["text"]) for r in extract_table(turns)]

    def rows():
        return [(r.conv_id, r.turn_idx, r.span_rank, r.text)
                for r in ice.read_table(spark, out)
                .orderBy("conv_id", "turn_idx", "span_rank").collect()]

    assert rows() == want
    n_snaps = len(ice.snapshot_ids(out))
    assert n_snaps >= 2   # one snapshot per micro-batch

    # replay with a fresh WAL: same batch ids overwrite their own
    # partitions atomically -- no duplicates, snapshots keep history
    q2 = extract_stream(stream, out, str(tmp_path / "ck2"), catalog="iceberg")
    q2.awaitTermination(120)
    assert rows() == want
    assert len(ice.snapshot_ids(out)) > n_snaps


EVENTS_SCHEMA = "ts timestamp, event_type string, value double"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(datetime(2026, 1, 1, h, m), t, v) for h, m, t, v in rows], EVENTS_SCHEMA)


def test_watermarked_rollup_emits_closed_windows_and_drops_late(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    # wave 1: events in hours 10 and 11, plus a max-ts at 12:00 that pushes
    # the watermark (30 min delay) to 11:30 -- closing hours 10 only... and
    # hour-11 window [11:00,12:00) stays open (end 12:00 > watermark 11:30)
    _ev(spark, [
        (10, 5, "click", 1.25),
        (10, 40, "click", 2.50),
        (10, 50, "view", 3.00),
        (11, 10, "click", 4.00),
        (12, 0, "tick", 0.0),
    ]).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = hourly_rollup_stream(stream, out, ckpt)
    q.awaitTermination(120)

    got1 = {(r.hour.hour, r.event_type): (r.n_events, r.value_cents)
            for r in spark.read.parquet(out).collect()}
    assert got1 == {(10, "click"): (2, 375), (10, "view"): (1, 300)}

    # wave 2: a LATE hour-10 event (behind the 11:30 watermark -> dropped)
    # plus a 13:30 tick that closes hour 11 and hour 12
    _ev(spark, [
        (10, 20, "click", 99.0),      # late: must NOT appear anywhere
        (13, 30, "tick", 0.0),
    ]).coalesce(1).write.mode("append").parquet(src)
    q2 = hourly_rollup_stream(spark.readStream.schema(EVENTS_SCHEMA).parquet(src), out, ckpt)
    q2.awaitTermination(120)

    got2 = {(r.hour.hour, r.event_type): (r.n_events, r.value_cents)
            for r in spark.read.parquet(out).collect()}
    assert got2[(10, "click")] == (2, 375)          # late row dropped
    assert got2[(11, "click")] == (1, 400)          # hour 11 closed by wave 2
    assert got2[(12, "tick")] == (1, 0)


def test_stateful_conv_progress_across_batches_and_restarts(spark, tmp_path):
    """applyInPandasWithState: per-conversation counters must accumulate
    across micro-batches AND across a full query restart (state lives in
    the checkpoint's state store)."""
    from p_id_text_extraction_spark.streaming.state_stream import conv_progress_stream

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def turns(rows):
        return spark.createDataFrame(
            [(c, t, None, "x", None, None) for c, t in rows], TRANSCRIPT_SCHEMA)

    # wave 1: conv a has 2 turns, conv b has 1
    turns([("a", 0), ("a", 1), ("b", 0)]).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = conv_progress_stream(stream, out, ckpt)
    q.awaitTermination(120)

    def latest():
        import pandas as pd
        pdf = spark.read.parquet(out).toPandas()
        pdf = pdf.sort_values("batch_id").groupby("conv_id").last()
        return {c: (int(r.turns_seen), int(r.max_turn_idx)) for c, r in pdf.iterrows()}

    assert latest() == {"a": (2, 1), "b": (1, 0)}

    # wave 2 through a RESTARTED query: conv a grows, conv c appears
    turns([("a", 2), ("c", 0)]).coalesce(1).write.mode("append").parquet(src)
    q2 = conv_progress_stream(spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src), out, ckpt)
    q2.awaitTermination(120)
    assert latest() == {"a": (3, 2), "b": (1, 0), "c": (1, 0)}


def test_streaming_dedup_first_seen_across_batches_and_restarts(spark, tmp_path):
    """Cross-batch exact dedup: a fingerprint admitted in batch 1 must be
    rejected in every later batch, INCLUDING after a full query restart
    (the seen-set lives in the checkpointed state store); within-batch
    dups collapse to the min doc_id; counts keep accruing."""
    import pandas as pd

    from p_id_text_extraction_spark.streaming.dedup_stream import dedup_stream
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def docs(rows):
        return spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in rows],
                          "text": [r[1] for r in rows]}))

    # batch 1: A twice (within-batch dup, canonical=1), B once.
    # "a  x" normalizes to "a x" -- same fingerprint as doc 1.
    docs([(1, "a x"), (5, "A  x"), (2, "b y")]).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    dedup_stream(stream, out, ckpt).awaitTermination()

    got = spark.read.parquet(out).toPandas()
    new = got[got.is_new].set_index("fingerprint")
    assert sorted(new.doc_id) == [1, 2]
    assert int(new[new.doc_id == 1].n_seen.iloc[0]) == 2   # within-batch dup counted

    # restart with new data: A again (must NOT re-admit), C new
    docs([(9, "a x"), (7, "c z")]).coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    dedup_stream(stream2, out, ckpt).awaitTermination()

    got = spark.read.parquet(out).toPandas()
    admitted = got[got.is_new]
    assert sorted(admitted.doc_id) == [1, 2, 7]            # A never re-admitted
    # the A-fingerprint's LATEST row carries the accrued count (2 + 1)
    a_fp = admitted[admitted.doc_id == 1].fingerprint.iloc[0]
    latest_a = got[got.fingerprint == a_fp].sort_values("batch_id").iloc[-1]
    assert not bool(latest_a.is_new) and int(latest_a.n_seen) == 3


def test_streaming_dedup_state_ttl_evicts_and_readmits(spark, tmp_path):
    """Bounded state: with state_ttl_ms set, a fingerprint idle past the
    horizon is EVICTED from the state store (row count plateaus instead of
    growing forever) and its next occurrence is RE-ADMITTED as a fresh
    canonical row.  NULL doc_id / NULL text rows are dropped before the
    stateful kernel instead of crashing the query."""
    import time as _t

    import pandas as pd

    from p_id_text_extraction_spark.streaming.dedup_stream import dedup_stream
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    TTL = 3000

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def poll(q, cond, secs=90):
        # a TTL query runs no-data batches to fire timeouts and never
        # self-terminates (processAllAvailable spins with it): poll the
        # observable effect, then stop the query explicitly
        deadline = _t.monotonic() + secs
        while _t.monotonic() < deadline:
            if q.exception() is not None:      # query died: fail loudly
                raise RuntimeError(q.exception())
            try:
                if cond():
                    return
            except Exception:
                pass                      # sink mid-overwrite; retry
            _t.sleep(1)
        q.stop()
        raise AssertionError("condition not reached before deadline")

    def out_pdf():
        return spark.read.parquet(out).toPandas()

    # batch 1: A, B admitted; null doc_id and null text rows must be
    # silently dropped (a NaN doc_id inside the kernel kills the query)
    docs([(1, "a x"), (2, "b y"), (None, "n t"), (3, None)]
         ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = dedup_stream(stream, out, ckpt, trigger_available_now=False,
                     state_ttl_ms=TTL)
    poll(q, lambda: sorted(out_pdf()[out_pdf().is_new].doc_id) == [1, 2])
    q.stop()

    _t.sleep((TTL + 1500) / 1000)       # let both fingerprints pass the horizon

    # batch 2: A replayed (id 9) + C new.  A is past the horizon -> its
    # stale state must not suppress re-admission; B idle -> timeout eviction.
    docs([(9, "a x"), (7, "c z")]).coalesce(1).write.mode("append").parquet(src)
    q = dedup_stream(spark.readStream.schema("doc_id bigint, text string").parquet(src),
                     out, ckpt, trigger_available_now=False, state_ttl_ms=TTL)

    def caught_up():
        # the restarted query may REPLAY batch 1 first (state rows == 2
        # from A,B) -- require the re-admitted doc-9 output row too, so
        # the poll can't release on the replayed batch
        rows = [p["stateOperators"][0]["numRowsTotal"]
                for p in q.recentProgress if p.get("stateOperators")]
        pdf = out_pdf()
        return (rows and rows[-1] == 2
                and len(pdf[(pdf.doc_id == 9) & pdf.is_new]) == 1)
    # state PLATEAUS: B's row evicted by the timeout, old-A re-stamped ->
    # 2 live rows (A, C), not 3 fingerprints ever seen
    poll(q, caught_up)
    q.stop()

    got = spark.read.parquet(out).toPandas()
    readmit = got[(got.doc_id == 9) & got.is_new]
    assert len(readmit) == 1                 # A re-admitted after the horizon
    assert int(readmit.n_seen.iloc[0]) == 1  # counts reset with the eviction
    assert sorted(got[got.is_new].doc_id) == [1, 2, 7, 9]
