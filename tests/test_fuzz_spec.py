"""Fuzz the spec kernels: arbitrary text must never crash, and oracle
outputs must satisfy structural invariants whatever the input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from p_id_text_extraction_spark.oracle import spec
from p_id_text_extraction_spark.oracle.pipeline import extract_turn

text_strategy = st.one_of(
    st.text(max_size=600),
    st.text(alphabet="<>/ab&;#{}\"|·©\n\t ", max_size=400),   # tag/json/boiler soup
    st.builds(lambda s: "{" + s + "}", st.text(max_size=200)),  # almost-JSON
    st.builds(lambda w: " ".join(w), st.lists(st.sampled_from(
        ["word", "the", "|", "https://x.y", "```", "    code", "<p>", "</p>", "&amp;"]
    ), max_size=60)),
)


@given(text_strategy)
@settings(max_examples=300, deadline=None)
def test_parse_never_crashes_and_detect_bounds(text):
    norm, kind = spec.parse_payload(text, "user", None)
    assert kind in ("plain", "markdown", "html", "tool_json")
    n = len(norm)
    for idx, s, e in spec.segment_offsets(n):
        assert 0 <= s < e <= n
        for ls, le, k, conf in spec.detect_spans(norm, s, e):
            assert 0 <= ls < le <= e - s
            assert k in ("content", "code")
            assert 0 <= conf <= 1000


@given(text_strategy)
@settings(max_examples=150, deadline=None)
def test_oracle_output_invariants(text):
    rows = extract_turn("c", 0, text)
    norm, _ = spec.parse_payload(text, None, None)
    n = len(norm)
    prev_start = -1
    for i, r in enumerate(rows, start=1):
        assert r["span_rank"] == i
        assert 0 <= r["start"] < r["end"] <= n
        assert r["start"] >= prev_start            # sorted by start
        prev_start = r["start"]
        assert r["text"]                            # F6: never empty
        assert r["method"] in ("primary", "fallback")
        assert 0.0 <= r["confidence"] <= 1.0
        assert r["provenance"]
