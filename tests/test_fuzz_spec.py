"""Fuzz the spec kernels: arbitrary text must never crash, and oracle
outputs must satisfy structural invariants whatever the input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import re

from p_id_text_extraction_spark.oracle import spec
from p_id_text_extraction_spark.oracle.pipeline import extract_turn, extract_turn_staged

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
@settings(max_examples=200, deadline=None)
def test_fused_extract_turn_matches_staged(text):
    """The fused single-sweep extract_turn must be byte-equal to the
    stage-by-stage composition (suppress -> cluster -> merge -> finalize)."""
    assert extract_turn("c", 0, text) == extract_turn_staged("c", 0, text)


def _line_features_reference(line: str):
    """Spec re-statement of line_features with the regex-only counting path
    (the ASCII bytes.translate fast path must match this exactly)."""
    from p_id_text_extraction_spark.config import DEFAULT_CONFIG
    stripped = line.strip()
    ln = len(stripped)
    if ln == 0:
        return 0, 0, 0, False, True
    alnum = len(re.sub(r"[^\w ]", "", stripped))
    alnum_milli = (1000 * alnum) // ln
    is_code = line.startswith(("    ", "\t", "```"))
    is_boiler = (
        alnum_milli < DEFAULT_CONFIG.min_alnum_density_milli
        or "http://" in stripped or "https://" in stripped
        or stripped.count("|") >= 2
        or stripped.count("·") >= 2
        or "©" in stripped
        or (1000 * (ln - len(re.sub(r"[|·•,;/>\[\](){}=<]", "", stripped)))) // ln
           > DEFAULT_CONFIG.max_sep_density_milli
    )
    if is_code:
        is_boiler = False
    return alnum, alnum_milli, ln, is_code, is_boiler


@given(st.one_of(
    st.text(max_size=200),
    st.text(alphabet="ab |,;/>[](){}=<·•©\t_0. ", max_size=200),
))
@settings(max_examples=400, deadline=None)
def test_line_features_fast_path_matches_reference(line):
    assert spec.line_features(line) == _line_features_reference(line)


html_strategy = st.one_of(
    st.text(alphabet="<>/abp&;#\"= \n\tdivscriptlbr-!", max_size=400),
    st.builds(
        lambda parts: "".join(parts),
        st.lists(st.sampled_from([
            "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "text words",
            "&amp;", "&lt;", "&amp;lt;", "&nbsp;", "  ", "\n", "<script>var x;</script>",
            "<!-- c -->", "<a href='u'>L</a>", "dangling <tag", "> stray",
        ]), max_size=40),
    ),
)


@given(html_strategy)
@settings(max_examples=300, deadline=None)
def test_parse_html_fast_path_matches_per_block(html):
    fast = spec._parse_html(html)
    slow = spec._parse_html_blocks(
        spec._BLOCK_SPLIT_RE.split(spec._HTML_COMMENT_RE.sub("", spec._DROP_ELEMENT_RE.sub("", html)))
    )
    assert fast == slow


def test_html_escaped_entities_single_decode():
    """&amp; decodes last: '&amp;lt;' is the literal text '&lt;', not '<'."""
    norm, kind = spec.parse_payload("<p>a &amp;lt; b</p>", None, None)
    assert kind == "html"
    assert norm == "a &lt; b"


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


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_parse_canvas_matches_parse_payload(text):
    """The hot-path canvas parse (no payload-kind classification) must
    return exactly parse_payload's norm_text."""
    assert spec.parse_canvas(text) == spec.parse_payload(text, None, None)[0]


@given(text_strategy, st.sampled_from([(256, 0.1), (64, 0.5), (100, 0.25)]))
@settings(max_examples=250, deadline=None)
def test_detect_all_spans_matches_staged_composition(text, block):
    """The one-pass segment+detect+line_bounds kernel must be byte-equal to
    the staged reference composition, for several segmentation configs."""
    from p_id_text_extraction_spark.config import ExtractConfig
    cfg = ExtractConfig(block_size=block[0], overlap=block[1])
    norm = spec.parse_canvas(text)
    staged = [
        (idx, bs + s, bs + e, kind, conf, *spec.line_bounds(norm, bs + s, bs + e))
        for idx, bs, be in spec.segment_offsets(len(norm), cfg)
        for s, e, kind, conf in spec.detect_spans(norm, bs, be, cfg)
    ]
    assert spec.detect_all_spans(norm, cfg) == staged
