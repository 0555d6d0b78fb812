"""Unit tests for the shared spec kernels (SURVEY.md section 5 strategy #1,
mirroring the reference's recovered unit-test surface: slicing invariants,
parameter validation, round-trips)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from p_id_text_extraction_spark.config import DEFAULT_CONFIG, ExtractConfig
from p_id_text_extraction_spark.oracle import spec
from p_id_text_extraction_spark.oracle.pipeline import cluster, extract_turn, merge, suppress


# --- segmentation (sahi_slicer.py:79-135 analogues) -----------------------

@given(st.integers(min_value=0, max_value=5000))
@settings(max_examples=200, deadline=None)
def test_segment_covers_every_char(n):
    blocks = spec.segment_offsets(n)
    if n == 0:
        assert blocks == []
        return
    covered = set()
    for idx, s, e in blocks:
        assert 0 <= s < e <= n
        covered.update(range(s, e))
    assert covered == set(range(n))
    # block_idx contiguous from 0
    assert [b[0] for b in blocks] == list(range(len(blocks)))


def test_segment_short_input_single_block():
    # min-image-size guard analogue (sahi_slicer.py:71-76)
    assert spec.segment_offsets(10) == [(0, 0, 10)]
    assert spec.segment_offsets(256) == [(0, 0, 256)]


def test_segment_overlap_ratio():
    cfg = DEFAULT_CONFIG
    blocks = spec.segment_offsets(cfg.block_size * 4)
    for (_, s1, e1), (_, s2, _e2) in zip(blocks, blocks[1:]):
        overlap = e1 - s2
        assert overlap >= int(cfg.block_size * cfg.overlap) - 1


def test_config_validation():
    # parameter validation analogue (sahi_slicer.py:47-51)
    with pytest.raises(ValueError):
        ExtractConfig(overlap=0.0).validate()
    with pytest.raises(ValueError):
        ExtractConfig(overlap=1.0).validate()
    with pytest.raises(ValueError):
        ExtractConfig(block_size=32).validate()


# --- parse (PDF_to_image.py analogues) -------------------------------------

def test_parse_plain():
    assert spec.parse_payload("hello world", "user", None) == ("hello world", "plain")


def test_parse_empty_and_none():
    assert spec.parse_payload(None, None, None) == ("", "plain")
    assert spec.parse_payload("   ", "user", None) == ("", "plain")


def test_parse_tool_json_unwrap():
    norm, kind = spec.parse_payload('{"status":"ok","text":"inner payload"}', "tool", "exec")
    assert (norm, kind) == ("inner payload", "tool_json")


def test_parse_tool_json_invalid_falls_back():
    norm, kind = spec.parse_payload("{not json}", "tool", "exec")
    assert kind == "plain"
    assert norm == "{not json}"


def test_parse_html_blocks_and_entities():
    html = "<div><p>Alpha &amp; beta</p><p>Gamma</p></div>"
    norm, kind = spec.parse_payload(html, "assistant", None)
    assert kind == "html"
    assert norm == "Alpha & beta\nGamma"


def test_parse_html_drops_script_style_comments():
    html = ('<div><p>Visible text</p><script type="text/javascript">var x = "hidden";'
            '</script><style>.a { color: red }</style><!-- secret --><p>More text</p></div>')
    norm, kind = spec.parse_payload(html, None, None)
    assert kind == "html"
    assert norm == "Visible text\nMore text"


def test_parse_markdown_detected():
    norm, kind = spec.parse_payload("# Title\nbody text", "assistant", None)
    assert kind == "markdown"
    assert norm == "# Title\nbody text"


# --- detect (text_detection.py analogues) ---------------------------------

def test_detect_content_run():
    text = "This is a perfectly normal sentence about engineering work."
    spans = spec.detect_spans(text, 0, len(text))
    assert len(spans) == 1
    s, e, kind, conf = spans[0]
    assert (s, e) == (0, len(text))
    assert kind == "content"
    assert conf > 900


def test_detect_boiler_lines_dropped():
    text = "Home | About | Contact\nReal content sentence here.\nhttps://example.com/spam"
    spans = spec.detect_spans(text, 0, len(text))
    assert len(spans) == 1
    s, e, _, _ = spans[0]
    assert text[s:e] == "Real content sentence here."


def test_detect_code_kind():
    text = "    x = compute(1)\n    y = compute(2)"
    spans = spec.detect_spans(text, 0, len(text))
    assert len(spans) == 1
    assert spans[0][2] == "code"


def test_detect_empty():
    assert spec.detect_spans("", 0, 0) == []
    assert spec.detect_spans("   \n  ", 0, 6) == []


# --- suppress / cluster / merge vs brute-force oracle ----------------------

def brute_force_suppress(cands, thresh_milli=900):
    """Independent re-statement of the sweep spec for cross-checking."""
    ordered = sorted(cands, key=lambda c: (c["start"], -c["end"], c["kind"], c["block_idx"]))
    kept, runmax = [], None
    for c in ordered:
        drop = False
        if runmax is not None and runmax > c["start"]:
            cov = min(c["end"], runmax) - c["start"]
            drop = 1000 * cov >= thresh_milli * (c["end"] - c["start"])
        if not drop:
            kept.append(c)
        runmax = c["end"] if runmax is None else max(runmax, c["end"])
    return kept


def _mk(start, end, idx=0, kind="content", conf=990):
    return {"start": start, "end": end, "block_idx": idx, "block_id": f"c_0_B{idx:04d}",
            "kind": kind, "conf_milli": conf, "line_start": start, "line_end": end}


def test_suppress_containment():
    cands = [_mk(0, 100, 0), _mk(10, 60, 1), _mk(95, 300, 2)]
    kept = suppress(cands)
    assert [(c["start"], c["end"]) for c in kept] == [(0, 100), (95, 300)]


def test_suppress_identical_duplicates():
    # near-duplicate keep-one (grouping_logic.py:574-599 analogue)
    cands = [_mk(5, 50, 0), _mk(5, 50, 1)]
    kept = suppress(cands)
    assert len(kept) == 1
    assert kept[0]["block_idx"] == 0


@given(st.lists(st.tuples(st.integers(0, 400), st.integers(1, 120)), min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_suppress_matches_brute_force(pairs):
    cands = [_mk(s, s + ln, i) for i, (s, ln) in enumerate(pairs)]
    a = suppress(list(cands))
    b = brute_force_suppress(list(cands))
    assert [(c["start"], c["end"], c["block_idx"]) for c in a] == \
           [(c["start"], c["end"], c["block_idx"]) for c in b]


def test_cluster_gap_semantics():
    kept = [_mk(0, 10, 0), _mk(11, 20, 1), _mk(30, 40, 2)]  # gap 1 joins, gap 10 splits
    out = cluster(kept)
    assert [c["cluster_id"] for c in out] == [1, 1, 2]


def test_merge_provenance_sorted_set():
    clustered = [
        {**_mk(0, 10, 1), "cluster_id": 1},
        {**_mk(5, 20, 0), "cluster_id": 1, "kind": "code", "conf_milli": 800},
    ]
    m = merge(clustered)
    assert len(m) == 1
    assert m[0]["start"] == 0 and m[0]["end"] == 20
    assert m[0]["kind"] == "code"           # lexicographic min: code wins
    assert m[0]["conf_milli"] == 800        # min confidence
    assert m[0]["provenance"] == ["c_0_B0000", "c_0_B0001"]
    assert m[0]["is_grouped"] is True


# --- end-to-end oracle sanity ----------------------------------------------

def test_extract_turn_plain():
    rows = extract_turn("c", 0, "A short plain sentence of ordinary words.")
    assert len(rows) == 1
    r = rows[0]
    assert r["text"] == "A short plain sentence of ordinary words."
    assert r["span_rank"] == 1
    assert r["start"] == 0
    assert r["method"] == "primary"


def test_extract_turn_empty_yields_no_rows():
    assert extract_turn("c", 0, "") == []
    assert extract_turn("c", 0, None) == []
    assert extract_turn("c", 1, "   \t ") == []


def test_extract_turn_all_boiler_yields_zero_spans():
    # zero-span turn analogue (grouping_logic.py:549-556)
    rows = extract_turn("c", 0, "Home | About | Contact | Blog\n© 2026 Corp | Terms")
    assert rows == []


def test_extract_turn_html_strips_boilerplate():
    html = ('<html><body><nav><a href="/">Home</a> | <a href="/a">About</a> | '
            '<a href="/b">Blog</a></nav><div><p>Main content paragraph with many '
            'ordinary words inside it.</p></div>'
            '<footer>© 2026 Example | <a href="/t">Terms</a></footer></body></html>')
    rows = extract_turn("c", 0, html)
    assert len(rows) == 1
    assert "Main content paragraph" in rows[0]["text"]
    assert "Home" not in rows[0]["text"]
    assert "©" not in rows[0]["text"]


def test_extract_turn_crop_padding_clamped():
    text = "Word " * 30  # 150 chars, single content line
    rows = extract_turn("c", 0, text.strip())
    assert rows[0]["start"] == 0                     # clamp at 0 (max(0, 0-8))
    assert rows[0]["end"] == len(text.strip())       # clamp at n
