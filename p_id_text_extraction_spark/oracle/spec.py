"""The extraction SPEC: pure-Python kernels shared by oracle and Spark UDFs.

This module is the single source of truth for the non-relational stages
(parse, segment, detect, normalize).  The Spark pipeline's Arrow-batched
pandas UDFs call *these functions* over each batch, and the pure-Python
oracle (`oracle/pipeline.py`) calls them too -- so per-turn byte-equality
between distributed run and oracle is structural, not statistical
(SURVEY.md section 7.3 hard part #1).

Reference parity (all citations into /root/reference):
  parse_payload    ~ PDF rasterization front stage   PDF_to_image.py:48-63
  segment_offsets  ~ SAHI overlapping tiling          src/data_loader/sahi_slicer.py:79-135
  detect_spans     ~ CRAFT per-tile detection + the rotation/orientation
                     classifier                       src/text_detection/text_detection.py:49-131
  normalize_text   ~ TrOCR primary + EasyOCR fallback src/text_detection/text_recognition.py:56-131

Determinism rules (so every engine agrees bit-for-bit):
  * all scores are integer milli-units until the final single division;
  * no floating aggregation anywhere in the kernels;
  * only ASCII-whitespace handling, explicit everywhere.
"""

from __future__ import annotations

import json
import re
from bisect import bisect_left

from p_id_text_extraction_spark.config import DEFAULT_CONFIG, ExtractConfig

# --- payload classification regexes (compiled once per process; the Spark
# analogue of loading the detector model once per executor,
# text_recognition.py:37-51) ---------------------------------------------
_HTML_TAG_RE = re.compile(
    r"<(?:p|div|a|li|ul|ol|nav|footer|header|h[1-6]|span|body|html|br|td|tr|table|article|section|main|aside)\b",
    re.IGNORECASE,
)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:p|div|li|ul|ol|nav|footer|header|h[1-6]|br|tr|table|article|section|main|aside|body|html)\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
# script/style payloads and comments are never content -- removed wholesale
# before block splitting (a browser wouldn't render them either)
_DROP_ELEMENT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_HTML_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_WS_RUN_RE = re.compile(r"[ \t\r\f\v]+")
# multi-space-only collapse for the gated fast path: when the text contains
# none of \t\r\f\v, _WS_RUN_RE can only rewrite runs of 2+ spaces -- and
# this pattern's literal "  " prefix lets the scanner skip single-space
# prose at memchr speed (measured 472 -> 58 ms over the bench html corpus;
# the r6 "top-level-alternation fast ws regex" negative result does NOT
# apply: no alternation here, the gate is 4 plain `in` probes)
_MULTISPACE_RE = re.compile(r"  +")
_URL_RE = re.compile(r"https?://")
_MD_MARKER_RE = re.compile(r"(?m)^(?:#{1,6} |- |\* |\d+\. |```)")

# &amp; decodes LAST (standard ordering for sequential replacement):
# decoding it first would double-decode escaped entities, e.g.
# "&amp;lt;" -> "&lt;" -> "<" instead of the correct literal "&lt;"
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# characters counted as "separators" for the link-farm / boilerplate
# heuristic (the text-density analogue of CRAFT's link-score map).
_SEP_CHARS = set("|·•,;/>[](){}=<>")

KIND_CONTENT = "content"
KIND_CODE = "code"

METHOD_PRIMARY = "primary"
METHOD_FALLBACK = "fallback"


# ---------------------------------------------------------------------------
# parse: raw payload -> normalized canvas text
# ---------------------------------------------------------------------------

def parse_payload(text: str | None, role: str | None, tool: str | None) -> tuple[str, str]:
    """Normalize a raw turn payload into canvas text.

    Analogue of the reference's PDF -> 600-DPI image rasterization
    (PDF_to_image.py:48-63): the downstream pipeline only ever sees the
    canvas.  Returns ``(norm_text, payload_kind)`` with payload_kind in
    {'plain','markdown','html','tool_json'}.
    """
    if text is None:
        return "", "plain"
    stripped = text.strip()
    if not stripped:
        return "", "plain"

    # tool-JSON unwrap: a JSON envelope with a nested text field
    # (FIXTURES.md payload mix #4).
    if stripped[0] == "{" and stripped[-1] == "}":
        try:
            obj = json.loads(stripped)
        except (ValueError, RecursionError):
            obj = None
        if isinstance(obj, dict):
            for key in ("text", "output", "content", "result"):
                val = obj.get(key)
                if isinstance(val, str):
                    return val, "tool_json"
            # JSON but no text field: canvas is the compact re-serialization
            return json.dumps(obj, sort_keys=True, separators=(",", ":")), "tool_json"

    # '<' memchr gate: 40%+ of payloads are plain prose with no tags at
    # all -- skip the alternation regex scan entirely for them (guide 1.2
    # step 2: per-task work).  _HTML_TAG_RE can only match at a '<'.
    if "<" in text and _HTML_TAG_RE.search(text):
        return _parse_html(text), "html"

    if _MD_MARKER_RE.search(text):
        return text, "markdown"
    return text, "plain"


def parse_canvas(text: str | None) -> str:
    """The canvas text alone -- ``parse_payload(text, None, None)[0]``
    without the markdown/plain classification, whose multiline anchored
    regex scan is pure overhead for callers that discard the payload kind
    (the hot extraction kernels do; markdown and plain both return the
    payload verbatim, so the canvas is identical either way).  Equality
    with parse_payload is property-pinned in tests/test_fuzz_spec.py."""
    if text is None:
        return ""
    stripped = text.strip()
    if not stripped:
        return ""
    if stripped[0] == "{" and stripped[-1] == "}":
        try:
            obj = json.loads(stripped)
        except (ValueError, RecursionError):
            obj = None
        if isinstance(obj, dict):
            for key in ("text", "output", "content", "result"):
                val = obj.get(key)
                if isinstance(val, str):
                    return val
            return json.dumps(obj, sort_keys=True, separators=(",", ":"))
    if "<" in text and _HTML_TAG_RE.search(text):
        return _parse_html(text)
    return text


# tag-strip regex for the joined fast path: identical to _ANY_TAG_RE within
# a block, and the \x00 exclusion stops a dangling '<' in one block from
# eating across the block separator into the next
_ANY_TAG_JOINED_RE = re.compile(r"<[^>\x00]+>")


def _parse_html(text: str) -> str:
    """HTML -> one canvas line per block-level element.

    Block tags split the document; inline tags are stripped; a handful of
    entities decode; intra-block whitespace runs collapse to one space.
    Empty blocks vanish.  Blocks join with '\\n' so line-level detection
    (detect_spans) sees one block per line.

    Fast path: blocks are joined with a '\\x00' sentinel so tag-stripping,
    entity decoding and whitespace collapsing each run ONCE over the whole
    document instead of once per block (none of those passes can cross the
    sentinel); per-block strip/newline-collapse then runs on the re-split.
    Payloads that already contain '\\x00' take the per-block slow path --
    the two are byte-equivalent (tests/test_fuzz_spec.py property).
    """
    text = _DROP_ELEMENT_RE.sub("", text)
    text = _HTML_COMMENT_RE.sub("", text)
    if "\x00" in text:
        return _parse_html_blocks(_BLOCK_SPLIT_RE.split(text))
    joined = "\x00".join(_BLOCK_SPLIT_RE.split(text))
    joined = _ANY_TAG_JOINED_RE.sub("", joined)
    # '&' memchr gate: entity-free payloads (the common case) skip all six
    # replace passes (measured 50ms -> 2ms over the bench html corpus)
    if "&" in joined:
        for ent, ch in _HTML_ENTITIES:
            joined = joined.replace(ent, ch)
    if "\t" in joined or "\r" in joined or "\f" in joined or "\v" in joined:
        joined = _WS_RUN_RE.sub(" ", joined)
    else:
        joined = _MULTISPACE_RE.sub(" ", joined)
    out: list[str] = []
    for b in joined.split("\x00"):
        b = b.strip()
        if "\n" in b:
            # a block may still contain newlines from source formatting;
            # collapse them so the block is exactly one canvas line
            b = " ".join(s for s in (p.strip() for p in b.split("\n")) if s)
        if b:
            out.append(b)
    return "\n".join(out)


def _parse_html_blocks(blocks: list[str]) -> str:
    """Per-block reference path (the executable spec the fast path must match)."""
    out: list[str] = []
    for raw in blocks:
        b = _ANY_TAG_RE.sub("", raw)
        for ent, ch in _HTML_ENTITIES:
            b = b.replace(ent, ch)
        b = _WS_RUN_RE.sub(" ", b).strip()
        b = " ".join(s for s in (p.strip() for p in b.split("\n")) if s)
        if b:
            out.append(b)
    return "\n".join(out)


# ---------------------------------------------------------------------------
# segment: canvas -> overlapping blocks with origins
# ---------------------------------------------------------------------------

def segment_offsets(n: int, cfg: ExtractConfig = DEFAULT_CONFIG) -> list[tuple[int, int, int]]:
    """Overlapping fixed-size char windows over a canvas of length ``n``.

    SAHI-style tiling (sahi_slicer.py:79-135): origins advance by
    ``step = block_size*(1-overlap)``; the final window is shifted left to
    end exactly at ``n`` so every char is covered (the 1-D analogue of
    SAHI's edge-tile shift).  Short inputs yield a single whole-canvas
    block (the min-image-size guard, sahi_slicer.py:71-76 analogue).

    Returns ``[(block_idx, start, end)]``.
    """
    if n <= 0:
        return []
    size, step = cfg.block_size, cfg.step
    if n <= size:
        return [(0, 0, n)]
    blocks: list[tuple[int, int, int]] = []
    idx = 0
    start = 0
    while True:
        if start + size >= n:
            blocks.append((idx, n - size, n))
            break
        blocks.append((idx, start, start + size))
        idx += 1
        start += step
    return blocks


def block_id(conv_id: str, turn_idx: int, idx: int) -> str:
    """Mint a block id, '{conv}_{turn}_B{idx:04d}' (sahi_slicer.py:106 analogue)."""
    return f"{conv_id}_{turn_idx}_B{idx:04d}"


# ---------------------------------------------------------------------------
# detect: per-block candidate spans + class + confidence
# ---------------------------------------------------------------------------

# single-pass counting regexes (hot path: one C-level scan each instead of
# per-char Python loops).  "alnum" is defined as regex word chars + space
# ([^\W] includes unicode letters/digits/underscore) -- the spec definition;
# oracle and UDF share this exact code so cross-impl equality is structural.
_NON_ALNUMSP_RE = re.compile(r"[^\w ]")
_SEP_RE = re.compile(r"[|·•,;/>\[\](){}=<]")

# ASCII fast path for the two counts: bytes.translate(None, delete) is a
# C memchr-style pass ~5x cheaper than the regex sub.  For ASCII input
# `[\w ]` is exactly [0-9A-Za-z_ ] and none of the non-ASCII separators
# (·, •) can occur, so the byte counts equal the regex counts
# (tests/test_fuzz_spec.py property pins the equivalence).
_ALNUMSP_BYTES = (
    b"0123456789"
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    b"abcdefghijklmnopqrstuvwxyz"
    b"_ "
)
_DEL_NON_ALNUMSP = bytes(b for b in range(128) if b not in _ALNUMSP_BYTES)
_SEP_BYTES = b"|,;/>[](){}=<"


def line_features(line: str) -> tuple[int, int, int, bool, bool]:
    """Per-line features, all integers.

    Returns ``(alnum_count, alnum_milli, stripped_len, is_code, is_boiler)``
    where the densities are in milli-units of the stripped line length.
    The density math is the 1-D analogue of CRAFT's text-region/link score
    maps (text_detection.py:72-99); ``is_code`` is the orientation
    classifier analogue (text_detection.py:106-115, rotation 0/90 ->
    content/code).
    """
    stripped = line.strip()
    ln = len(stripped)
    if ln == 0:
        return 0, 0, 0, False, True
    # survivors of removing non-(word|space) chars: bytes.translate on the
    # (overwhelmingly common) ASCII path, one regex sub() pass otherwise
    if stripped.isascii():
        sb = stripped.encode()
        alnum = len(sb.translate(None, _DEL_NON_ALNUMSP))
        sep_count = ln - len(sb.translate(None, _SEP_BYTES))
    else:
        sb = None
        alnum = len(_NON_ALNUMSP_RE.sub("", stripped))
        sep_count = -1  # computed lazily below only if needed
    alnum_milli = (1000 * alnum) // ln
    is_code = line.startswith(("    ", "\t", "```"))
    # boiler disjunction, cheapest-first with short-circuit; link-farm /
    # footer heuristics are the link-density analogue of the reference's
    # CRAFT link-score map (text_detection.py:72-99)
    is_boiler = (
        alnum_milli < DEFAULT_CONFIG.min_alnum_density_milli
        or "http://" in stripped or "https://" in stripped
        or stripped.count("|") >= 2
        or (sb is None and stripped.count("·") >= 2)
        or "©" in stripped
        or (1000 * (sep_count if sb is not None
                    else ln - len(_SEP_RE.sub("", stripped)))) // ln
           > DEFAULT_CONFIG.max_sep_density_milli
    )
    # code lines are low-density but are content, not boilerplate
    if is_code:
        is_boiler = False
    return alnum, alnum_milli, ln, is_code, is_boiler


def detect_spans(
    norm_text: str,
    b_start: int,
    b_end: int,
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> list[tuple[int, int, str, int]]:
    """Find candidate content spans inside one block.

    Operates on ``norm_text[b_start:b_end]``; maximal runs of consecutive
    content lines merge into one candidate (the detect stage,
    text_detection.py:49-104).  Line fragments cut by the block boundary
    are classified as-is -- the overlapping neighbour block sees the whole
    line, and suppression/clustering reconciles the duplicates, exactly as
    the reference's tile overlap + grouping does.

    Returns block-LOCAL ``[(s, e, kind, conf_milli)]`` with s < e.
    kind: 'code' iff more than half the run's chars sit on code-like lines.
    conf_milli: (1000 * alnum_chars) // run_chars over the run's lines --
    integer, so merge-stage aggregation stays exact.
    """
    block_text = norm_text[b_start:b_end]
    if not block_text:
        return []
    spans: list[tuple[int, int, str, int]] = []
    run_start: int | None = None
    run_alnum = 0
    run_len = 0
    code_len = 0
    pos = 0

    def flush(end_pos: int) -> None:
        nonlocal run_start, run_alnum, run_len, code_len
        if run_start is not None and end_pos > run_start:
            kind = KIND_CODE if 2 * code_len > run_len else KIND_CONTENT
            conf = (1000 * run_alnum) // run_len if run_len > 0 else 0
            spans.append((run_start, end_pos, kind, conf))
        run_start, run_alnum, run_len, code_len = None, 0, 0, 0

    for line in block_text.split("\n"):
        line_end = pos + len(line)
        alnum, _alnum_milli, stripped_len, is_code, is_boiler = line_features(line)
        if is_boiler or stripped_len == 0:
            flush(prev_end(pos, block_text))
        else:
            if run_start is None:
                # span starts at first non-space char of the line
                lead = len(line) - len(line.lstrip())
                run_start = pos + lead
            run_len += stripped_len
            run_alnum += alnum
            if is_code:
                code_len += stripped_len
        pos = line_end + 1  # +1 for the '\n'
    # close the final run at the last non-space char
    if run_start is not None:
        tail = len(block_text) - len(block_text.rstrip())
        flush(len(block_text) - tail)
    return spans


def line_bounds(norm_text: str, g_start: int, g_end: int) -> tuple[int, int]:
    """Line-boundary clamps for crop padding, turn-global.

    The reference pads crops into the raw image clamped only at image
    bounds (cropping_Images.py:44-47); in text space unrestricted padding
    would leak bytes of *adjacent (possibly boilerplate) lines* into the
    extracted span, so padding additionally clamps at the span's own line
    boundaries: ``line_start`` = char after the previous newline before
    g_start, ``line_end`` = next newline at/after g_end (or len).
    """
    ls = norm_text.rfind("\n", 0, g_start) + 1
    le = norm_text.find("\n", g_end)
    if le == -1:
        le = len(norm_text)
    return ls, le


def prev_end(pos: int, block_text: str) -> int:
    """End offset of the previous line run: strip trailing spaces before pos-1."""
    e = pos - 1 if pos > 0 else 0
    while e > 0 and block_text[e - 1] in " \t":
        e -= 1
    return e


def detect_all_spans(
    norm_text: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> list[tuple[int, int, int, str, int, int, int]]:
    """segment + detect + line_bounds over the WHOLE turn in one pass.

    Returns ``[(block_idx, g_start, g_end, kind, conf_milli, line_start,
    line_end)]`` in (block, position) order, byte-equal by construction to
    the staged reference composition

        for idx, bs, be in segment_offsets(len(norm_text), cfg):
            for s, e, kind, conf in detect_spans(norm_text, bs, be, cfg):
                (idx, bs + s, bs + e, kind, conf,
                 *line_bounds(norm_text, bs + s, bs + e))

    (property-pinned by tests/test_fuzz_spec.py).  This is the HOT path the
    distributed kernels call; the staged functions above stay as the
    executable spec.  What it saves (guide section 1.2 step 2, per-task
    work):
      * ONE newline index per turn feeds the per-block line split, and
        every candidate's line bounds fall out of the line loop's own
        state (the run's first line start; the flush newline) -- the
        staged ``line_bounds`` does an O(n) rfind/find per candidate,
        which is quadratic on long single-line payloads (a 200 KB
        mega-turn canvas has ~870 blocks, each paying a ~100 KB scan);
      * the per-line feature math is inlined (no per-line function call,
        tuple pack/unpack, or closure state);
      * no per-block ``norm_text[b_start:b_end]`` slice + re-split -- each
        line fragment is sliced exactly once.
    """
    n = len(norm_text)
    if n <= 0:
        return []
    size, step = cfg.block_size, cfg.step
    min_alnum = DEFAULT_CONFIG.min_alnum_density_milli
    max_sep = DEFAULT_CONFIG.max_sep_density_milli
    # newline index (positions of every '\n'), built with C-level find
    nls: list[int] = []
    find = norm_text.find
    i = find("\n")
    while i != -1:
        nls.append(i)
        i = find("\n", i + 1)
    n_nls = len(nls)

    out: list[tuple[int, int, int, str, int, int, int]] = []
    idx = 0
    b_start = 0
    while True:
        if n <= size:
            b_start, b_end = 0, n
            last_block = True
        elif b_start + size >= n:
            b_start, b_end = n - size, n
            last_block = True
        else:
            b_end = b_start + size
            last_block = False

        # line fragments of this block: newlines with position in
        # [b_start, b_end) act exactly like block_text.split('\n')
        lo = bisect_left(nls, b_start)
        hi = bisect_left(nls, b_end, lo)
        run_start = -1
        run_ls = 0                 # turn-global line start of the run's first line
        run_alnum = run_len = code_len = 0
        a = b_start
        j = lo
        while True:
            b = nls[j] if j < hi else b_end
            line = norm_text[a:b]
            stripped = line.strip()
            ln = len(stripped)
            if ln == 0:
                boiler = True
                is_code = False
            else:
                is_code = line.startswith(("    ", "\t", "```"))
                if stripped.isascii():
                    sb = stripped.encode()
                    alnum = len(sb.translate(None, _DEL_NON_ALNUMSP))
                    if is_code:
                        boiler = False
                    elif (1000 * alnum) // ln < min_alnum:
                        boiler = True
                    else:
                        # same disjunction, reordered so a clean prose line
                        # pays one translate + one 'http' probe instead of
                        # four scans: >=2 pipes implies sep_count >= 2
                        # ('|' is a separator byte), and 'http://' implies
                        # 'http' -- pure predicates, identical value.
                        # '©'/'·' probes dropped: impossible in ASCII.
                        sep_count = ln - len(sb.translate(None, _SEP_BYTES))
                        boiler = (
                            (1000 * sep_count) // ln > max_sep
                            or (sep_count >= 2 and stripped.count("|") >= 2)
                            or ("http" in stripped
                                and ("http://" in stripped or "https://" in stripped))
                        )
                else:
                    alnum = len(_NON_ALNUMSP_RE.sub("", stripped))
                    if is_code:
                        boiler = False
                    else:
                        boiler = (
                            (1000 * alnum) // ln < min_alnum
                            or "http://" in stripped or "https://" in stripped
                            or stripped.count("|") >= 2
                            or stripped.count("·") >= 2
                            or "©" in stripped
                            or (1000 * len(_SEP_RE.findall(stripped))) // ln > max_sep
                        )
            if boiler:
                if run_start >= 0:
                    # flush at prev_end: strip ' \t' back from the previous
                    # newline (a-1), never crossing the block start.  A run
                    # implies a prior content line, so a > b_start and a-1
                    # IS that previous newline -- which is also the span's
                    # line_end (first newline at/after the flush position:
                    # the back-strip never crosses a newline).
                    e = a - 1 if a > b_start else b_start
                    while e > b_start and norm_text[e - 1] in " \t":
                        e -= 1
                    if e > run_start:
                        kind = KIND_CODE if 2 * code_len > run_len else KIND_CONTENT
                        conf = (1000 * run_alnum) // run_len if run_len > 0 else 0
                        out.append((idx, run_start, e, kind, conf, run_ls, a - 1))
                    run_start = -1
                    run_alnum = run_len = code_len = 0
            else:
                if run_start < 0:
                    run_start = a + (len(line) - len(line.lstrip()))
                    # turn-global line start: a itself when a is a true
                    # line start (j > lo); the first fragment of a block
                    # may begin mid-line, whose line started before
                    # b_start (previous newline + 1, turn-global)
                    run_ls = a if j > lo else (nls[lo - 1] + 1 if lo > 0 else 0)
                run_len += ln
                run_alnum += alnum
                if is_code:
                    code_len += ln
            if j >= hi:
                break
            a = nls[j] + 1
            j += 1
        if run_start >= 0:
            # close the final run at the last non-whitespace char of the
            # block == end of the (content) last line rstripped; the last
            # fragment [a, b_end) holds no newline, so the span's line_end
            # is the first newline at/after b_end (nls[hi]) or n
            e = a + len(line.rstrip())
            if e > run_start:
                kind = KIND_CODE if 2 * code_len > run_len else KIND_CONTENT
                conf = (1000 * run_alnum) // run_len if run_len > 0 else 0
                out.append((idx, run_start, e, kind, conf, run_ls,
                            nls[hi] if hi < n_nls else n))

        if last_block:
            return out
        idx += 1
        b_start += step


# ---------------------------------------------------------------------------
# normalize: cropped span text -> final text with confidence gate
# ---------------------------------------------------------------------------

def normalize_text(cropped: str, conf_milli: int, cfg: ExtractConfig = DEFAULT_CONFIG) -> tuple[str, str]:
    """Primary normalizer with confidence-gated fallback.

    Analogue of TrOCR-then-EasyOCR (text_recognition.py:111-131): at or
    above the gate the primary normalizer (ASCII trim) runs; below it the
    fallback additionally collapses internal whitespace runs and joins with
    single spaces (the ' '.join of fallback fragments,
    text_recognition.py:92).  Returns ``(text, method)``.
    """
    if conf_milli >= cfg.conf_threshold_milli:
        return _ascii_strip(cropped), METHOD_PRIMARY
    parts = [p for p in _FALLBACK_WS_RE.split(cropped) if p]
    return " ".join(parts), METHOD_FALLBACK


_FALLBACK_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def _ascii_strip(s: str) -> str:
    return s.strip(" \t\r\n\f\v")
