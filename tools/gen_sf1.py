"""Derive a deterministic sf1 dataset (10x sf0.1) for the scale-step sweep.

The driver provides sf0.001/0.01/0.1 only; the posting-cap and
bucket-occupancy behavior of the dedup/ANN suite is scale-sensitive, so
round 3 runs CORRECTNESS + BENCH one step up.  sf1 is DERIVED from the
driver's sf0.1 tables (never hand-invented data): 10 shards, each with
every integer key offset by shard * (max_key + 1).

Shard-local structure is preserved and cross-shard structure is
deliberately broken:
  * documents: shard 0 is the original text; shards 1..9 apply a
    deterministic per-shard VOCABULARY TRANSLATION -- every token maps
    injectively to a shard-keyed pseudo-word (letters only, so quality
    densities survive), language-marker stopwords kept verbatim (so the
    lang-id mix survives).  A positional injective token map preserves
    exact-dup, near-dup, and n-gram-overlap structure INSIDE each shard
    bit-for-bit while shards share (almost) no vocabulary, so dup-pair
    counts scale exactly ~10x.  (First attempt sorted tokens by a
    shard-keyed hash -- that CANONICALIZES token order, turning any two
    vocabulary-overlapping docs into spurious near-dups: 90k pairs
    instead of ~3k.  Translation, not reordering.);
  * embeddings: each vector is cyclically rotated by the shard index
    (norm-preserving, so cosine structure within a shard is intact and
    LSH bucket occupancy grows 10x without 10 identical bucket tables);
  * region/nation stay as-is (fixed dimensions, like TPC-H).

Output: /tmp/spark_graft_sf1/*.parquet (same filenames as the driver's
dirs).  Fully deterministic -- rerunning produces identical bytes.

Usage: python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# GEN_SHARDS scales the keyed/relational tables; GEN_DOC_SHARDS scales
# documents+embeddings independently (the sf10 step scales ONLY the
# text/vector corpus 100x -- lineitem at 100x would be 60M rows of
# relational data the dedup/ANN suite never reads)
SHARDS = int(os.environ.get("GEN_SHARDS", "10"))
DOC_SHARDS = int(os.environ.get("GEN_DOC_SHARDS", str(SHARDS)))

# table -> {column: key domain}.  Offsets are computed PER DOMAIN (max
# over every participating column + 1), so foreign keys stay consistent
# across shards -- a per-table max would let orders.o_orderkey and
# lineitem.l_orderkey drift if the top order had no line items.
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventkey", "user_id": "userkey"},
}
# foreign keys into fixed dims (nation) and within-parent ordinals
# (l_linenumber) are NOT offset
COPY = ["region", "nation"]


# language-marker stopwords (operators/textstats.LANG_MARKERS words) kept
# verbatim so every shard's lang-id mix matches sf0.1's
KEEP = {"the", "and", "of", "to", "el", "la", "de", "que",
        "le", "et", "les", "der", "die", "und", "das"}
_LETTERS = str.maketrans("0123456789", "ghijklmnop")


def translate_tokens(text: str | None, shard: int) -> str | None:
    """Injective per-shard vocabulary substitution (identity for shard 0).
    Newlines survive (the repetition gate's line structure must scale)."""
    if text is None or shard == 0:
        return text
    salt = f"|{shard}".encode()

    def tr(t: str) -> str:
        if "\n" in t:
            return "\n".join(tr(p) for p in t.split("\n"))
        if t in KEEP or t == "":
            return t
        return hashlib.md5(t.encode() + salt).hexdigest()[:8].translate(_LETTERS)

    return " ".join(tr(t) for t in text.split(" "))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    # per-domain offsets: max over every column in the domain, +1
    domain_off: dict[str, int] = {}
    for t, keymap in KEYED.items():
        for col, dom in keymap.items():
            mx = con.execute(f"SELECT max({col}) FROM '{SRC}/{t}.parquet'").fetchone()[0]
            domain_off[dom] = max(domain_off.get(dom, 0), int(mx) + 1)

    for t, keymap in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        selects = []
        for shard in range(SHARDS):
            exprs = []
            for c in cols:
                if c in keymap:
                    exprs.append(f"{c} + {shard * domain_off[keymap[c]]} AS {c}")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'")
        union = "\nUNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    # documents: python-side deterministic vocabulary translation per
    # shard; n_chars re-derived from the translated text (sf0.1 satisfies
    # n_chars == length(text), and dimension validation must keep holding)
    con.create_function("shuf", translate_tokens, ["VARCHAR", "INTEGER"], "VARCHAR")
    ndoc = con.execute(f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    selects = [
        (f"SELECT doc_id + {s * ndoc} AS doc_id, shuf(text, {s}) AS text, lang, source, "
         f"length(shuf(text, {s})) AS n_chars FROM '{SRC}/documents.parquet'")
        for s in range(DOC_SHARDS)
    ]
    con.execute("COPY (" + "\nUNION ALL ".join(selects) + f") TO '{out}/documents.parquet' (FORMAT PARQUET)")

    # embeddings: cyclic rotation + per-shard deterministic SIGN FLIPS.
    # Rotation alone repeats at shard >= dim (shard 64 == shard 0 exactly
    # -> exact duplicate vectors across shards -> spurious cross-shard
    # dup pairs).  A diagonal +-1 transform preserves every within-shard
    # dot product EXACTLY (<Dx, Dy> == <x, y>) and norms, while making
    # every shard's vector set distinct; float*+-1 is bit-exact.
    nvec = con.execute(f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    dim = con.execute(f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1").fetchone()[0]

    def vec_expr(s: int) -> str:
        rot = s % dim
        terms = []
        for i in range(dim):
            j = ((i + rot) % dim) + 1           # 1-based source index
            sign = 1 if s == 0 or int(hashlib.md5(f"{s}|{i}".encode())
                                      .hexdigest(), 16) % 2 == 0 else -1
            terms.append(f"embedding[{j}]" if sign == 1 else f"-embedding[{j}]")
        return "[" + ", ".join(terms) + "]"

    selects = [
        (f"SELECT vec_id + {s * nvec} AS vec_id, "
         f"{vec_expr(s)} AS embedding "
         f"FROM '{SRC}/embeddings.parquet'")
        for s in range(DOC_SHARDS)
    ]
    con.execute("COPY (" + "\nUNION ALL ".join(selects) + f") TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

    counts = {}
    for t in list(COPY) + list(KEYED) + ["documents", "embeddings"]:
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        counts[t] = n
        print(t, n)
    # completion marker: a partially written dir (crashed/timed-out run)
    # must never be silently benchmarked as complete -- bench.py validates
    # this before reuse and regenerates otherwise.
    import json
    with open(os.path.join(out, "_COMPLETE"), "w") as fh:
        json.dump({"source": SRC, "shards": SHARDS, "doc_shards": DOC_SHARDS,
                   "counts": counts}, fh)


if __name__ == "__main__":
    main()
