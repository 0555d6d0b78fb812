"""Minimal Apache Avro object-container-file writer/reader (pure Python).

Iceberg's manifest and manifest-list files are Avro container files; the
sandbox has no avro/fastavro package and no network, so this module
implements the subset of the Avro 1.x spec those files need: null codec,
primitives (null/boolean/int/long/float/double/bytes/string), records,
arrays, maps, and unions.  Binary encoding follows the public spec
(zigzag varint longs, length-prefixed utf8, single-block arrays).

Independence check: tests/test_iceberg_format.py re-reads files written
here through org.apache.avro (the JVM library bundled with Spark) via
py4j -- a fully independent implementation -- and asserts record-level
equality, so spec compliance is verified, not assumed.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
from typing import Any

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive binary encoding
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    n = _zigzag(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def write_bytes(out: io.BytesIO, b: bytes) -> None:
    write_long(out, len(b))
    out.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


# ---------------------------------------------------------------------------
# schema-driven datum encoding
# ---------------------------------------------------------------------------


def _schema_type(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def write_datum(out: io.BytesIO, datum: Any, schema: Any) -> None:
    t = _schema_type(schema)
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        write_long(out, int(datum))
    elif t == "float":
        out.write(struct.pack("<f", float(datum)))
    elif t == "double":
        out.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        write_bytes(out, bytes(datum))
    elif t == "string":
        write_bytes(out, datum.encode("utf-8"))
    elif t == "union":
        # branch selection: None -> the null branch, else the first
        # non-null branch (Iceberg unions are always ["null", X])
        if datum is None:
            idx = next(i for i, s in enumerate(schema) if _schema_type(s) == "null")
            write_long(out, idx)
        else:
            idx, branch = next((i, s) for i, s in enumerate(schema)
                               if _schema_type(s) != "null")
            write_long(out, idx)
            write_datum(out, datum, branch)
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] not in datum and "default" not in f:
                raise ValueError(f"record {schema.get('name')}: missing field {f['name']}")
            write_datum(out, datum.get(f["name"], f.get("default")), f["type"])
    elif t == "array":
        items = list(datum)
        if items:
            write_long(out, len(items))
            for item in items:
                write_datum(out, item, schema["items"])
        write_long(out, 0)
    elif t == "map":
        entries = list(datum.items())
        if entries:
            write_long(out, len(entries))
            for k, v in entries:
                write_bytes(out, k.encode("utf-8"))
                write_datum(out, v, schema["values"])
        write_long(out, 0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


def read_datum(buf: io.BytesIO, schema: Any) -> Any:
    t = _schema_type(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "union":
        return read_datum(buf, schema[read_long(buf)])
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:   # block with byte-size prefix
                n = -n
                read_long(buf)
            for _ in range(n):
                out.append(read_datum(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                read_long(buf)
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"])
    raise NotImplementedError(f"avro type {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def write_container(path: str, schema: dict, records: list[dict],
                    metadata: dict[str, str] | None = None) -> None:
    """Write an Avro object container file (null codec, one data block).
    The sync marker is derived from the path so output is reproducible."""
    sync = hashlib.md5(("sync|" + path).encode()).digest()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    for k, v in (metadata or {}).items():
        meta[k] = v
    write_long(out, len(meta))
    for k, v in meta.items():
        write_bytes(out, k.encode("utf-8"))
        write_bytes(out, v.encode("utf-8"))
    write_long(out, 0)
    out.write(sync)
    if records:
        block = io.BytesIO()
        for rec in records:
            write_datum(block, rec, schema)
        data = block.getvalue()
        write_long(out, len(records))
        write_long(out, len(data))
        out.write(data)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def read_container(path: str) -> tuple[dict, list[dict], dict[str, str]]:
    """Read an Avro object container file -> (schema, records, metadata).
    Handles multi-block files and the null/deflate codecs (other writers'
    files may be deflate-compressed)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            read_long(buf)
        for _ in range(n):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        try:
            count = read_long(buf)
        except EOFError:
            break
        size = read_long(buf)
        data = buf.read(size)
        if codec == "deflate":
            import zlib
            data = zlib.decompress(data, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        block = io.BytesIO(data)
        for _ in range(count):
            records.append(read_datum(block, schema))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    text_meta = {k: v.decode("utf-8", "replace") for k, v in meta.items()
                 if k not in ("avro.schema",)}
    return schema, records, text_meta
