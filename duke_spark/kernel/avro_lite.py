"""Minimal pure-Python Apache Avro object-container-file codec.

Implements the subset of the public Avro 1.x specification
(https://avro.apache.org/docs/current/specification/) needed by the
iceberg-lite table format (``duke_spark/sources/iceberg_lite.py``):
binary encoding for null / boolean / int / long / float / double /
bytes / string / record / array / map / union / fixed, and the object
container file framing (magic, metadata map with ``avro.schema``,
16-byte sync marker, ``null`` codec blocks).

Spec conformance of the writer is proven in
``tests/test_iceberg_lite.py`` by reading files produced here with the
official Apache Avro *Java* library bundled in Spark's JVM
(``org.apache.avro.file.DataFileReader``) via py4j — no Python Avro
package exists in this sandbox.

No reference-repo analogue (the reference reads CSV only,
``Duke/dataset.py:37``); this exists so the Iceberg production-source
path can actually execute in a jar-less environment.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
from typing import Any, BinaryIO

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- encoding


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: BinaryIO, n: int) -> None:
    n = _zigzag(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: BinaryIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def write_bytes(buf: BinaryIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: BinaryIO) -> bytes:
    return buf.read(read_long(buf))


def _schema_type(schema: Any) -> Any:
    """Normalize a schema node: dict with 'type', bare string, or union list."""
    if isinstance(schema, dict):
        return schema["type"]
    return schema


def encode(buf: BinaryIO, schema: Any, value: Any) -> None:
    """Binary-encode ``value`` per ``schema`` (parsed JSON form)."""
    if isinstance(schema, list):  # union: pick first matching branch
        idx = _union_branch(schema, value)
        write_long(buf, idx)
        encode(buf, schema[idx], value)
        return
    t = _schema_type(schema)
    if isinstance(t, (list, dict)):  # e.g. {"type": [...]} or nested complex
        encode(buf, t, value)
    elif t == "null":
        pass
    elif t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_bytes(buf, bytes(value))
    elif t == "string":
        write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        size = schema["size"]
        if len(value) != size:
            raise ValueError(f"fixed size {size} != {len(value)}")
        buf.write(bytes(value))
    elif t == "record":
        for field in schema["fields"]:
            encode(buf, field["type"], value[field["name"]])
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                encode(buf, schema["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, k.encode("utf-8"))
                encode(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise NotImplementedError(f"avro_lite: unsupported type {t!r}")


def _union_branch(union: list, value: Any) -> int:
    for i, branch in enumerate(union):
        bt = _schema_type(branch)
        if value is None and bt == "null":
            return i
        if value is not None and bt != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {union!r}")


def decode(buf: BinaryIO, schema: Any) -> Any:
    if isinstance(schema, list):
        return decode(buf, schema[read_long(buf)])
    t = _schema_type(schema)
    if isinstance(t, (list, dict)):
        return decode(buf, t)
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
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                read_long(buf)
            for _ in range(n):
                out.append(decode(buf, schema["items"]))
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
                out[k] = decode(buf, schema["values"])
    raise NotImplementedError(f"avro_lite: unsupported type {t!r}")


# ----------------------------------------------------- object container file


def write_container(path: str, schema: dict, records: list[dict],
                    sync_seed: str | None = None) -> None:
    """Write an Avro object container file (null codec, single block).

    ``sync_seed`` makes the 16-byte sync marker deterministic (derived by
    md5) so fixture files are byte-stable across regenerations.
    """
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = hashlib.md5(
        (sync_seed if sync_seed is not None else path).encode()
    ).digest()
    meta_schema = {"type": "map", "values": "bytes"}
    body = io.BytesIO()
    for rec in records:
        encode(body, schema, rec)
    with open(path, "wb") as f:
        f.write(MAGIC)
        head = io.BytesIO()
        encode(head, meta_schema, {
            "avro.schema": schema_json.encode("utf-8"),
            "avro.codec": b"null",
        })
        f.write(head.getvalue())
        f.write(sync)
        if records:
            blk = io.BytesIO()
            write_long(blk, len(records))
            write_bytes(blk, body.getvalue())
            f.write(blk.getvalue())
            f.write(sync)


def read_container(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object container file → (schema, records).

    Handles multi-block files and the ``null`` codec (the only codec the
    writer emits; others raise).
    """
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta = decode(buf, {"type": "map", "values": "bytes"})
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise NotImplementedError(f"avro_lite: codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    records: list[dict] = []
    while buf.tell() < len(data):
        count = read_long(buf)
        block = read_bytes(buf)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(decode(bbuf, schema))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records
