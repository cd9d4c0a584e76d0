"""Pure-Python Avro Object Container File reader (and a small writer
for fixtures/tests), used when the ``spark-avro`` connector jar is not
on the classpath.

The Avro 1.x container format is public and simple (magic ``Obj\\x01``,
a file-metadata map carrying the JSON schema and codec, a 16-byte sync
marker, then length-prefixed blocks): implementing it directly makes
``fmt="avro"`` a REAL source in this repo rather than a gated error —
the same pure-Python-codec approach as operators/codecs.py (BMP/PNG/
WAV/AVI).

Distribution shape: ``spark.read.format("binaryFile")`` lists the
container files (one row per file, whole-file content), and an
Arrow-batched ``mapInPandas`` decodes records — files decode in
parallel across tasks, no shuffle, no driver loop. The right fit for
the usual many-files Avro layout; a single multi-GB container file
would decode in one task (document, don't silently split: Avro blocks
CAN be split on sync markers, but binaryFile does not expose ranges).

Supported schema subset (covers what Spark's own writer emits for flat
frames): records of primitives (boolean/int/long/float/double/string/
bytes), nullable unions ``["null", T]`` / ``[T, "null"]``, and the
date / timestamp-millis / timestamp-micros logical types. Codecs:
``null`` and ``deflate``. Anything else raises with the offending
schema node.
"""

from __future__ import annotations

import datetime
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives (Avro spec: zigzag varint longs, little-endian IEEE)


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while n & ~0x7F:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# ---------------------------------------------------------------------------
# schema handling


def _normalize(node):
    """Schema node → (kind, nullable) where kind is a primitive name or
    primitive+logical tag. Raises on unsupported shapes."""
    if isinstance(node, list):  # union
        branches = [b for b in node if b != "null"]
        if len(node) > 2 or len(branches) != 1:
            raise ValueError(f"unsupported Avro union: {node!r}")
        kind, _ = _normalize(branches[0])
        return kind, True
    if isinstance(node, dict):
        logical = node.get("logicalType")
        base = node["type"]
        if logical == "date" and base == "int":
            return "date", False
        if logical == "timestamp-millis" and base == "long":
            return "timestamp-millis", False
        if logical == "timestamp-micros" and base == "long":
            return "timestamp-micros", False
        if logical is None and isinstance(base, str):
            return _normalize(base)
        raise ValueError(f"unsupported Avro logical type: {node!r}")
    if node in ("boolean", "int", "long", "float", "double", "string", "bytes"):
        return node, False
    raise ValueError(f"unsupported Avro type: {node!r}")


def parse_record_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """Container schema JSON → [(field_name, kind, nullable)]."""
    schema = json.loads(schema_json)
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    out = []
    for f in schema["fields"]:
        kind, nullable = _normalize(f["type"])
        out.append((f["name"], kind, nullable))
    return out


#: kind → Spark SQL type string (timestamps are instants → TimestampType,
#: matching the spark-avro connector's mapping)
SPARK_TYPES = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "date": "date",
    "timestamp-millis": "timestamp",
    "timestamp-micros": "timestamp",
}


def spark_schema_ddl(fields: list[tuple[str, str, bool]]) -> str:
    return ", ".join(f"`{n}` {SPARK_TYPES[k]}" for n, k, _ in fields)


# ---------------------------------------------------------------------------
# container decode


def read_header(buf: io.BytesIO) -> tuple[str, str, bytes]:
    """→ (schema_json, codec, sync_marker); leaves buf at first block."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:  # spec: negative count is followed by a byte size
            count = -count
            _read_long(buf)
        for _ in range(count):
            key = _read_bytes(buf).decode("utf-8")
            meta[key] = _read_bytes(buf)
    sync = buf.read(16)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec!r}")
    return meta["avro.schema"].decode("utf-8"), codec, sync


def _decode_value(buf: io.BytesIO, kind: str, nullable: bool):
    if nullable:
        # union branch index; we only support 2-branch null unions, and
        # writers may order them either way — branch resolution happens
        # in iter_records via the precomputed null-branch index
        raise AssertionError("handled by caller")
    if kind == "boolean":
        return buf.read(1) == b"\x01"
    if kind in ("int", "long"):
        return _read_long(buf)
    if kind == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if kind == "string":
        return _read_bytes(buf).decode("utf-8")
    if kind == "bytes":
        return _read_bytes(buf)
    if kind == "date":
        return _read_long(buf)  # days since epoch (caller converts)
    if kind in ("timestamp-millis", "timestamp-micros"):
        return _read_long(buf)
    raise ValueError(f"unsupported kind: {kind}")


def iter_records(content: bytes):
    """Yield dict records from one container file's bytes."""
    buf = io.BytesIO(content)
    schema_json, codec, sync = read_header(buf)
    schema = json.loads(schema_json)
    fields = []
    for f in schema["fields"]:
        kind, nullable = _normalize(f["type"])
        null_branch = None
        if nullable:
            node = f["type"]
            null_branch = node.index("null")
        fields.append((f["name"], kind, nullable, null_branch))
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n_records = _read_long(buf)
        block = _read_bytes(buf)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate, no header
        rbuf = io.BytesIO(block)
        for _ in range(n_records):
            rec = {}
            for name, kind, nullable, null_branch in fields:
                if nullable:
                    branch = _read_long(rbuf)
                    if branch == null_branch:
                        rec[name] = None
                        continue
                rec[name] = _decode_value(rbuf, kind, False)
            yield rec


# ---------------------------------------------------------------------------
# pandas bridge (the mapInPandas decode path in sources/columnar.py)


def container_to_pandas(content: bytes):
    """One container file's bytes → a pandas DataFrame whose dtypes
    Arrow converts losslessly to the Spark schema from
    ``spark_schema_ddl`` (dates → datetime.date, timestamps →
    naive datetime64[ns] interpreted in the UTC-pinned session)."""
    import pandas as pd

    buf = io.BytesIO(content)
    schema_json, _, _ = read_header(buf)
    fields = parse_record_schema(schema_json)
    rows = list(iter_records(content))
    epoch_day = datetime.date(1970, 1, 1)
    out = {}
    for name, kind, _ in fields:
        vals = [r[name] for r in rows]
        if kind in ("int", "long"):
            # nullable Int64 keeps 64-bit exactness (a plain DataFrame
            # constructor would float these when None is present)
            out[name] = pd.array(vals, dtype="Int64")
        elif kind in ("float", "double"):
            out[name] = pd.array(vals, dtype="float64")
        elif kind == "date":
            out[name] = pd.Series(
                [
                    None if d is None else epoch_day + datetime.timedelta(days=d)
                    for d in vals
                ],
                dtype="object",
            )
        elif kind == "timestamp-millis":
            out[name] = pd.to_datetime(pd.array(vals, dtype="Int64"), unit="ms")
        elif kind == "timestamp-micros":
            out[name] = pd.to_datetime(pd.array(vals, dtype="Int64"), unit="us")
        else:  # boolean / string / bytes
            out[name] = pd.Series(vals, dtype="object")
    return pd.DataFrame(out, columns=[n for n, _, _ in fields])


def pandas_to_records(pdf, fields: list[tuple[str, str, bool]]) -> list[dict]:
    """Fixture/test helper: pandas frame → Avro-ready record dicts
    (dates → epoch days, timestamps → epoch ms/µs ints)."""
    import pandas as pd

    epoch_day = datetime.date(1970, 1, 1)
    cols = {}
    for name, kind, _ in fields:
        s = pdf[name]
        if kind == "date":
            cols[name] = [
                None if v is None or v is pd.NaT
                else ((v.date() if hasattr(v, "date") else v) - epoch_day).days
                for v in s
            ]
        elif kind in ("timestamp-millis", "timestamp-micros"):
            unit = "ms" if kind == "timestamp-millis" else "us"
            ts = pd.to_datetime(s)
            cols[name] = [
                None if pd.isna(v)
                else int(v.value // (1_000_000 if unit == "ms" else 1_000))
                for v in ts
            ]
        elif kind in ("int", "long"):
            cols[name] = [None if pd.isna(v) else int(v) for v in s]
        elif kind in ("float", "double"):
            cols[name] = [None if pd.isna(v) else float(v) for v in s]
        elif kind == "boolean":
            cols[name] = [None if pd.isna(v) else bool(v) for v in s]
        else:  # string / bytes pass through
            cols[name] = [None if v is None or v is pd.NaT else v for v in s]
    names = [n for n, _, _ in fields]
    return [
        {n: cols[n][i] for n in names} for i in range(len(pdf))
    ]


# ---------------------------------------------------------------------------
# writer (fixtures/tests; one block, optional deflate)


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    codec: str = "null",
    sync: bytes = b"\x00" * 16,
) -> None:
    fields = []
    for f in schema["fields"]:
        kind, nullable = _normalize(f["type"])
        null_branch = f["type"].index("null") if nullable else None
        fields.append((f["name"], kind, nullable, null_branch))

    body = bytearray()
    for rec in records:
        for name, kind, nullable, null_branch in fields:
            v = rec.get(name)
            if nullable:
                if v is None:
                    _write_long(body, null_branch)
                    continue
                _write_long(body, 1 - null_branch)
            if kind == "boolean":
                body.append(1 if v else 0)
            elif kind in ("int", "long", "date", "timestamp-millis",
                          "timestamp-micros"):
                _write_long(body, int(v))
            elif kind == "float":
                body += struct.pack("<f", v)
            elif kind == "double":
                body += struct.pack("<d", v)
            elif kind == "string":
                enc = v.encode("utf-8")
                _write_long(body, len(enc))
                body += enc
            elif kind == "bytes":
                _write_long(body, len(v))
                body += v
            else:  # pragma: no cover
                raise ValueError(f"unsupported kind: {kind}")

    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        payload = co.compress(payload) + co.flush()

    out = bytearray()
    out += MAGIC
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        enc = k.encode("utf-8")
        _write_long(out, len(enc))
        out += enc
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)  # end of metadata map
    out += sync
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out += payload
    out += sync
    with open(path, "wb") as fh:
        fh.write(out)
