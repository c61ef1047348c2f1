"""Hudi merge-on-read LOG FILE codec — reader and writer for the
block-framed ``.log`` format from the public storage spec
(https://hudi.apache.org/tech-specs/#log-file-format), stdlib +
``avro_codec`` only.

This is the missing half of MoR interop: the reference's Flink jobs
write MERGE_ON_READ tables (``'table.type' = 'MERGE_ON_READ'``,
CDC-Hudi-Notebook.zpln:292 ¶7), whose un-compacted changes live in
exactly these log files; ``hudi_interop.read_hudi`` previously gated
on their presence. With this codec the real-time view is served:
base parquet ∪ decoded log records, merged per record key in log
order (see ``hudi_interop.read_hudi(merge_logs=True)``).

Framing (one block; multi-block files are these back to back):

    magic                6 bytes  ``#HUDI#``
    block length         8 bytes  big-endian long — bytes AFTER this
                                  field up to and including the
                                  trailing total-length field
    log format version   4 bytes  big-endian int (1)
    block type           4 bytes  big-endian int — ordinal of
                                  command=0, delete=1, corrupt=2,
                                  avro=3, hfile=4, parquet=5, cdc=6
    header               map<int ordinal, utf8 string>: count (int),
                                  then per entry ordinal (int), value
                                  length (int), value bytes. Ordinals:
                                  INSTANT_TIME=0, TARGET_INSTANT_TIME=1,
                                  SCHEMA=2, COMMAND_BLOCK_TYPE=3
    content length       8 bytes
    content              see per-type layouts below
    footer               map, same encoding as header
    total block length   8 bytes  — whole block INCLUDING magic (the
                                  spec keeps it for reverse traversal)

Per-type content:

- AVRO data block: format version (int), record count (int), then per
  record: length (int) + Avro binary-encoded record against the
  writer schema carried in header[SCHEMA].
- DELETE block: format version (int), payload length (int), then an
  Avro binary array of DeleteRecord {recordKey: string,
  partitionPath: string, orderingVal: long} (the spec's delete
  payload reduced to its key fields).
- COMMAND block: empty content; header[COMMAND_BLOCK_TYPE]='0' is
  ROLLBACK_BLOCK — a reader must skip every earlier block whose
  header[INSTANT_TIME] equals header[TARGET_INSTANT_TIME].

Conformance note: validated against the spec text and by
write→read round-trip + merge-semantics tests (no Hudi runtime ships
in this container to cross-check byte-for-byte); the framing fields
and ordinals above are the spec's, so divergence risk concentrates
in the map/record inner encodings, kept deliberately minimal.
"""

from __future__ import annotations

import io
import os
import struct

from .avro_codec import AvroError, _decode, _encode

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

BLOCK_TYPES = {
    "command": 0,
    "delete": 1,
    "corrupt": 2,
    "avro": 3,
    "hfile": 4,
    "parquet": 5,
    "cdc": 6,
}
_TYPE_NAMES = {v: k for k, v in BLOCK_TYPES.items()}

# header/footer metadata ordinals (spec HeaderMetadataType)
INSTANT_TIME = 0
TARGET_INSTANT_TIME = 1
SCHEMA = 2
COMMAND_BLOCK_TYPE = 3

_DELETE_RECORD_SCHEMA = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "DeleteRecord",
        "fields": [
            {"name": "recordKey", "type": "string"},
            {"name": "partitionPath", "type": "string"},
            {"name": "orderingVal", "type": "long"},
        ],
    },
}


def _write_meta_map(out: bytearray, meta: dict[int, str]) -> None:
    out.extend(struct.pack(">i", len(meta)))
    for k in sorted(meta):
        v = meta[k].encode("utf-8")
        out.extend(struct.pack(">i", int(k)))
        out.extend(struct.pack(">i", len(v)))
        out.extend(v)


def _read_meta_map(buf: io.BytesIO) -> dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out: dict[int, str] = {}
    for _ in range(n):
        k, vl = struct.unpack(">ii", buf.read(8))
        out[k] = buf.read(vl).decode("utf-8")
    return out


def _avro_record_bytes(schema: dict, value) -> bytes:
    out = bytearray()
    _encode(schema, value, out, {})
    return bytes(out)


def _decode_avro_record(schema: dict, data: bytes):
    return _decode(schema, io.BytesIO(data), {})


def encode_block(
    block_type: str,
    header: dict[int, str],
    records: list | None = None,
    schema: dict | None = None,
    footer: dict[int, str] | None = None,
) -> bytes:
    """One framed log block. ``records`` are Avro values for
    ``avro`` blocks (encoded against ``schema``, which is also
    embedded in the header) or DeleteRecord dicts for ``delete``
    blocks."""
    import json as _json

    if block_type == "avro":
        if schema is None:
            raise AvroError("avro block needs a writer schema")
        header = dict(header)
        header[SCHEMA] = _json.dumps(schema)
        content = bytearray()
        content.extend(struct.pack(">i", 3))  # data-block format version
        content.extend(struct.pack(">i", len(records or [])))
        for rec in records or []:
            rb = _avro_record_bytes(schema, rec)
            content.extend(struct.pack(">i", len(rb)))
            content.extend(rb)
    elif block_type == "delete":
        payload = _avro_record_bytes(_DELETE_RECORD_SCHEMA, records or [])
        content = bytearray()
        content.extend(struct.pack(">i", 1))  # delete-block version
        content.extend(struct.pack(">i", len(payload)))
        content.extend(payload)
    elif block_type == "command":
        content = bytearray()
    else:
        raise AvroError(f"unsupported log block type {block_type!r}")

    body = bytearray()
    body.extend(struct.pack(">i", LOG_FORMAT_VERSION))
    body.extend(struct.pack(">i", BLOCK_TYPES[block_type]))
    _write_meta_map(body, header)
    body.extend(struct.pack(">q", len(content)))
    body.extend(content)
    _write_meta_map(body, footer or {})
    # total block length = whole block including magic
    total = len(MAGIC) + 8 + len(body) + 8
    out = bytearray()
    out.extend(MAGIC)
    out.extend(struct.pack(">q", len(body) + 8))  # after this field
    out.extend(body)
    out.extend(struct.pack(">q", total))
    return bytes(out)


def decode_blocks(data: bytes) -> list[dict]:
    """All blocks of a log file → [{type, header, footer, records}]
    (records = Avro values for avro blocks, DeleteRecord dicts for
    delete blocks, [] for command blocks). A truncated trailing block
    (writer crash) is surfaced as type='corrupt' and ends the scan —
    readers treat bytes past the last whole block as garbage, like
    Hudi's corrupt-block handling."""
    import json as _json

    blocks: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + len(MAGIC)] != MAGIC:
            blocks.append({"type": "corrupt", "header": {}, "records": []})
            break
        try:
            (blen,) = struct.unpack(
                ">q", data[pos + len(MAGIC) : pos + len(MAGIC) + 8]
            )
            start = pos + len(MAGIC) + 8
            end = start + blen - 8  # body end; trailing total follows
            if end + 8 > n or end < start:
                raise ValueError("truncated")
            buf = io.BytesIO(data[start : end + 8])
            (version,) = struct.unpack(">i", buf.read(4))
            (btype,) = struct.unpack(">i", buf.read(4))
            header = _read_meta_map(buf)
            (clen,) = struct.unpack(">q", buf.read(8))
            content = buf.read(clen)
            footer = _read_meta_map(buf)
            (total,) = struct.unpack(">q", buf.read(8))
            if total != len(MAGIC) + 8 + blen:
                raise ValueError("length mismatch")
        except Exception:
            blocks.append({"type": "corrupt", "header": {}, "records": []})
            break
        name = _TYPE_NAMES.get(btype, "corrupt")
        records: list = []
        if name == "avro":
            schema = _json.loads(header[SCHEMA])
            cb = io.BytesIO(content)
            (_fmt,) = struct.unpack(">i", cb.read(4))
            (cnt,) = struct.unpack(">i", cb.read(4))
            for _ in range(cnt):
                (rl,) = struct.unpack(">i", cb.read(4))
                records.append(
                    _decode_avro_record(schema, cb.read(rl))
                )
        elif name == "delete":
            cb = io.BytesIO(content)
            (_ver,) = struct.unpack(">i", cb.read(4))
            (pl,) = struct.unpack(">i", cb.read(4))
            records = _decode_avro_record(
                _DELETE_RECORD_SCHEMA, cb.read(pl)
            )
        blocks.append(
            {
                "type": name,
                "header": header,
                "footer": footer,
                "records": records,
            }
        )
        pos += len(MAGIC) + 8 + blen
    return blocks


def apply_rollbacks(blocks: list[dict]) -> list[dict]:
    """Apply COMMAND/rollback blocks: drop earlier blocks whose
    INSTANT_TIME equals the rollback's TARGET_INSTANT_TIME (the
    spec's ROLLBACK_BLOCK semantics), and the command blocks
    themselves."""
    out: list[dict] = []
    for b in blocks:
        if b["type"] == "command":
            tgt = b["header"].get(TARGET_INSTANT_TIME)
            out = [
                x
                for x in out
                if x["header"].get(INSTANT_TIME) != tgt
            ]
            continue
        if b["type"] == "corrupt":
            continue
        out.append(b)
    return out


def write_log_file(path: str, blocks_bytes: list[bytes]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        for b in blocks_bytes:
            fh.write(b)


def read_log_file(path: str) -> list[dict]:
    with open(path, "rb") as fh:
        return decode_blocks(fh.read())


def log_file_name(
    file_id: str, base_instant: str, version: int = 1, token: str = "0-1-0"
) -> str:
    """Spec naming: ``.{fileId}_{baseInstant}.log.{version}_{token}``
    (log files are dot-hidden so plain parquet listers skip them)."""
    return f".{file_id}_{base_instant}.log.{version}_{token}"
