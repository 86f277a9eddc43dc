"""Minimal pure-Python BSON codec (bsonspec.org, spec version 1.1).

Closes the engine's BSON read/write surface (reference format list,
railgun/cli/process.go and the gss format table include `bson`) without an
external codec package. Scope: the element types a JSON-bridge row can
carry — double 0x01, string 0x02, document 0x03, array 0x04, binary 0x05
(subtype 0x00), bool 0x08, UTC datetime 0x09, null 0x0A, int32 0x10,
int64 0x12. Unknown type bytes raise with the offending tag rather than
desynchronizing the stream.

Files may hold multiple concatenated documents (the mongodump convention);
`loads_many` walks them by each document's leading length prefix.
"""

from __future__ import annotations

import datetime
import struct

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1
_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1


def _cstring(s: str) -> bytes:
    b = s.encode("utf-8")
    if b"\x00" in b:
        raise ValueError(f"BSON keys cannot contain NUL: {s!r}")
    return b + b"\x00"


def _encode_value(key: str, v) -> bytes:
    k = _cstring(key)
    if v is None:
        return b"\x0a" + k
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + k + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + k + struct.pack("<d", v)
    if isinstance(v, int):
        if _INT32_MIN <= v <= _INT32_MAX:
            return b"\x10" + k + struct.pack("<i", v)
        if _INT64_MIN <= v <= _INT64_MAX:
            return b"\x12" + k + struct.pack("<q", v)
        raise ValueError(f"integer out of int64 range for BSON: {v}")
    if isinstance(v, str):
        b = v.encode("utf-8")
        return b"\x02" + k + struct.pack("<i", len(b) + 1) + b + b"\x00"
    if isinstance(v, (bytes, bytearray, memoryview)):
        b = bytes(v)
        return b"\x05" + k + struct.pack("<i", len(b)) + b"\x00" + b
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        # integer floor-division millis: exact, and floors pre-epoch values
        # like Go's/pymongo's encoders (int(ts*1000) would truncate toward
        # zero, off by 1 ms for sub-ms pre-1970 datetimes)
        epoch = v - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        ms = epoch // datetime.timedelta(milliseconds=1)
        return b"\x09" + k + struct.pack("<q", ms)
    if isinstance(v, (list, tuple)):
        inner = b"".join(_encode_value(str(i), x) for i, x in enumerate(v))
        return b"\x04" + k + struct.pack("<i", len(inner) + 5) + inner + b"\x00"
    if isinstance(v, dict):
        return b"\x03" + k + dumps(v)
    raise TypeError(f"cannot encode {type(v).__name__} to BSON (key {key!r})")


def dumps(doc: dict) -> bytes:
    """Encode one document: int32 total length + elements + trailing NUL."""
    inner = b"".join(_encode_value(str(k), v) for k, v in doc.items())
    return struct.pack("<i", len(inner) + 5) + inner + b"\x00"


def _read_cstring(data: bytes, pos: int) -> tuple[str, int]:
    end = data.index(b"\x00", pos)
    return data[pos:end].decode("utf-8"), end + 1


def _decode_value(tag: int, data: bytes, pos: int):
    if tag == 0x01:
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if tag == 0x02:
        (n,) = struct.unpack_from("<i", data, pos)
        s = data[pos + 4 : pos + 4 + n - 1].decode("utf-8")
        return s, pos + 4 + n
    if tag in (0x03, 0x04):
        (n,) = struct.unpack_from("<i", data, pos)
        doc = _decode_doc(data[pos : pos + n])
        if tag == 0x04:
            try:
                return [doc[str(i)] for i in range(len(doc))], pos + n
            except KeyError:
                raise ValueError(
                    f"malformed BSON array at byte {pos}: keys are not the "
                    f"canonical '0'..'{len(doc) - 1}' (got {sorted(doc)[:8]})"
                ) from None
        return doc, pos + n
    if tag == 0x05:
        (n,) = struct.unpack_from("<i", data, pos)
        subtype = data[pos + 4]
        if subtype != 0x00:
            # old-binary (0x02) embeds an inner length; UUID/user subtypes
            # carry semantics we can't round-trip — raise, never corrupt
            raise ValueError(
                f"unsupported BSON binary subtype 0x{subtype:02x} at byte {pos}"
            )
        return bytes(data[pos + 5 : pos + 5 + n]), pos + 5 + n
    if tag == 0x08:
        return data[pos] != 0, pos + 1
    if tag == 0x09:
        (ms,) = struct.unpack_from("<q", data, pos)
        # integer timedelta arithmetic: fromtimestamp(ms/1000.0) loses
        # microseconds once |seconds| nears 2^53/1000 (year-9999 values
        # decode ~7us off), breaking the exact round-trip
        return (
            datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            + datetime.timedelta(milliseconds=ms),
            pos + 8,
        )
    if tag == 0x0A:
        return None, pos
    if tag == 0x10:
        return struct.unpack_from("<i", data, pos)[0], pos + 4
    if tag == 0x12:
        return struct.unpack_from("<q", data, pos)[0], pos + 8
    raise ValueError(f"unsupported BSON element type 0x{tag:02x} at byte {pos}")


def _decode_doc(data: bytes) -> dict:
    (total,) = struct.unpack_from("<i", data, 0)
    if total != len(data) or data[-1:] != b"\x00":
        raise ValueError(
            f"malformed BSON document: declared {total} bytes, got {len(data)}"
        )
    out: dict = {}
    pos = 4
    while pos < total - 1:
        tag = data[pos]
        key, pos = _read_cstring(data, pos + 1)
        out[key], pos = _decode_value(tag, data, pos)
    return out


def loads(data: bytes) -> dict:
    """Decode the FIRST document in `data`."""
    if len(data) < 5:
        raise ValueError(
            f"malformed BSON document: {len(data)} bytes, need at least 5"
        )
    (total,) = struct.unpack_from("<i", data, 0)
    return _decode_doc(bytes(data[:total]))


def loads_many(data: bytes) -> list[dict]:
    """Decode a stream of concatenated documents (mongodump layout)."""
    data = bytes(data)
    out, pos = [], 0
    while pos < len(data):
        (total,) = struct.unpack_from("<i", data, pos)
        if total < 5 or pos + total > len(data):
            raise ValueError(
                f"malformed BSON stream: document at byte {pos} declares "
                f"{total} bytes with {len(data) - pos} remaining"
            )
        out.append(_decode_doc(data[pos : pos + total]))
        pos += total
    return out
