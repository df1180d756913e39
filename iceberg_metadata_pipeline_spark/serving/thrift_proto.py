"""Minimal Apache Thrift TBinaryProtocol codec (strict mode, unframed).

The reference's primary client path is JDBC/Thrift into HiveThriftServer2
(entrypoint-spark.sh:73; Superset connects via PyHive,
docker-compose.yml:48-65). This container has no ``thrift`` package, so
the wire format is implemented directly from the public protocol spec
(thrift/doc/specs/thrift-binary-protocol.md): strict message header
``0x8001 | message-type``, big-endian fixed-width ints, length-prefixed
strings, type-tagged struct fields terminated by STOP.

The value model is deliberately generic (no codegen):

- struct  → dict {field_id: (ttype, value)}
- list    → (elem_ttype, [value, ...])
- map     → (key_ttype, val_ttype, [(k, v), ...])
- string  → bytes (TCLIService uses binary and UTF-8 interchangeably;
  callers decode where they know it's text)
- bool/i8..i64/double → python bool/int/float

hs2.py builds TCLIService structs out of these primitives with the
field ids from Apache Hive's public TCLIService.thrift.
"""

from __future__ import annotations

import struct
from typing import BinaryIO

# thrift type ids (TType)
STOP = 0
BOOL = 2
BYTE = 3
DOUBLE = 4
I16 = 6
I32 = 8
I64 = 10
STRING = 11  # also BINARY on the wire
STRUCT = 12
MAP = 13
SET = 14
LIST = 15

# message types
MSG_CALL = 1
MSG_REPLY = 2
MSG_EXCEPTION = 3
MSG_ONEWAY = 4

_VERSION_1 = 0x80010000
_VERSION_MASK = 0xFFFF0000


class ThriftProtocolError(Exception):
    pass


# ---------------------------------------------------------------------------
# writer


class ThriftWriter:
    def __init__(self) -> None:
        self._buf = bytearray()

    def bytes(self) -> bytes:
        return bytes(self._buf)

    def write_message_begin(self, name: str, mtype: int, seqid: int) -> None:
        self._buf += struct.pack(">I", _VERSION_1 | mtype)
        self.write_value(STRING, name.encode())
        self._buf += struct.pack(">i", seqid)

    def write_value(self, ttype: int, value) -> None:
        b = self._buf
        if ttype == BOOL:
            b += b"\x01" if value else b"\x00"
        elif ttype == BYTE:
            b += struct.pack(">b", value)
        elif ttype == I16:
            b += struct.pack(">h", value)
        elif ttype == I32:
            b += struct.pack(">i", value)
        elif ttype == I64:
            b += struct.pack(">q", value)
        elif ttype == DOUBLE:
            b += struct.pack(">d", value)
        elif ttype == STRING:
            data = value.encode() if isinstance(value, str) else bytes(value)
            b += struct.pack(">i", len(data)) + data
        elif ttype == STRUCT:
            for fid in sorted(value):
                ftype, fval = value[fid]
                b += struct.pack(">bh", ftype, fid)
                self.write_value(ftype, fval)
            b += struct.pack(">b", STOP)
        elif ttype in (LIST, SET):
            etype, items = value
            b += struct.pack(">bi", etype, len(items))
            for it in items:
                self.write_value(etype, it)
        elif ttype == MAP:
            ktype, vtype, pairs = value
            if isinstance(pairs, dict):
                pairs = list(pairs.items())
            b += struct.pack(">bbi", ktype, vtype, len(pairs))
            for k, v in pairs:
                self.write_value(ktype, k)
                self.write_value(vtype, v)
        else:
            raise ThriftProtocolError(f"cannot write ttype {ttype}")


# ---------------------------------------------------------------------------
# reader (stream-based: thrift unframed transport carries no length prefix,
# so the reader must consume exactly one message from the socket file)


class ThriftReader:
    def __init__(self, stream: BinaryIO) -> None:
        self._s = stream

    def _read(self, n: int) -> bytes:
        chunks = b""
        while len(chunks) < n:
            part = self._s.read(n - len(chunks))
            if not part:
                raise EOFError("thrift stream closed mid-message")
            chunks += part
        return chunks

    def read_message_begin(self) -> tuple[str, int, int]:
        (header,) = struct.unpack(">I", self._read(4))
        if header & _VERSION_MASK != _VERSION_1:
            raise ThriftProtocolError(
                f"bad thrift version header 0x{header:08x} (strict binary only)"
            )
        mtype = header & 0xFF
        name = self.read_value(STRING).decode()
        (seqid,) = struct.unpack(">i", self._read(4))
        return name, mtype, seqid

    def read_value(self, ttype: int):
        if ttype == BOOL:
            return self._read(1) != b"\x00"
        if ttype == BYTE:
            return struct.unpack(">b", self._read(1))[0]
        if ttype == I16:
            return struct.unpack(">h", self._read(2))[0]
        if ttype == I32:
            return struct.unpack(">i", self._read(4))[0]
        if ttype == I64:
            return struct.unpack(">q", self._read(8))[0]
        if ttype == DOUBLE:
            return struct.unpack(">d", self._read(8))[0]
        if ttype == STRING:
            (n,) = struct.unpack(">i", self._read(4))
            if n < 0:
                raise ThriftProtocolError(f"negative string length {n}")
            return self._read(n)
        if ttype == STRUCT:
            fields = {}
            while True:
                ftype = struct.unpack(">b", self._read(1))[0]
                if ftype == STOP:
                    return fields
                (fid,) = struct.unpack(">h", self._read(2))
                fields[fid] = (ftype, self.read_value(ftype))
        if ttype in (LIST, SET):
            etype, n = struct.unpack(">bi", self._read(5))
            return (etype, [self.read_value(etype) for _ in range(n)])
        if ttype == MAP:
            ktype, vtype, n = struct.unpack(">bbi", self._read(6))
            return (
                ktype,
                vtype,
                [(self.read_value(ktype), self.read_value(vtype)) for _ in range(n)],
            )
        raise ThriftProtocolError(f"cannot read ttype {ttype}")


def write_message(name: str, mtype: int, seqid: int, body_struct: dict) -> bytes:
    """One full thrift message: header + a single struct payload."""
    w = ThriftWriter()
    w.write_message_begin(name, mtype, seqid)
    w.write_value(STRUCT, body_struct)
    return w.bytes()


def application_exception(name: str, seqid: int, message: str, exc_type: int = 0) -> bytes:
    """TApplicationException reply (1: message string, 2: type i32)."""
    return write_message(
        name,
        MSG_EXCEPTION,
        seqid,
        {1: (STRING, message), 2: (I32, exc_type)},
    )
