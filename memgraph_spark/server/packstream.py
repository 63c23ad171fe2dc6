"""PackStream v2 encoder/decoder (public Bolt wire format).

Reference parity: src/communication/bolt/v1/codes.hpp + encoder/decoder —
the byte markers below are the published PackStream specification the
reference implements in C++; this is an independent Python implementation.

Supported value space mirrors the reference's Bolt values: Null, Boolean,
Integer (int64), Float, String, Bytes, List, Map, and the graph structures
Node (tag 'N'), Relationship (tag 'R'), UnboundRelationship (tag 'r'),
Path (tag 'P'), plus temporal structs Date ('D'), LocalTime ('t'),
LocalDateTime ('d'), Duration ('E').
"""

from __future__ import annotations

import datetime as _dt
import struct
from dataclasses import dataclass, field


@dataclass
class Structure:
    tag: int
    fields: list = field(default_factory=list)


def node(node_id: int, labels: list[str], props: dict,
         element_id: str | None = None, v5: bool = True) -> Structure:
    """Bolt Node: 4 fields (…, element_id) on 5.x, legacy 3 fields on 4.x —
    official 4.x drivers hard-require the 3-field shape."""
    if not v5:
        return Structure(0x4E, [node_id, labels, props])
    return Structure(0x4E, [node_id, labels, props,
                            element_id if element_id is not None
                            else str(node_id)])


def relationship(rel_id: int, start: int, end: int, rtype: str,
                 props: dict, v5: bool = True) -> Structure:
    """Bolt Relationship: 8 fields on 5.x, legacy 5 fields on 4.x."""
    if not v5:
        return Structure(0x52, [rel_id, start, end, rtype, props])
    return Structure(0x52, [rel_id, start, end, rtype, props,
                            str(rel_id), str(start), str(end)])


def unbound_relationship(rel_id: int, rtype: str, props: dict,
                         v5: bool = True) -> Structure:
    """Bolt UnboundRelationship (inside Path): 4 fields on 5.x, 3 on 4.x."""
    if not v5:
        return Structure(0x72, [rel_id, rtype, props])
    return Structure(0x72, [rel_id, rtype, props, str(rel_id)])


def path(nodes: list, rels: list, indices: list[int]) -> Structure:
    """Bolt Path: same 3-field shape on every version (members differ)."""
    return Structure(0x50, [nodes, rels, indices])


class Packer:
    def __init__(self, legacy_datetime: bool = False):
        # legacy_datetime: pre-5.0 connection WITHOUT the negotiated 'utc'
        # patch — aware datetimes go out as tag 'F' (0x46) with
        # LOCAL-adjusted seconds, the shape 4.x drivers hydrate by default
        self._buf = bytearray()
        self._legacy_dt = legacy_datetime

    def bytes(self) -> bytes:
        return bytes(self._buf)

    def pack(self, value) -> "Packer":
        b = self._buf
        if value is None:
            b.append(0xC0)
        elif value is True:
            b.append(0xC3)
        elif value is False:
            b.append(0xC2)
        elif isinstance(value, int):
            self._pack_int(value)
        elif isinstance(value, float):
            b.append(0xC1)
            b += struct.pack(">d", value)
        elif isinstance(value, str):
            data = value.encode("utf-8")
            self._pack_header(len(data), 0x80, (0xD0, 0xD1, 0xD2))
            b += data
        elif isinstance(value, (bytes, bytearray)):
            n = len(value)
            if n < 0x100:
                b += bytes([0xCC, n])
            elif n < 0x10000:
                b.append(0xCD)
                b += struct.pack(">H", n)
            else:
                b.append(0xCE)
                b += struct.pack(">I", n)
            b += value
        elif isinstance(value, (list, tuple)):
            self._pack_header(len(value), 0x90, (0xD4, 0xD5, 0xD6))
            for v in value:
                self.pack(v)
        elif isinstance(value, dict):
            self._pack_header(len(value), 0xA0, (0xD8, 0xD9, 0xDA))
            for k, v in value.items():
                self.pack(str(k))
                self.pack(v)
        elif isinstance(value, Structure):
            self._buf.append(0xB0 + len(value.fields))
            self._buf.append(value.tag)
            for f in value.fields:
                self.pack(f)
        elif isinstance(value, _dt.datetime):
            if value.tzinfo is not None:
                # DateTime 'I' (Bolt 5.x / utc-patched): UTC epoch seconds
                # + nanos + utc offset — the instant is zone-independent,
                # the offset rides alongside. (The legacy 'F' encoding used
                # LOCAL-adjusted seconds; emitting those under tag 'I'
                # shifted every aware instant by its offset for conforming
                # drivers.) floor, not int(): truncation toward zero plus a
                # non-negative nanos field corrupts pre-1970 values.
                import math
                offset = int(value.utcoffset().total_seconds())
                epoch = math.floor(value.timestamp())
                if self._legacy_dt:
                    # legacy 'F': seconds are LOCAL-adjusted (epoch+offset)
                    self.pack(Structure(0x46, [epoch + offset,
                                               value.microsecond * 1000,
                                               offset]))
                else:
                    self.pack(Structure(0x49, [epoch,
                                               value.microsecond * 1000,
                                               offset]))
            else:
                # LocalDateTime 'd': epoch seconds + nanos
                import math
                epoch = math.floor(
                    value.replace(tzinfo=_dt.timezone.utc).timestamp())
                self.pack(Structure(0x64, [epoch, value.microsecond * 1000]))
        elif isinstance(value, _dt.date):
            days = (value - _dt.date(1970, 1, 1)).days
            self.pack(Structure(0x44, [days]))
        elif isinstance(value, _dt.time):
            nanos = ((value.hour * 3600 + value.minute * 60 + value.second)
                     * 1_000_000 + value.microsecond) * 1000
            self.pack(Structure(0x74, [nanos]))
        elif isinstance(value, _dt.timedelta):
            self.pack(Structure(0x45, [0, value.days, value.seconds,
                                       value.microseconds * 1000]))
        else:
            self.pack(str(value))  # last resort: stringify
        return self

    def _pack_int(self, v: int) -> None:
        b = self._buf
        if -16 <= v < 128:
            b += struct.pack(">b", v)
        elif -0x80 <= v < 0x80:
            b.append(0xC8)
            b += struct.pack(">b", v)
        elif -0x8000 <= v < 0x8000:
            b.append(0xC9)
            b += struct.pack(">h", v)
        elif -0x80000000 <= v < 0x80000000:
            b.append(0xCA)
            b += struct.pack(">i", v)
        else:
            b.append(0xCB)
            b += struct.pack(">q", v)

    def _pack_header(self, n: int, tiny: int, markers) -> None:
        b = self._buf
        if n < 0x10:
            b.append(tiny + n)
        elif n < 0x100:
            b.append(markers[0])
            b.append(n)
        elif n < 0x10000:
            b.append(markers[1])
            b += struct.pack(">H", n)
        else:
            b.append(markers[2])
            b += struct.pack(">I", n)


class Unpacker:
    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    def _read(self, n: int) -> bytes:
        out = self._data[self._pos:self._pos + n]
        if len(out) < n:
            raise ValueError("packstream: truncated input")
        self._pos += n
        return out

    def unpack(self):
        marker = self._read(1)[0]
        if marker == 0xC0:
            return None
        if marker == 0xC2:
            return False
        if marker == 0xC3:
            return True
        if marker == 0xC1:
            return struct.unpack(">d", self._read(8))[0]
        if marker < 0x80:                      # tiny positive int
            return marker
        if marker >= 0xF0:                     # tiny negative int
            return marker - 0x100
        if marker == 0xC8:
            return struct.unpack(">b", self._read(1))[0]
        if marker == 0xC9:
            return struct.unpack(">h", self._read(2))[0]
        if marker == 0xCA:
            return struct.unpack(">i", self._read(4))[0]
        if marker == 0xCB:
            return struct.unpack(">q", self._read(8))[0]
        if 0x80 <= marker < 0x90:
            return self._read(marker & 0x0F).decode("utf-8")
        if marker == 0xD0:
            return self._read(self._read(1)[0]).decode("utf-8")
        if marker == 0xD1:
            return self._read(struct.unpack(">H", self._read(2))[0]) \
                .decode("utf-8")
        if marker == 0xD2:
            return self._read(struct.unpack(">I", self._read(4))[0]) \
                .decode("utf-8")
        if marker == 0xCC:
            return bytes(self._read(self._read(1)[0]))
        if marker == 0xCD:
            return bytes(self._read(struct.unpack(">H", self._read(2))[0]))
        if marker == 0xCE:
            return bytes(self._read(struct.unpack(">I", self._read(4))[0]))
        if 0x90 <= marker < 0xA0:
            return [self.unpack() for _ in range(marker & 0x0F)]
        if marker == 0xD4:
            return [self.unpack() for _ in range(self._read(1)[0])]
        if marker == 0xD5:
            return [self.unpack() for _ in
                    range(struct.unpack(">H", self._read(2))[0])]
        if marker == 0xD6:
            return [self.unpack() for _ in
                    range(struct.unpack(">I", self._read(4))[0])]
        if 0xA0 <= marker < 0xB0:
            return {self.unpack(): self.unpack()
                    for _ in range(marker & 0x0F)}
        if marker == 0xD8:
            return {self.unpack(): self.unpack()
                    for _ in range(self._read(1)[0])}
        if marker == 0xD9:
            return {self.unpack(): self.unpack()
                    for _ in range(struct.unpack(">H", self._read(2))[0])}
        if marker == 0xDA:
            return {self.unpack(): self.unpack()
                    for _ in range(struct.unpack(">I", self._read(4))[0])}
        if 0xB0 <= marker < 0xC0:
            n = marker & 0x0F
            tag = self._read(1)[0]
            return Structure(tag, [self.unpack() for _ in range(n)])
        raise ValueError(f"packstream: unknown marker 0x{marker:02X}")


def pack(value, legacy_datetime: bool = False) -> bytes:
    return Packer(legacy_datetime).pack(value).bytes()


def unpack(data: bytes):
    return Unpacker(data).unpack()
