"""Self-contained TFRecord + tf.train.Example codec (no tensorflow).

The reference's datasets are TFRecord files of ``tf.train.Example``
protos (reference scripts/training/dataset.py:50-68 reads them via
``tf.data.TFRecordDataset``; :194-216 parses pair/single examples).
This module makes those files first-class citizens of this framework
without a tensorflow dependency:

- record framing: the public TFRecord format -- ``uint64le length,
  uint32le masked-crc32c(length), payload, uint32le
  masked-crc32c(payload)`` -- read and written directly;
- ``tf.train.Example``: hand-encoded/decoded with the protobuf wire
  format (schema: Example{features=1}, Features{map<string,Feature>
  feature=1}, Feature{bytes_list=1|float_list=2|int64_list=3}, each
  list ``repeated value = 1``) reusing the wire primitives from
  :mod:`joshupscale_tpu.export.onnx_minimal`;
- CRC32C (Castagnoli): table-driven pure python.  Length CRCs (12
  bytes/record) are always verified; payload CRCs only when
  ``verify=True`` -- the python CRC runs ~5 MB/s, so bulk readers
  should verify once, not per epoch.  ``tensorflow``, when installed,
  remains the fast path in the pipeline ops.

Interoperability is covered by tests/test_tfrecord.py: files written
here parse with ``tf.data.TFRecordDataset`` + ``tf.io.
parse_single_example`` and vice versa, byte-for-byte.
"""

from __future__ import annotations

import struct
from typing import (
    Any, Dict, Iterable, Iterator, List, Optional, Sequence, Union,
)

import numpy as np

from ..export.onnx_minimal import (
    _len_field,
    _read_varint,
    _str_field,
    _tag,
    _varint,
    parse_message,
)

# ---------------------------------------------------------------------
# CRC32C (Castagnoli, reflected, poly 0x82F63B78) + TFRecord masking


def _make_table() -> List[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
        table.append(crc)
    return table


_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    """Pure-python CRC32C; known answer crc32c(b"123456789")=0xE3069283."""
    crc = 0xFFFFFFFF
    table = _TABLE
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TFRecord's rotated+offset masking of the raw CRC."""
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------
# Record framing


def write_records(path: str, records: Iterable[bytes]) -> int:
    """Write serialized records as an (uncompressed) TFRecord file."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            header = struct.pack("<Q", len(rec))
            f.write(header)
            f.write(struct.pack("<I", masked_crc32c(header)))
            f.write(rec)
            f.write(struct.pack("<I", masked_crc32c(rec)))
            n += 1
    return n


def read_records(path: str, verify: bool = False) -> Iterator[bytes]:
    """Yield serialized records; length CRCs always checked."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return
            if len(header) != 8:
                raise ValueError(f"{path}: truncated record header")
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            if hcrc != masked_crc32c(header):
                raise ValueError(f"{path}: corrupt record length")
            payload = f.read(length)
            if len(payload) != length:
                raise ValueError(f"{path}: truncated record payload")
            (pcrc,) = struct.unpack("<I", f.read(4))
            if verify and pcrc != masked_crc32c(payload):
                raise ValueError(f"{path}: corrupt record payload")
            yield payload


# ---------------------------------------------------------------------
# tf.train.Example

FeatureValue = Union[Sequence[bytes], Sequence[float], Sequence[int]]


def _encode_feature(values: FeatureValue,
                    kind: Optional[str] = None) -> bytes:
    """kind: optional explicit 'bytes'/'float'/'int64' (needed for empty
    lists, which otherwise default to int64_list)."""
    vals = list(values)
    if kind is None and vals:
        v0 = vals[0]
        if isinstance(v0, (bytes, bytearray)):
            kind = "bytes"
        elif isinstance(v0, (float, np.floating)):
            kind = "float"
        elif isinstance(v0, (int, np.integer)):
            kind = "int64"
        else:
            raise TypeError(
                f"Unsupported feature value type {type(v0).__name__}"
            )
    if kind == "bytes":
        body = b"".join(_len_field(1, bytes(v)) for v in vals)
        return _len_field(1, body)  # Feature.bytes_list
    if kind == "float":
        packed = struct.pack(f"<{len(vals)}f", *(float(v) for v in vals))
        return _len_field(2, _len_field(1, packed))  # Feature.float_list
    # packed repeated int64 (what the protobuf runtime emits)
    body = b"".join(_varint(int(v)) for v in vals)
    return _len_field(3, _len_field(1, body))  # Feature.int64_list


def encode_example(features: Dict[str, FeatureValue],
                   kinds: Optional[Dict[str, str]] = None) -> bytes:
    """Serialize a tf.train.Example (bytes/float/int64 lists by type).

    ``kinds``: optional per-key 'bytes'/'float'/'int64' override --
    the only way to give an EMPTY list the right oneof (an empty list
    with no hint encodes as int64_list, which a consumer parsing a
    string/float feature rejects)."""
    entries = b""
    for key, values in features.items():
        feat = _encode_feature(values, (kinds or {}).get(key))
        entry = _str_field(1, key) + _len_field(2, feat)
        entries += _len_field(1, entry)  # Features.feature map entry
    return _len_field(1, entries)  # Example.features


def _decode_floats(buf: bytes) -> List[float]:
    fields = parse_message(buf)
    out: List[float] = []
    for v in fields.get(1, []):
        # packed (wire 2) and unpacked fixed32 (wire 5) both arrive as
        # raw little-endian bytes from parse_message
        out.extend(struct.unpack(f"<{len(v) // 4}f", v))
    return out


def _decode_ints(buf: bytes) -> List[int]:
    fields = parse_message(buf)
    out: List[int] = []
    for v in fields.get(1, []):
        if isinstance(v, bytes):  # packed varints
            pos = 0
            while pos < len(v):
                val, pos = _read_varint(v, pos)
                out.append(val - (1 << 64) if val >= 1 << 63 else val)
        else:
            out.append(v - (1 << 64) if v >= 1 << 63 else v)
    return out


def decode_example(buf: bytes) -> Dict[str, FeatureValue]:
    """Parse a serialized tf.train.Example into {key: list-of-values}."""
    example = parse_message(buf)
    out: Dict[str, FeatureValue] = {}
    for features_buf in example.get(1, []):
        for entry_buf in parse_message(features_buf).get(1, []):
            entry = parse_message(entry_buf)
            key = entry[1][0].decode()
            feature = parse_message(entry[2][0])
            if 1 in feature:  # bytes_list
                out[key] = parse_message(feature[1][0]).get(1, [])
            elif 2 in feature:  # float_list
                out[key] = _decode_floats(feature[2][0])
            elif 3 in feature:  # int64_list
                out[key] = _decode_ints(feature[3][0])
            else:
                out[key] = []
    return out


def parse_fixed_len(buf: bytes, spec: Dict[str, int]) -> Dict[str, Any]:
    """tf.io.parse_single_example analog for FixedLenFeature lists.

    ``spec`` maps feature name -> expected list length (reference
    dataset.py:194-216 uses ``FixedLenFeature([10], tf.string)``).
    """
    decoded = decode_example(buf)
    out = {}
    for key, n in spec.items():
        if key not in decoded:
            raise KeyError(f"Example is missing feature {key!r}")
        if len(decoded[key]) != n:
            raise ValueError(
                f"Feature {key!r}: expected {n} values, "
                f"got {len(decoded[key])}")
        out[key] = decoded[key]
    return out
