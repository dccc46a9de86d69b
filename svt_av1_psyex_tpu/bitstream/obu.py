"""OBU framing (AV1 spec 5.2/5.3).

Counterpart: OBU assembly in the reference's packetization process
(Source/Lib/Codec/packetization_process.c + entropy_coding.c
write_obu_header / write_uleb_obu_size); clean-room from spec.
"""

from __future__ import annotations

from enum import IntEnum

from .bitw import BitWriter


class ObuType(IntEnum):
    SEQUENCE_HEADER = 1
    TEMPORAL_DELIMITER = 2
    FRAME_HEADER = 3
    TILE_GROUP = 4
    METADATA = 5
    FRAME = 6
    REDUNDANT_FRAME_HEADER = 7
    TILE_LIST = 8
    PADDING = 15


def wrap_obu(obu_type: ObuType, payload: bytes, temporal_id: int = 0,
             spatial_id: int = 0) -> bytes:
    """obu_header (+ extension) + leb128 size + payload."""
    w = BitWriter()
    has_ext = temporal_id != 0 or spatial_id != 0
    w.f(0, 1)  # obu_forbidden_bit
    w.f(int(obu_type), 4)
    w.f(1 if has_ext else 0, 1)  # obu_extension_flag
    w.f(1, 1)  # obu_has_size_field
    w.f(0, 1)  # obu_reserved_1bit
    if has_ext:
        w.f(temporal_id, 3)
        w.f(spatial_id, 2)
        w.f(0, 3)
    return w.data() + BitWriter.leb128_bytes(len(payload)) + payload


def temporal_delimiter() -> bytes:
    return wrap_obu(ObuType.TEMPORAL_DELIMITER, b"")
