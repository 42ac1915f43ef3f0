"""DICOM RLE Lossless codec (PS3.5 Annex G).

Behavioral parity with reference rle/rle.go: 64-byte little-endian header
(uint32 segment count + 15 uint32 offsets), <=15 byte segments — one per
(sample, byte-of-BitsAllocated) MSB-first — each PackBits-coded; segments
start at even offsets and the stream is padded to even length
(rle/rle.go:199-206,286-290).

TPU split per SURVEY.md §2.2: the byte-plane split/interleave is a device
transpose (ops/planes.py); the run coder is host-side vectorized numpy
(entropy/rlepack.py).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from ..entropy.rlepack import packbits_decode, packbits_encode
from ..errors import CorruptStreamError, UnsupportedFormatError
from ..frames import FrameInfo, PixelData
from ..ops.planes import merge_byte_planes_np, split_byte_planes_np
from ..params import Parameters
from ..registry import Codec, get_global_registry
from .. import uids

_HEADER_LEN = 64
_MAX_SEGMENTS = 15


def encode_frame(frame: bytes, info: FrameInfo) -> bytes:
    """Encode one raw frame to an RLE stream (reference rle/rle.go:86-128)."""
    if not frame:
        raise UnsupportedFormatError("source frame data must not be empty")
    num_segments = info.bytes_allocated * info.samples_per_pixel
    if num_segments > _MAX_SEGMENTS:
        raise UnsupportedFormatError(
            f"RLE supports at most 15 segments, need {num_segments}"
        )
    if len(frame) < info.uncompressed_frame_size:
        raise UnsupportedFormatError(
            f"frame buffer {len(frame)} smaller than expected "
            f"{info.uncompressed_frame_size}"
        )

    planes = split_byte_planes_np(frame, info)
    offsets = [0] * _MAX_SEGMENTS
    body = bytearray()
    pos = _HEADER_LEN
    for s in range(num_segments):
        if pos & 1:  # segments start at even offsets (rle/rle.go:201-203)
            body.append(0)
            pos += 1
        offsets[s] = pos
        seg = packbits_encode(planes[s])
        body += seg
        pos += len(seg)
    if pos & 1:  # total stream even length (rle/rle.go:286-290)
        body.append(0)

    header = struct.pack("<16I", num_segments, *offsets)
    return bytes(header) + bytes(body)


def decode_frame(data: bytes, info: FrameInfo) -> bytes:
    """Decode one RLE stream to a raw frame (reference rle/rle.go:130-178)."""
    if len(data) < _HEADER_LEN:
        raise CorruptStreamError(
            f"RLE data too short: need at least 64 bytes, got {len(data)}"
        )
    fields = struct.unpack_from("<16I", data, 0)
    num_segments = fields[0]
    offsets = list(fields[1:])
    if not (1 <= num_segments <= _MAX_SEGMENTS):
        raise CorruptStreamError(
            f"invalid number of RLE segments: {num_segments} (must be 1-15)"
        )
    expected = info.bytes_allocated * info.samples_per_pixel
    if num_segments != expected:
        raise CorruptStreamError(
            f"unexpected number of RLE segments: got {num_segments}, "
            f"expected {expected}"
        )
    for s in range(num_segments):
        if offsets[s] > len(data):
            raise CorruptStreamError(
                f"RLE segment {s} offset {offsets[s]} exceeds data length"
            )

    p = info.pixel_count
    planes = np.zeros((num_segments, p), dtype=np.uint8)
    for s in range(num_segments):
        start = offsets[s]
        end = offsets[s + 1] if s < num_segments - 1 else len(data)
        planes[s] = packbits_decode(data[start:end], p)
    return merge_byte_planes_np(planes, info)


class RLECodec(Codec):
    """RLE Lossless (1.2.840.10008.1.2.5) — reference rle/rle.go:22-84."""

    def name(self) -> str:
        return "RLE Lossless"

    def transfer_syntax(self) -> str:
        return uids.RLE_LOSSLESS

    def encode(self, old_pixel_data: PixelData, new_pixel_data: PixelData,
               parameters: Optional[Parameters] = None) -> None:
        info = old_pixel_data.get_frame_info()
        for i in range(old_pixel_data.frame_count()):
            new_pixel_data.add_frame(encode_frame(old_pixel_data.get_frame(i), info))

    def decode(self, old_pixel_data: PixelData, new_pixel_data: PixelData,
               parameters: Optional[Parameters] = None) -> None:
        info = old_pixel_data.get_frame_info()
        for i in range(old_pixel_data.frame_count()):
            new_pixel_data.add_frame(decode_frame(old_pixel_data.get_frame(i), info))


def register() -> None:
    get_global_registry().register_codec(uids.RLE_LOSSLESS, RLECodec())
