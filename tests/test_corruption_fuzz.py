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


def test_hostile_siz_dimensions_rejected():
    """A tiny stream claiming a multi-exabyte image must raise
    CorruptStreamError before any allocation (advisor round-1 low)."""
    import struct

    from go_dicom_codec_tpu.codecs.jpeg2000 import J2KDecoder
    from go_dicom_codec_tpu.errors import CorruptStreamError

    def siz(xsiz, ysiz, xo=0, yo=0, xt=None, yt=None, ncomp=1):
        p = struct.pack(">HIIIIIIIIH", 0, xsiz, ysiz, xo, yo,
                        xt if xt is not None else max(xsiz, 1),
                        yt if yt is not None else max(ysiz, 1), 0, 0,
                        ncomp)
        p += bytes([7, 1, 1]) * ncomp
        return (b"\xff\x4f" + struct.pack(">HH", 0xFF51, len(p) + 2) + p
                + b"\xff\xd9")

    for hostile in (siz(1 << 30, 1 << 30),          # 4 EiB output
                    siz(10, 10, xo=10),             # Xsiz <= XOsiz
                    siz(10, 10, xt=0),              # zero tile
                    siz(10, 10, ncomp=0)):          # no components
        with pytest.raises(CorruptStreamError):
            J2KDecoder().decode(hostile)


def test_hostile_siz_component_table_rejected():
    """Fuzz-found round 2: corrupted Ssiz (depth > 38 → 1<<127 overflow)
    and zero subsampling factors (negative component rects) must raise
    CorruptStreamError, not ValueError/OverflowError."""
    import struct

    from go_dicom_codec_tpu.codecs.jpeg2000 import J2KDecoder
    from go_dicom_codec_tpu.errors import CorruptStreamError

    def stream(ssiz=11, xr=1, yr=1):
        p = struct.pack(">HIIIIIIIIH", 0, 16, 16, 0, 0, 16, 16, 0, 0, 1)
        p += bytes([ssiz, xr, yr])
        return (b"\xff\x4f" + struct.pack(">HH", 0xFF51, len(p) + 2) + p
                + b"\xff\xd9")

    for bad in (stream(ssiz=0x7F),    # depth 128: 1 << 127 downstream
                stream(xr=0),         # zero subsampling → empty rect
                stream(yr=0)):
        with pytest.raises(CorruptStreamError):
            J2KDecoder(resilient=True).decode(bad)


def test_corrupted_sot_length_rejected():
    """Fuzz-found: SOT with Lsot > 10 used exact-size struct.unpack and
    raised struct.error instead of CorruptStreamError."""
    import struct

    from go_dicom_codec_tpu.codestream.j2k import parse_codestream
    from go_dicom_codec_tpu.errors import CorruptStreamError

    p = struct.pack(">HIIIIIIIIH", 0, 8, 8, 0, 0, 8, 8, 0, 0, 1)
    p += bytes([7, 1, 1])
    s = (b"\xff\x4f" + struct.pack(">HH", 0xFF51, len(p) + 2) + p
         # SOT claiming Lsot=14 (4 junk bytes after Psot/TPsot/TNsot)
         + struct.pack(">HHHIBB", 0xFF90, 14, 0, 16, 0, 1) + b"\x00" * 4
         + b"\xff\x93" + b"\x00" + b"\xff\xd9")
    try:
        parse_codestream(s)
    except CorruptStreamError:
        pass  # either outcome is fine as long as it's a codec error


def test_python_bitreader_overrun_returns_padding():
    """Fuzz-found: BitReader read past the destuffed scan raised
    IndexError; JPEG semantics pad with 1-bits instead."""
    from go_dicom_codec_tpu.utils.npbits import BitReader

    br = BitReader(np.asarray([0x12, 0x34], dtype=np.uint8))
    for _ in range(8):
        br.take(8)  # run far past the end
    assert br.peek16() == 0xFFFF
    assert br.take(8) == 0xFF


def test_jpegls_truncated_sos_rejected(rng):
    """Fuzz-found: JPEG-LS SOS with fewer bytes than the component list
    claims raised IndexError."""
    from go_dicom_codec_tpu.codecs import jpegls
    from go_dicom_codec_tpu.errors import CorruptStreamError

    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(jpegls.encode(img.tobytes(), 16, 16, 1, 8))
    i = data.find(b"\xff\xda")
    assert i > 0
    # claim 4 components but keep the 1-component payload length
    data[i + 4] = 4
    with pytest.raises(CorruptStreamError):
        jpegls.decode(bytes(data))


def test_oversubscribed_dht_rejected(rng):
    """Review-found: a DHT claiming 255 one-bit codes overflowed the
    native 16-bit LUT (heap write); must fail as a clean codec error."""
    from go_dicom_codec_tpu.codecs import jpeg_baseline as jb
    from go_dicom_codec_tpu.errors import CodecError

    img = (rng.integers(0, 200, (16, 16))).astype(np.uint8)
    data = bytearray(jb.encode(img.tobytes(), 16, 16, 1, quality=90))
    i = data.find(b"\xff\xc4")
    assert i > 0
    data[i + 5] = 255  # bits[1] := 255 one-bit codes (oversubscribed)
    with pytest.raises(Exception) as ei:
        jb.decode(bytes(data))
    assert isinstance(ei.value, CodecError) or "Corrupt" in type(
        ei.value).__name__


def test_decode_cap_counts_components():
    """Review-found: the SIZ decode cap ignored Csiz, so thousands of
    components multiplied past the memory guard."""
    import struct

    from go_dicom_codec_tpu.codestream.j2k import parse_siz
    from go_dicom_codec_tpu.errors import CorruptStreamError

    ncomp = 16384
    p = struct.pack(">HIIIIIIIIH", 0, 1 << 13, 1 << 13, 0, 0,
                    1 << 13, 1 << 13, 0, 0, ncomp)
    p += bytes([7, 1, 1]) * ncomp
    with pytest.raises(CorruptStreamError):
        parse_siz(p)


def test_empty_subsampled_tile_component_is_conformant():
    """Review-found: T.800 B.3 — a subsampled component can round a
    narrow image region to an empty rect; that is legal, not corrupt."""
    import struct

    from go_dicom_codec_tpu.codecs.jpeg2000 import J2KDecoder

    # 1-column image at odd offset; comp 1 subsampled XRsiz=2 ->
    # ceil(5/2) == ceil(6/2) == 3: comp-1 rect is empty
    p = struct.pack(">HIIIIIIIIH", 0, 6, 4, 5, 0, 6, 4, 0, 0, 2)
    p += bytes([7, 1, 1]) + bytes([7, 2, 1])
    siz = struct.pack(">HH", 0xFF51, len(p) + 2) + p
    codp = bytes([0, 0]) + struct.pack(">H", 1) + bytes([0, 0, 4, 4, 0, 1])
    cod = struct.pack(">HH", 0xFF52, len(codp) + 2) + codp
    qcdp = bytes([0 | (2 << 5), 8 << 3])
    qcd = struct.pack(">HH", 0xFF5C, len(qcdp) + 2) + qcdp
    body = b"\x00\x00"  # one empty packet per component (LRCP, 0 levels)
    sot = struct.pack(">HHHIBB", 0xFF90, 10, 0, 12 + 2 + len(body), 0, 1)
    stream = (b"\xff\x4f" + siz + cod + qcd + sot + b"\xff\x93" + body
              + b"\xff\xd9")
    arr, _, _ = J2KDecoder().decode(stream)
    assert arr.shape == (4, 1, 2)


def test_pipelined_encoders_empty_input():
    from go_dicom_codec_tpu.pipeline import (encode_frames_pipelined,
                                             encode_frames_pipelined_jpeg)

    assert encode_frames_pipelined_jpeg(
        np.empty((0, 32, 32), dtype=np.uint8)) == []
    assert encode_frames_pipelined(
        np.empty((0, 32, 32), dtype=np.int32), bit_depth=12) == []


def test_fuzz_round3_regressions(rng):
    """Round-3 fuzz finds: tile origin beyond image origin (ntx=0 →
    modulo-by-zero) and truncated SOF component tables (IndexError)."""
    import struct

    from go_dicom_codec_tpu.codecs import jpeg_baseline as jb
    from go_dicom_codec_tpu.codecs.jpeg2000 import J2KDecoder
    from go_dicom_codec_tpu.errors import CorruptStreamError

    p = struct.pack(">HIIIIIIIIH", 0, 16, 16, 4, 4, 16, 16, 8, 8, 1)
    p += bytes([7, 1, 1])
    s = (b"\xff\x4f" + struct.pack(">HH", 0xFF51, len(p) + 2) + p
         + b"\xff\xd9")
    with pytest.raises(CorruptStreamError):
        J2KDecoder(resilient=True).decode(s)

    img = rng.integers(0, 200, (16, 16)).astype(np.uint8)
    data = bytearray(jb.encode(img.tobytes(), 16, 16, 1))
    i = data.find(b"\xff\xc0")
    assert i > 0
    data[i + 9] = 200  # SOF claims 200 components, payload has 1
    with pytest.raises(CorruptStreamError):
        jb.decode(bytes(data))


def test_truncated_dht_bits_rejected(rng):
    """Fuzz round 4: a DHT segment ending inside the 16-entry bits table
    raised IndexError in HuffmanTable construction."""
    from go_dicom_codec_tpu.codecs import jpeg_baseline as jb
    from go_dicom_codec_tpu.errors import CorruptStreamError

    img = rng.integers(0, 200, (16, 16)).astype(np.uint8)
    data = bytearray(jb.encode(img.tobytes(), 16, 16, 1))
    i = data.find(b"\xff\xc4")
    assert i > 0
    # shrink the declared DHT length so the bits table is cut short
    data[i + 2 : i + 4] = (8).to_bytes(2, "big")
    with pytest.raises(CorruptStreamError):
        jb.decode(bytes(data))


def test_corrupt_p14_category_rejected(rng):
    """Fuzz round 5: a corrupted DHT can map a symbol to category > 16,
    which drove a >24-bit read through the Python bit reader."""
    from go_dicom_codec_tpu.codecs import jpeg_lossless as jl
    from go_dicom_codec_tpu.errors import CorruptStreamError
    from go_dicom_codec_tpu.utils.npbits import BitReader

    img = rng.integers(0, 4096, (16, 16)).astype("<u2")
    data = bytearray(jl.encode(img.tobytes(), 16, 16, 1, 12))
    i = data.find(b"\xff\xc4")
    assert i > 0
    # remap every DHT value byte to an out-of-range category
    ln = int.from_bytes(data[i + 2 : i + 4], "big")
    for j in range(i + 4 + 1 + 16, i + 2 + ln):
        data[j] = 200
    try:
        jl.decode(bytes(data))
    except CorruptStreamError:
        pass  # clean rejection is the contract; garbage decode is not

    br = BitReader(np.asarray([1, 2, 3], dtype=np.uint8))
    with pytest.raises(CorruptStreamError):
        br.take(200)


def test_truncated_sof3_component_table_rejected(rng):
    """Fuzz round 6: P14's own SOF3/SOS parsers had the same
    truncated-component-table IndexError as baseline's."""
    from go_dicom_codec_tpu.codecs import jpeg_lossless as jl
    from go_dicom_codec_tpu.errors import CorruptStreamError

    img = rng.integers(0, 4096, (16, 16)).astype("<u2")
    data = bytearray(jl.encode(img.tobytes(), 16, 16, 1, 12))
    i = data.find(b"\xff\xc3")
    assert i > 0
    data[i + 9] = 99  # claim 99 components
    with pytest.raises(CorruptStreamError):
        jl.decode(bytes(data))


@pytest.mark.parametrize("uid", ["1.2.840.10008.1.2.4.90",
                                 "1.2.840.10008.1.2.4.91",
                                 "1.2.840.10008.1.2.4.201"])
def test_batched_multiframe_decode_corrupt_frame_typed_error(uid, rng):
    """A corrupt frame inside a multi-frame batch must surface a typed
    CodecError through the batched decode path (pipeline falls back to
    scalar, which raises cleanly), never an untyped crash."""
    import go_dicom_codec_tpu as dc
    from go_dicom_codec_tpu.errors import CodecError

    info = dc.FrameInfo(width=48, height=48, bits_allocated=16,
                        bits_stored=12)
    frames = (np.cumsum(rng.integers(-9, 10, (3, 48, 48)), axis=2)
              % 4096).astype("<u2")
    codec = dc.get_global_registry().get_codec(uid)
    src = dc.MemoryPixelData(info=info)
    for f in frames:
        src.add_frame(f.tobytes())
    enc = dc.MemoryPixelData(info=info, encapsulated=True)
    codec.encode(src, enc)
    bad = bytearray(enc.get_frame(1))
    for i in range(50, min(300, len(bad))):
        bad[i] ^= 0xA5
    mixed = dc.MemoryPixelData(info=info, encapsulated=True)
    mixed.add_frame(enc.get_frame(0))
    mixed.add_frame(bytes(bad))
    mixed.add_frame(enc.get_frame(2))
    out = dc.MemoryPixelData(info=info)
    with pytest.raises(CodecError):
        codec.decode(mixed, out)


def test_corrupted_packed_header_stream_never_crashes(rng):
    """PPT/PPM/SOP/EPH/PLT/JP2 paths are new parser attack surface:
    truncation, byte flips, and deletions must raise cleanly."""
    import struct

    from go_dicom_codec_tpu.codecs.jpeg2000 import (J2KEncodeParams,
                                                    J2KEncoder,
                                                    decode_to_pixels)
    from go_dicom_codec_tpu.codestream import j2k

    img = rng.integers(0, 4096, (64, 64)).astype(np.int32)
    marked = J2KEncoder(J2KEncodeParams(
        packed_headers=True, use_sop=True, use_eph=True, plt_markers=True,
        tile_width=48, tile_height=48)).encode(img, 64, 64, 1, 12)
    # a JP2-wrapped variant exercises the box walk too
    ftyp = struct.pack(">I4s", 20, b"ftyp") + b"jp2 " + b"\0" * 8
    jp2 = (j2k._JP2_SIGNATURE + ftyp +
           struct.pack(">I4s", 8 + len(marked), b"jp2c") + marked)

    for base in (marked, jp2):
        for trial in range(24):
            d2 = bytearray(base)
            mode = trial % 3
            if mode == 0:
                d2 = d2[: int(rng.integers(0, len(d2)))]
            elif mode == 1:
                for _ in range(int(rng.integers(1, 8))):
                    d2[int(rng.integers(0, len(d2)))] = \
                        int(rng.integers(0, 256))
            else:
                a = int(rng.integers(0, len(d2)))
                b = int(rng.integers(a, len(d2)))
                d2 = d2[:a] + d2[b:]
            try:
                decode_to_pixels(bytes(d2))
            except Exception:
                pass  # any clean Python exception is acceptable


def test_hostile_jpeg_sos_table_ids_native(rng):
    """A corrupt SOS can reference any Huffman-table id; the native
    scan decoders must bound-check before indexing their 4-slot table
    arrays (found by the 20k-trial campaign: an out-of-range id
    segfaulted the native lane while Python raised cleanly). Both
    lanes must raise the same clean error."""
    import subprocess
    import sys
    code = (
        "import os, numpy as np\n"
        "os.environ.pop('PALLAS_AXON_REMOTE_COMPILE', None)\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import go_dicom_codec_tpu as dc\n"
        "rng = np.random.default_rng(5)\n"
        "img = rng.integers(0, 256, (48, 40, 3)).astype(np.uint8)\n"
        "info = dc.FrameInfo(width=40, height=48, bits_allocated=8,\n"
        "    bits_stored=8, samples_per_pixel=3)\n"
        "src = dc.MemoryPixelData(info=info); src.add_frame(img.tobytes())\n"
        "codec = dc.get_global_registry().get_codec(\n"
        "    dc.uids.JPEG_BASELINE_8BIT)\n"
        "enc = dc.MemoryPixelData(info=info, encapsulated=True)\n"
        "codec.encode(src, enc)\n"
        "d = bytearray(enc.get_frame(0))\n"
        "i = d.find(bytes([0xFF, 0xDA]))\n"
        "ns = d[i + 4]\n"
        "for c in range(ns):\n"
        "    d[i + 6 + 2 * c] = 0xC8  # Td/Ta = 12/8: both out of range\n"
        "bad = dc.MemoryPixelData(info=info, encapsulated=True)\n"
        "bad.add_frame(bytes(d))\n"
        "out = dc.MemoryPixelData(info=info)\n"
        "try:\n"
        "    codec.decode(bad, out)\n"
        "    print('DECODED')\n"
        "except Exception as e:\n"
        "    print('RAISED', type(e).__name__)\n")
    outs = []
    for disable in ("", "1"):
        env = dict(**__import__("os").environ)
        if disable:
            env["GDCT_DISABLE_NATIVE"] = disable
        else:
            env.pop("GDCT_DISABLE_NATIVE", None)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, (r.returncode, r.stderr[-500:])
        outs.append(r.stdout.strip())
    assert outs[0] == outs[1] and outs[0].startswith("RAISED")


def test_corrupted_sop_plt_streams_never_crash(rng):
    """Fuzz the new resync/PLT surfaces: resilient decode (SOP resync
    walks corrupted bodies), reduce and window decode (PLT skip uses
    attacker-controlled lengths) must raise cleanly or degrade, never
    hang or crash."""
    from go_dicom_codec_tpu.codecs.jpeg2000 import (J2KDecoder,
                                                    J2KEncodeParams,
                                                    J2KEncoder)
    img = rng.integers(0, 4096, (96, 96)).astype(np.int32)
    s = J2KEncoder(J2KEncodeParams(
        use_sop=True, use_eph=True, plt_markers=True,
        precinct_width=64, precinct_height=64, num_layers=2,
        layer_rates=[6.0], append_lossless_layer=True)
    ).encode(img, 96, 96, 1, 12)
    decoders = [J2KDecoder(resilient=True), J2KDecoder(reduce=1),
                J2KDecoder(window=(0, 0, 40, 40)),
                J2KDecoder(resilient=True, reduce=2)]
    for trial in range(24):
        d2 = bytearray(s)
        mode = trial % 3
        if mode == 0:
            d2 = d2[: int(rng.integers(4, len(d2)))]
        elif mode == 1:
            for _ in range(int(rng.integers(1, 10))):
                d2[int(rng.integers(0, len(d2)))] = int(rng.integers(0, 256))
        else:
            a = int(rng.integers(0, len(d2)))
            b = int(rng.integers(a, len(d2)))
            d2 = d2[:a] + d2[b:]
        for dec in decoders:
            try:
                dec.decode(bytes(d2))
            except Exception:
                pass  # clean raise is fine; hang/crash is not


def test_corrupted_container_and_refined_streams_typed_errors(rng):
    """Round-5 surfaces (JP2/JPH containers, multipass refined HT, the
    transcode sniffer): random flips, truncations and splices must end
    in clean pixels or a TYPED codec error in both strict and resilient
    modes (a 25k-trial offline campaign over the same corpus ran clean;
    this is the permanent small lane)."""
    from go_dicom_codec_tpu.codecs.jpeg2000 import (J2KDecoder,
                                                    J2KEncodeParams,
                                                    J2KEncoder)
    from go_dicom_codec_tpu.codestream import j2k
    from go_dicom_codec_tpu.errors import CodecError
    from go_dicom_codec_tpu.tools import transcode as tc

    img = rng.integers(0, 4096, (64, 64)).astype(np.int32)
    bases = []
    for kw in (dict(), dict(htj2k=True),
               dict(htj2k=True, ht_refinement=True)):
        s = J2KEncoder(J2KEncodeParams(
            num_levels=2, cb_width=32, cb_height=32, **kw)
        ).encode(img, 64, 64, 1, 12)
        bases.append(s)
        bases.append(j2k.wrap_jp2(
            s, brand="jph" if kw.get("htj2k") else "jp2"))
    for t in range(120):
        base = bytearray(bases[t % len(bases)])
        mode = t % 3
        if mode == 0:
            for _ in range(int(rng.integers(1, 6))):
                base[int(rng.integers(0, len(base)))] ^= \
                    int(rng.integers(1, 256))
            data = bytes(base)
        elif mode == 1:
            data = bytes(base[:int(rng.integers(1, len(base)))])
        else:
            other = bases[int(rng.integers(0, len(bases)))]
            cut = int(rng.integers(0, min(len(base), len(other))))
            data = bytes(base[:cut]) + bytes(other[cut:])
        for resilient in (False, True):
            try:
                J2KDecoder(resilient=resilient).decode(data)
            except CodecError:
                pass
        tc.sniff(data)  # must classify anything without raising
