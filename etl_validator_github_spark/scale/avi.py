"""Pure-stdlib AVI (RIFF) container codec for MJPEG video.

The container grammar is plain RIFF: length-prefixed chunks, LIST
nesting, even-byte padding — all parseable with ``struct`` alone. The
per-frame payloads are baseline JPEGs, which ``scale/jpeg.py`` already
decodes natively, so an MJPEG AVI needs no codec library anywhere in
the path: this module de-stubs the "video container" branch of
``decode_image``'s declared gap for the single most container-like
format that stdlib can honestly own. (MP4/ISO-BMFF with H.264 payloads
genuinely needs a codec library and stays a declared gap.)

Writer and reader are strict mirrors, following the codec-family rule
established for PPM/BMP (r6/r12 advice): reject truncation AND
trailing bytes, validate every cross-reference the container carries
(avih/strh frame counts, strf vs avih dimensions, idx1 offsets and
sizes against the actual ``movi`` chunk positions) so a corrupt or
concatenated payload fails loudly instead of decoding garbage.

Layout written (and required on read):

    RIFF('AVI '
      LIST('hdrl' avih LIST('strl' strh strf))
      LIST('movi' '00dc'*n)
      'idx1')

idx1 ``dwChunkOffset`` follows the dominant convention: byte offset of
the frame's '00dc' fourcc relative to the start of the 'movi' list
data (so the first frame is at offset 4).

Reference behavior studied from HassanB613/etl-validator-github — the
reference ships no media codecs (its pipelines treat binary payloads
as opaque, see extract/GENERIC_FILE_PIPE.py); this module exists for
the training-data side of the engine, where frame-sampled video is a
first-class modality.
"""

from __future__ import annotations

import struct

AVI_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010

_AVIH_SIZE = 56
_STRH_SIZE = 56
_STRF_SIZE = 40
_IDX1_ENTRY = 16


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(width: int, height: int, frames: "list[bytes]",
                     fps: int = 12) -> bytes:
    """Emit a real MJPEG AVI: RIFF/hdrl/strl/movi/idx1 with one 'vids'
    stream whose '00dc' chunks are the given baseline-JPEG frames."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if fps <= 0:
        raise ValueError(f"bad fps {fps}")
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    for i, f in enumerate(frames):
        if len(f) < 4 or f[:2] != b"\xFF\xD8" or f[-2:] != b"\xFF\xD9":
            raise ValueError(f"frame {i} is not a complete JPEG "
                             "(missing SOI/EOI markers)")
    max_size = max(len(f) for f in frames)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,       # dwMicroSecPerFrame
        max_size * fps,         # dwMaxBytesPerSec (upper bound)
        0,                      # dwPaddingGranularity
        AVI_HASINDEX,           # dwFlags
        len(frames),            # dwTotalFrames
        0,                      # dwInitialFrames
        1,                      # dwStreams
        max_size,               # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,             # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"MJPG",
        0,                      # dwFlags
        0, 0,                   # wPriority, wLanguage
        0,                      # dwInitialFrames
        1, fps,                 # dwScale, dwRate -> fps frames/sec
        0,                      # dwStart
        len(frames),            # dwLength (in frames)
        max_size,               # dwSuggestedBufferSize
        0xFFFFFFFF,             # dwQuality (default)
        0,                      # dwSampleSize (0: varying-size samples)
        0, 0, width, height,    # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        _STRF_SIZE, width, height,
        1, 24,                  # biPlanes, biBitCount
        b"MJPG",
        width * height * 3,     # biSizeImage (decoded bound)
        0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = bytearray()
    index = []
    for f in frames:
        # Offset convention: position of the '00dc' fourcc relative to
        # the start of the movi list data ('movi' fourcc itself is the
        # first 4 bytes of that data).
        index.append((4 + len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_body))

    idx1 = _chunk(b"idx1", b"".join(
        b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, size)
        for off, size in index
    ))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(data: bytes, pos: int, end: int, where: str):
    """Yield (fourcc, body_start, body_size) for each chunk in
    data[pos:end], enforcing bounds and even padding bytes."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated chunk header in {where}")
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"chunk {fourcc!r} in {where} overruns its container "
                f"({size} bytes at {body}, container ends {end})")
        yield fourcc, body, size
        pos = body + size
        if size % 2:
            if pos >= end or data[pos] != 0:
                raise ValueError(
                    f"chunk {fourcc!r} in {where} missing zero pad byte")
            pos += 1


def decode_avi(payload: bytes) -> "tuple[int, int, int, list[bytes]]":
    """Parse a strict MJPEG AVI → (width, height, fps, jpeg_frames).

    Every cross-reference is validated: avih vs strh frame counts, strf
    vs avih dimensions, idx1 entry offsets/sizes against the actual
    movi chunk layout, per-frame SOI/EOI markers — and the RIFF size
    must cover the payload exactly (no truncation, no trailing bytes).
    """
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if 8 + riff_size != len(data):
        raise ValueError(
            f"RIFF size {riff_size} disagrees with payload length "
            f"{len(data)}: truncated or trailing bytes")
    if data[8:12] != b"AVI ":
        raise ValueError(f"RIFF form is {data[8:12]!r}, not 'AVI '")

    tops = list(_walk(data, 12, len(data), "RIFF body"))
    kinds = [(fcc if fcc != b"LIST" else data[body:body + 4])
             for fcc, body, _ in tops]
    if kinds != [b"hdrl", b"movi", b"idx1"]:
        raise ValueError(f"expected [hdrl, movi, idx1], got {kinds}")
    (_, hdrl_body, hdrl_size), (_, movi_body, movi_size), \
        (_, idx1_body, idx1_size) = tops

    # --- hdrl: avih + LIST strl(strh, strf) --------------------------
    hdrl = list(_walk(data, hdrl_body + 4, hdrl_body + hdrl_size, "hdrl"))
    if (len(hdrl) != 2 or hdrl[0][0] != b"avih" or hdrl[1][0] != b"LIST"
            or data[hdrl[1][1]:hdrl[1][1] + 4] != b"strl"):
        raise ValueError("hdrl must hold exactly avih then LIST strl")
    _, avih_body, avih_size = hdrl[0]
    if avih_size != _AVIH_SIZE:
        raise ValueError(f"avih is {avih_size} bytes, want {_AVIH_SIZE}")
    (us_per_frame, _, _, flags, total_frames, _, n_streams, _,
     width, height) = struct.unpack_from("<10I", data, avih_body)
    if n_streams != 1:
        raise ValueError(f"expected 1 stream, avih declares {n_streams}")
    if not flags & AVI_HASINDEX:
        raise ValueError("avih is missing the AVIF_HASINDEX flag")
    if width <= 0 or height <= 0 or total_frames <= 0:
        raise ValueError(
            f"bad avih geometry {width}x{height} x{total_frames} frames")

    _, strl_body, strl_size = hdrl[1]
    strl = list(_walk(data, strl_body + 4, strl_body + strl_size, "strl"))
    if (len(strl) != 2 or strl[0][0] != b"strh" or strl[1][0] != b"strf"):
        raise ValueError("strl must hold exactly strh then strf")
    _, strh_body, strh_size = strl[0]
    if strh_size != _STRH_SIZE:
        raise ValueError(f"strh is {strh_size} bytes, want {_STRH_SIZE}")
    (fcc_type, handler, _, _, _, _, scale, rate, _, length,
     _, _, _) = struct.unpack_from("<4s4sIHHIIIIIIII", data, strh_body)
    if fcc_type != b"vids" or handler != b"MJPG":
        raise ValueError(
            f"stream is {fcc_type!r}/{handler!r}, want vids/MJPG")
    if scale != 1 or rate <= 0:
        raise ValueError(f"unsupported time base {rate}/{scale}")
    fps = rate
    if us_per_frame != 1_000_000 // fps:
        raise ValueError(
            f"avih us/frame {us_per_frame} disagrees with strh rate {fps}")
    if length != total_frames:
        raise ValueError(
            f"strh length {length} != avih total frames {total_frames}")
    _, strf_body, strf_size = strl[1]
    if strf_size != _STRF_SIZE:
        raise ValueError(f"strf is {strf_size} bytes, want {_STRF_SIZE}")
    (bi_size, bi_w, bi_h, _, _, compression) = struct.unpack_from(
        "<IiiHH4s", data, strf_body)
    if bi_size != _STRF_SIZE or compression != b"MJPG":
        raise ValueError(
            f"strf is not a MJPG BITMAPINFOHEADER "
            f"(size {bi_size}, compression {compression!r})")
    if (bi_w, abs(bi_h)) != (width, height):
        raise ValueError(
            f"strf {bi_w}x{abs(bi_h)} disagrees with avih "
            f"{width}x{height}")

    # --- movi: the '00dc' frame chunks -------------------------------
    frames: "list[bytes]" = []
    offsets: "list[tuple[int, int]]" = []
    for fcc, body, size in _walk(data, movi_body + 4,
                                 movi_body + movi_size, "movi"):
        if fcc != b"00dc":
            raise ValueError(f"unexpected movi chunk {fcc!r}")
        frame = data[body:body + size]
        if size < 4 or frame[:2] != b"\xFF\xD8" or frame[-2:] != b"\xFF\xD9":
            raise ValueError(
                f"frame {len(frames)} is not a complete JPEG")
        offsets.append((body - 8 - movi_body, size))
        frames.append(frame)
    if len(frames) != total_frames:
        raise ValueError(
            f"movi holds {len(frames)} frames, headers declare "
            f"{total_frames}")

    # --- idx1: must mirror the movi layout exactly -------------------
    if idx1_size != _IDX1_ENTRY * total_frames:
        raise ValueError(
            f"idx1 is {idx1_size} bytes for {total_frames} frames, "
            f"want {_IDX1_ENTRY * total_frames}")
    for i, (off, size) in enumerate(offsets):
        fcc, eflags, eoff, esize = struct.unpack_from(
            "<4sIII", data, idx1_body + _IDX1_ENTRY * i)
        if fcc != b"00dc" or not eflags & AVIIF_KEYFRAME:
            raise ValueError(f"idx1 entry {i} is not a 00dc keyframe")
        if (eoff, esize) != (off, size):
            raise ValueError(
                f"idx1 entry {i} points at ({eoff}, {esize}), movi "
                f"layout has ({off}, {size})")
    return width, height, fps, frames
