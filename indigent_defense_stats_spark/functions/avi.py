"""Pure-stdlib AVI (RIFF) container codec for MJPEG video.

Closes the engine's last declared media stub: video.  ffmpeg is absent
from the container by design, but Motion-JPEG needs no codec library —
an AVI file is a RIFF chunk tree ('hdrl' headers, 'movi' frame chunks,
'idx1' index) whose '00dc' payloads are ordinary baseline JPEG frames,
which functions/jpeg.py already decodes for real.  ~150 lines of
stdlib make ``decoder='real'`` cover all three media modalities
(PNG/JPEG images, PCM WAV audio, MJPEG-AVI video).  Reference analog:
the media attachments on the reference's case page
(resources/test_files/test_123456.html:24-26).

Scope — the honest subset, quarantining the rest with ValueError (the
parse-stage error-sink contract, reference parser/hays.py's error-log
discipline):

- single 'vids' stream, fccHandler/biCompression 'MJPG', with an
  idx1 index whose every entry is VERIFIED against the movi chunks
  (offset + size) — a lying index quarantines instead of delivering
  frames the index claims are elsewhere;
- other codecs ('DIB ' uncompressed, 'XVID', 'H264', ...) -> ValueError
  naming the fourcc; multi-stream, audio-bearing ('wb' chunks) files
  -> ValueError;
- hostile declared sizes checked BEFORE any size-driven slice (the
  png.py/_MAX_RAW_BYTES contract); every truncation point raises
  ValueError, never struct/IndexError.

Exactness contract: the container is lossless framing around JPEG
payloads; with functions/jpeg.py's flat-tile exactness (unit quant
tables, DC-only blocks) a flat-tile MJPEG frame round-trips
BIT-EXACTLY, so a (doc_id, frame_idx)-arithmetic tile grammar
(operators/multimodal.py) gives the whole demux+decode chain an exact
SQL oracle.

Scale note: runs inside ``mapInPandas`` per Arrow batch; cost is
per-item local with zero shuffle.  Clips here are bounded (<=5 frames
of <=24x24); a production executor image swaps in PyAV/ffmpeg under
the identical mapInPandas contract.
"""

from __future__ import annotations

import struct

_MAX_RAW_BYTES = 64 << 20  # same hostile-input bound as png/jpeg/wav
_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _chunk(tag: bytes, payload: bytes) -> bytes:
    out = tag + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"  # RIFF pads odd chunk bodies
    return out


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(
    width: int, height: int, fps: int, frames: list[bytes]
) -> bytes:
    """Encode JPEG ``frames`` as a real MJPEG AVI (hdrl + movi + idx1).

    Frames must be whole JPEG files (SOI..EOI) of the declared
    dimensions — the encoder frames them verbatim; compression is the
    JPEG encoder's job (functions/jpeg.py)."""
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")
    if not frames:
        raise ValueError("need at least one frame")
    for i, fr in enumerate(frames):
        if fr[:2] != b"\xff\xd8":
            raise ValueError(f"frame {i} is not a JPEG (no SOI)")
    max_size = max(len(fr) for fr in frames)
    avih = struct.pack(
        "<IIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,  # max bytes per second (upper bound)
        0,  # padding granularity
        _AVIF_HASINDEX,
        len(frames),
        0,  # initial frames
        1,  # streams
        max_size,  # suggested buffer
        width,
        height,
    ) + bytes(16)  # reserved[4]
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # flags
            0,  # priority
            0,  # language
            0,  # initial frames
            1,  # scale
            fps,  # rate (fps = rate/scale)
            0,  # start
            len(frames),  # length
            max_size,  # suggested buffer
            0,  # quality
            0,  # sample size
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # planes
        24,  # bit count
        b"MJPG",  # biCompression
        width * height * 3,  # size image (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    idx = bytearray()
    for fr in frames:
        # idx1 offsets are relative to the 'movi' fourcc; the first
        # chunk header sits 4 bytes past it
        idx += b"00dc" + struct.pack(
            "<III", _AVIIF_KEYFRAME, 4 + len(movi_body), len(fr)
        )
        movi_body += _chunk(b"00dc", fr)
    body = hdrl + _list(b"movi", bytes(movi_body)) + _chunk(
        b"idx1", bytes(idx)
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, size) for chunks in [pos, end); every
    bound violation is ValueError (truncation contract)."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated chunk header")
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if size > _MAX_RAW_BYTES:
            raise ValueError(
                f"chunk {tag!r} declares {size} bytes"
                f" (> {_MAX_RAW_BYTES} decode bound)"
            )
        if pos + 8 + size > end:
            raise ValueError(
                f"chunk {tag!r} declares {size} bytes, only"
                f" {end - pos - 8} remain"
            )
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode an MJPEG AVI -> (width, height, fps, jpeg_frames).

    The idx1 index is required (AVIF_HASINDEX discipline) and every
    entry is verified against the movi chunk it points at; ValueError
    on anything outside the supported subset (module docstring)."""
    if len(data) < 12:
        raise ValueError("truncated RIFF header")
    if data[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    if riff_size + 8 > len(data):
        raise ValueError(
            f"RIFF declares {riff_size + 8} bytes, buffer has {len(data)}"
        )
    if data[8:12] != b"AVI ":
        raise ValueError("RIFF form is not AVI")

    width = height = fps = -1
    n_frames = -1
    movi_span: tuple[int, int] | None = None
    idx_entries: list[tuple[bytes, int, int, int]] | None = None
    streams = 0

    for tag, bs, size in _walk(data, 12, 8 + riff_size):
        if tag == b"LIST":
            if size < 4:
                raise ValueError("LIST chunk too small for a kind")
            kind = data[bs : bs + 4]
            if kind == b"hdrl":
                for t2, bs2, sz2 in _walk(data, bs + 4, bs + size):
                    if t2 == b"avih":
                        if sz2 < 56:
                            raise ValueError(f"avih is {sz2} bytes, want 56")
                        f = struct.unpack_from("<10I", data, bs2)
                        us_per_frame, flags, total = f[0], f[3], f[4]
                        if not flags & _AVIF_HASINDEX:
                            raise ValueError("AVI without idx1 index flag")
                        if us_per_frame == 0:
                            raise ValueError("zero frame duration")
                        fps = 1_000_000 // us_per_frame
                        n_frames = total
                        width, height = f[8], f[9]
                    elif t2 == b"LIST" and data[bs2 : bs2 + 4] == b"strl":
                        streams += 1
                        for t3, bs3, sz3 in _walk(
                            data, bs2 + 4, bs2 + sz2
                        ):
                            if t3 == b"strh":
                                if sz3 < 8:
                                    raise ValueError("truncated strh")
                                fcc_type = data[bs3 : bs3 + 4]
                                handler = data[bs3 + 4 : bs3 + 8]
                                if fcc_type != b"vids":
                                    raise ValueError(
                                        "unsupported stream type "
                                        f"{fcc_type!r} (vids-only MJPEG)"
                                    )
                                if handler != b"MJPG":
                                    raise ValueError(
                                        "unsupported video codec "
                                        f"{handler!r} (MJPG only)"
                                    )
                            elif t3 == b"strf":
                                if sz3 < 40:
                                    raise ValueError("truncated strf")
                                comp = data[bs3 + 16 : bs3 + 20]
                                if comp != b"MJPG":
                                    raise ValueError(
                                        "unsupported biCompression "
                                        f"{comp!r} (MJPG only)"
                                    )
            elif kind == b"movi":
                movi_span = (bs, size)
        elif tag == b"idx1":
            if size % 16:
                raise ValueError(f"idx1 size {size} not a multiple of 16")
            idx_entries = [
                struct.unpack_from("<4sIII", data, bs + 16 * i)
                for i in range(size // 16)
            ]

    if width < 0:
        raise ValueError("no avih header")
    if streams != 1:
        raise ValueError(f"{streams} streams (single-vids-only)")
    if movi_span is None:
        raise ValueError("no movi list")
    if idx_entries is None:
        raise ValueError("no idx1 index")

    movi_start, movi_size = movi_span
    frames: list[bytes] = []
    offsets: list[tuple[int, int]] = []
    for t2, bs2, sz2 in _walk(data, movi_start + 4, movi_start + movi_size):
        if t2[2:4] == b"wb":
            raise ValueError("audio chunk in MJPEG-only reader")
        if t2 != b"00dc":
            raise ValueError(f"unsupported movi chunk {t2!r}")
        fr = data[bs2 : bs2 + sz2]
        if fr[:2] != b"\xff\xd8":
            raise ValueError(f"frame {len(frames)} has no JPEG SOI")
        # chunk offset relative to the 'movi' fourcc (bs2-8 is the
        # chunk header; the fourcc sits at movi_start)
        offsets.append((bs2 - 8 - movi_start, sz2))
        frames.append(fr)

    if n_frames != len(frames):
        raise ValueError(
            f"avih declares {n_frames} frames, movi has {len(frames)}"
        )
    if len(idx_entries) != len(frames):
        raise ValueError(
            f"idx1 has {len(idx_entries)} entries for {len(frames)} frames"
        )
    for i, ((ckid, _flags, off, sz), (want_off, want_sz)) in enumerate(
        zip(idx_entries, offsets)
    ):
        if ckid != b"00dc" or off != want_off or sz != want_sz:
            raise ValueError(
                f"idx1 entry {i} disagrees with movi chunk"
                f" (index {ckid!r}@{off}+{sz}, actual 00dc@{want_off}"
                f"+{want_sz})"
            )
    return width, height, fps, frames
