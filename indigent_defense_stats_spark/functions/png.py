"""Pure-stdlib PNG codec (zlib + per-scanline filters + CRC).

The container has no PIL/ffmpeg, but PNG needs neither: the format is
zlib-compressed scanlines, each prefixed by one of five filter bytes
(None/Sub/Up/Average/Paeth, RFC 2083 §6), wrapped in CRC-checked
chunks.  ~150 lines of stdlib close the engine's last declared decode
integration point for images — `decoder='real'` in
operators/multimodal.py does REAL pixel work through this module.

Supported: 8-bit greyscale (color type 0) and 8-bit RGB (color type
2), non-interlaced — the subset the synthetic media generator emits.
Anything else raises ValueError naming the unsupported field, which is
the correct behavior for a quarantine-not-crash ingest path.

Scale note: this runs inside ``mapInPandas`` per Arrow batch; cost is
per-item local with zero shuffle.  Images here are bounded (<=32x32 in
the synthetic corpus), so the per-row Python defilter loop is nowhere
near the hot path; a production executor image swaps in PIL/libpng
under the identical mapInPandas contract.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color_type -> samples per pixel
# decode bound on (width*bpp+1)*height — a hostile IHDR or an IDAT
# decompression bomb quarantines (ValueError) instead of exhausting
# executor memory; 64 MiB is ~4x the largest frame the media layer emits
_MAX_RAW_BYTES = 64 << 20


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filter_choice=None,
) -> bytes:
    """Encode raw 8-bit pixels as a real PNG.

    ``pixels`` is row-major, ``width*height*channels`` bytes.
    ``filter_choice(row_index) -> 0..4`` selects the per-scanline
    filter (default: Paeth everywhere, the libpng-ish choice); the
    synthetic generator varies it per row so decode exercises all five
    defilter paths.
    """
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color_type {color_type}")
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {stride * height}"
        )
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = 4 if filter_choice is None else int(filter_choice(y))
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[x] - (((row[x - bpp] if x >= bpp else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(stride)
            )
        elif ft == 4:  # Paeth
            raw += bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - bpp] if x >= bpp else 0,
                        prev[x],
                        prev[x - bpp] if x >= bpp else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        else:
            raise ValueError(f"bad filter type {ft}")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG -> (width, height, color_type, raw pixel bytes).

    Validates the signature and every chunk CRC, concatenates multiple
    IDAT chunks, inflates, and reverses all five scanline filters.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    height = color_type = bpp = 0
    idat = bytearray()
    saw_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            # covers both a short payload and a short/missing 4-byte
            # CRC trailer — struct.unpack on the CRC slice would raise
            # struct.error and break the ValueError quarantine contract
            raise ValueError("truncated chunk payload or CRC")
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if comp or filt or interlace:
                raise ValueError("unsupported compression/filter/interlace")
            bpp = _CHANNELS[color_type]
            # quarantine contract: a hostile IHDR can declare absurd
            # dimensions and make the raw-buffer allocation itself the
            # attack — reject before any allocation sized by them
            if (width * bpp + 1) * height > _MAX_RAW_BYTES:
                raise ValueError(
                    f"declared dimensions {width}x{height} exceed the "
                    f"{_MAX_RAW_BYTES}-byte decode bound"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    if not saw_iend:
        # per-chunk CRCs can all pass on a stream cut at a chunk
        # boundary — only the IEND trailer proves the file is whole
        raise ValueError("truncated PNG (missing IEND)")
    stride = width * bpp
    expected = (stride + 1) * height
    try:
        # bounded inflate: cap output at expected+1 so a decompression
        # bomb (tiny IDAT, huge plaintext) can never allocate past the
        # IHDR-declared size — the +1 byte distinguishes overrun
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:  # corrupt deflate stream
        raise ValueError(f"bad IDAT stream: {exc}") from exc
    if len(raw) > expected or dec.unconsumed_tail:
        raise ValueError("IDAT inflates past the declared dimensions")
    if len(raw) != expected:
        # also covers a truncated deflate stream, which decompressobj
        # (unlike zlib.decompress) reports as short output, not an error
        raise ValueError("inflated size does not match dimensions")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft} in scanline {y}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, color_type, bytes(out)
