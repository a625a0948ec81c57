"""Zero-dependency GIF codec (LZW) for the multimodal dedup path.

Decoder: GIF87a/GIF89a, global or local color table, full
variable-width LZW with clear/reset handling — any conformant
single-frame stream. Scope cuts (raise NotImplementedError, routed to
NULL rows by the non-strict corpus path): interlaced images and
animation beyond the first frame (the first image block decodes; later
frames would need graphic-control disposal semantics).

Encoder: lossless palette GIF for images with ≤ 256 distinct colors
(true for web-graphics content where GIF survives; photographic
payloads belong in PNG/JPEG — encode raises rather than silently
quantizing, keeping the transcode path byte-faithful for the
cross-format dedup oracle). Emits real dictionary LZW (grows to 12
bits, resets on overflow) so a round-trip exercises both codecs'
dictionary machinery.

Like the other codecs this runs inside Arrow-batched mapInPandas on
opaque binary columns — pure-Python per payload, bounded by the 32×32
synthetic frames in tests; the Spark-side plumbing (schema, batching,
NULL-on-undecodable) is the part that must hold at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("LZW: first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW: code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    emit(clear)
    buf = b""
    for b in indices:
        nxt = buf + bytes([b])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf])
        table[nxt] = next_code
        # width grows when the NEXT emitted code could be next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4096:
            emit(clear)
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB (first frame)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF")
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            bytes(_lzw_decode(bytes(data), min_code_size)), np.uint8
        )
        if len(idx) < w * h:
            raise ValueError("GIF: truncated pixel data")
        return pal[idx[: w * h].astype(np.int64)].reshape(h, w, 3)
    raise ValueError("GIF: no image block")


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → single-frame GIF87a. Lossless: requires
    ≤ 256 distinct colors (raises NotImplementedError beyond — GIF is
    a palette format; quantizing would break transcode fidelity)."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise NotImplementedError(
            f"GIF encode needs <=256 distinct colors (got {len(pal)})"
        )
    pal_bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    pal_size = 1 << pal_bits
    pal_full = np.zeros((pal_size, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    min_code_size = max(2, pal_bits)
    lzw = _lzw_encode(inverse.astype(np.uint8).tobytes(), min_code_size)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)
    header = b"GIF87a" + struct.pack(
        "<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0
    )
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    return (
        header + pal_full.tobytes() + img_desc
        + bytes([min_code_size]) + bytes(sub) + b"\x3b"
    )
