"""LZ4 block codec — ctypes binding to the native library with a pure
Python fallback.

Wire format: standard LZ4 blocks, as produced/consumed by the reference
pack tooling (reference: src/asset.cpp:488-523 CDAT block decompression,
tools/assetcompressor.cpp).
"""

from __future__ import annotations

import ctypes

def _load_native():
    from .. import native as native_mod
    return native_mod.load()


def decompress(src: bytes, dstcap: int) -> bytes:
    """Decompress one LZ4 block, producing at most dstcap bytes."""
    lib = _load_native()
    if lib:
        out = ctypes.create_string_buffer(dstcap)
        n = lib.datum_lz4_decompress(src, len(src), out, dstcap)
        if n < 0:
            raise ValueError("corrupt LZ4 block")
        return out.raw[:n]
    return _py_decompress(src, dstcap)


def compress(src: bytes, dstcap: int) -> tuple[bytes, int]:
    """Compress as much of src as fits into dstcap output bytes.

    Returns (compressed_bytes, input_bytes_consumed) — mirroring the
    reference packer contract for fixed-size output blocks.
    """
    lib = _load_native()
    if lib:
        out = ctypes.create_string_buffer(dstcap)
        consumed = ctypes.c_long(len(src))
        n = lib.datum_lz4_compress(src, ctypes.byref(consumed), out, dstcap)
        return out.raw[:n], consumed.value
    return _py_compress(src, dstcap)


# ---------------------------------------------------------------------------
# Pure-Python fallback (correct but slow; used only when the native lib
# is unavailable)
# ---------------------------------------------------------------------------

def _py_decompress(src: bytes, dstcap: int) -> bytes:
    ip, iend = 0, len(src)
    out = bytearray()
    while ip < iend:
        token = src[ip]
        ip += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                s = src[ip]
                ip += 1
                litlen += s
                if s != 255:
                    break
        out += src[ip:ip + litlen]
        ip += litlen
        if ip >= iend:
            break
        offset = src[ip] | (src[ip + 1] << 8)
        ip += 2
        matchlen = token & 15
        if matchlen == 15:
            while True:
                s = src[ip]
                ip += 1
                matchlen += s
                if s != 255:
                    break
        matchlen += 4
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block")
        for i in range(matchlen):
            out.append(out[start + i])
        if len(out) > dstcap:
            raise ValueError("LZ4 output overflow")
    return bytes(out[:dstcap])


def _py_compress(src: bytes, dstcap: int) -> tuple[bytes, int]:
    # Greedy single-probe hash matcher; same stream shape as the native path.
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    ip = 0
    consumed_end = n

    def seq_size(litlen, matchlen):
        size = 1 + litlen
        if litlen >= 15:
            size += 1 + (litlen - 15) // 255
        if matchlen > 0:
            size += 2
            ml = matchlen - 4
            if ml >= 15:
                size += 1 + (ml - 15) // 255
        return size

    def emit(litlen, offset, matchlen):
        ml = matchlen - 4 if matchlen else 0
        out.append(((15 if litlen >= 15 else litlen) << 4) | (15 if ml >= 15 and matchlen else (ml if matchlen else 0)))
        if litlen >= 15:
            rem = litlen - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[anchor:anchor + litlen])
        if matchlen:
            out.append(offset & 0xFF)
            out.append(offset >> 8)
            if ml >= 15:
                rem = ml - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    while ip < n - 12:
        key = src[ip:ip + 4]
        cand = table.get(key, -1)
        table[key] = ip
        if cand >= 0 and ip - cand <= 0xFFFF:
            matchlen = 4
            while ip + matchlen < n - 5 and src[cand + matchlen] == src[ip + matchlen]:
                matchlen += 1
            litlen = ip - anchor
            if len(out) + seq_size(litlen, matchlen) + 1 > dstcap:
                break
            emit(litlen, ip - cand, matchlen)
            ip += matchlen
            anchor = ip
        else:
            ip += 1

    litlen = n - anchor
    while litlen > 0 and len(out) + seq_size(litlen, 0) > dstcap:
        litlen -= 1
        consumed_end -= 1
    emit(litlen, 0, 0)
    return bytes(out), anchor + litlen
