"""Minimal AVI (RIFF) container codec for Motion-JPEG streams.

Closes part of the video boundary for REAL: an MJPEG AVI is a RIFF
container whose 'movi' list holds one complete JFIF image per video
chunk, so with the native JPEG codec (:mod:`.jpeg`) frame sampling and
decode need no ffmpeg. The RIFF/AVI layout is public Microsoft
specification (msdn AVI RIFF File Reference); only the structures the
reader needs are implemented.

Writer (:func:`encode_avi_mjpeg`) emits a spec-shaped file — RIFF/AVI
header list ('avih', 'strl' with 'vids'/'MJPG' stream header +
BITMAPINFOHEADER) and the 'movi' chunk list — used as a test fixture
and for synthesizing corpora.

Reader (:func:`avi_mjpeg_frames`) is a tolerant RIFF walker: it
verifies the RIFF/AVI magic, confirms an MJPG video stream (or sniffs
JPEG SOI bytes in the chunks), and yields the raw JPEG payload of each
video frame chunk ('00dc'/'00db'). Non-MJPEG codecs raise
NotImplementedError — compressed inter-frame codecs genuinely need
ffmpeg.
"""

from __future__ import annotations

import struct
from typing import List

__all__ = ["encode_avi_mjpeg", "avi_mjpeg_frames", "is_avi"]


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" \
        and payload[8:12] == b"AVI "


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""      # RIFF chunks are word-aligned
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(jpeg_frames: List[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """RIFF/AVI bytes holding ``jpeg_frames`` as an MJPG video stream."""
    n = len(jpeg_frames)
    usec_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack("<14I", usec_per_frame, 0, 0, 0x10, n, 0, 1, 0,
                       width, height, 0, 0, 0, 0)
    # AVISTREAMHEADER: flags, priority, language, initialFrames, scale,
    # rate, start, length, bufferSize, quality, sampleSize, rcFrame
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0,
                          0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", f) for f in jpeg_frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per chunk (offset relative to 'movi' kind field)
    idx = bytearray()
    off = 4
    for f in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_mjpeg_frames(payload: bytes) -> List[bytes]:
    """JPEG payloads of every video frame chunk in an MJPEG AVI.

    Raises ValueError on a malformed container and NotImplementedError
    when the video stream uses a codec other than MJPG (those need a
    real ffmpeg — out of scope by design).
    """
    data = bytes(payload)
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    chunks: dict = {}                  # stream number -> [frame bytes]
    stream_no = 0
    vids_stream = None                 # which stream number is video
    handler_mjpg = None

    def walk(pos: int, end: int) -> None:
        nonlocal handler_mjpg, stream_no, vids_stream
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if tag == b"LIST":
                walk(body_start + 4, body_end)
            elif tag == b"strh" and size >= 8:
                # streams are numbered in header order — an AVI with an
                # audio strl first carries its video chunks as '01dc'
                if data[body_start:body_start + 4] == b"vids":
                    vids_stream = stream_no
                    handler_mjpg = data[body_start + 4:body_start + 8] \
                        in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00")
                stream_no += 1
            elif size > 0 and tag[:2].isdigit() and tag[2:] in (b"dc",
                                                                b"db"):
                chunks.setdefault(int(tag[:2]), []).append(
                    data[body_start:body_end])
            pos = body_start + size + (size % 2)

    walk(12, len(data))
    if vids_stream is not None and vids_stream in chunks:
        frames = chunks[vids_stream]
    else:
        # no stream headers (or chunks on an unexpected stream): fall
        # back to whichever stream's chunks are JPEG payloads
        frames = next((fs for fs in chunks.values()
                       if fs and fs[0][:2] == b"\xff\xd8"), [])
    if handler_mjpg is False and not (
            frames and frames[0][:3] == b"\xff\xd8\xff"):
        raise NotImplementedError(
            "AVI video stream is not MJPG — compressed codecs require "
            "ffmpeg (out of scope)")
    if frames and frames[0][:2] != b"\xff\xd8":
        raise NotImplementedError(
            "AVI frame chunks are not JPEG — non-MJPEG codecs require "
            "ffmpeg (out of scope)")
    if not frames and chunks:
        raise NotImplementedError(
            "AVI has stream chunks but none decodable as MJPEG — "
            "other codecs require ffmpeg (out of scope)")
    return frames
