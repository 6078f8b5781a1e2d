"""Pure-stdlib+numpy WAV/PCM audio codec for the multimodal kernels — the
audio sibling of :mod:`functions.imagecodec` (r4 VERDICT item 3's policy:
decode what public specs + the standard library allow for REAL; leave a
``NotImplementedError`` seam only for codecs that need external libraries).

Supported: RIFF/WAVE containers with PCM (format 1) samples at 8 bits
(unsigned) or 16 bits (signed little-endian), any channel count and sample
rate; chunks other than ``fmt ``/``data`` (LIST, fact, cue…) are skipped by
the spec's length-prefix walk. Compressed formats (MP3/AAC/OGG/FLAC and
non-PCM WAV like IEEE-float or A-law) raise NotImplementedError at the
dispatch seam.

Deterministic throughout, so a SQL oracle can reproduce the decoded stats
exactly (``plans/queries.q_audio_stats_real`` builds real WAV bytes from a
pixel-style per-sample formula and the oracle recomputes the expected
integer aggregates analytically).
"""

from __future__ import annotations

import struct

import numpy as np


def sniff(b: bytes) -> str | None:
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b.startswith(b"fLaC"):
        return "flac"
    if b.startswith(b"OggS"):
        return "ogg"
    if b.startswith(b"ID3") or (len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
        return "mp3"
    return None


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (samples int32 array shaped (n_frames, channels),
    sample_rate). 16-bit samples keep their signed values; 8-bit (unsigned
    per spec) are centered to signed by subtracting 128."""
    if sniff(b) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV format {audio_format} (non-PCM) needs an external codec"
        )
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        samples = raw.astype(np.int32)
    elif bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = raw.astype(np.int32) - 128
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    frames = len(samples) // channels
    return samples[: frames * channels].reshape(frames, channels), int(rate)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n_frames, channels) int array → canonical PCM WAV bytes (the test /
    fixture encoder; 16-bit signed LE or 8-bit unsigned)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    elif bits == 8:
        data = (samples.astype(np.int32) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return out


def decode_audio(b: bytes) -> tuple[np.ndarray, int]:
    """Dispatch: WAV decodes for real; recognized compressed formats raise
    NotImplementedError (the external-codec seam); unknown bytes raise
    ValueError."""
    fmt = sniff(b)
    if fmt == "wav":
        return decode_wav(b)
    if fmt is not None:
        raise NotImplementedError(
            f"{fmt} decode requires an external audio codec library"
        )
    raise ValueError("unrecognized audio payload")


def pcm_stats(samples: np.ndarray, rate: int) -> dict:
    """Integer-exact stats over decoded PCM — integers only, so an external
    SQL oracle reproduces them bit-for-bit (no float accumulation order
    issues): frame count, duration in ms (floor), peak |sample| and
    sum of |sample| across all channels."""
    flat = samples.reshape(-1).astype(np.int64)
    n_frames = int(samples.shape[0])
    return {
        "n_frames": n_frames,
        "sample_rate": int(rate),
        "n_channels": int(samples.shape[1]),
        "duration_ms": (n_frames * 1000) // int(rate) if rate else 0,
        "peak": int(np.abs(flat).max()) if flat.size else 0,
        "sum_abs": int(np.abs(flat).sum()),
    }
