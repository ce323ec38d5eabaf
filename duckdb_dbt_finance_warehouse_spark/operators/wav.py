"""Pure-stdlib WAV (RIFF/PCM) codec — the audio companion to
``operators/png`` (SURVEY §7.6 multimodal).

The container has no librosa/soundfile, but canonical 16-bit PCM WAV is
pure ``struct``: a RIFF header, an fmt chunk, and little-endian sample
frames. This module implements both directions for 16-bit mono/stereo
PCM so the multimodal pipeline's audio decode is a genuine waveform
decode, not a byte-stat stand-in:

- ``encode_wav`` writes a spec-complete RIFF/WAVE/fmt/data layout with
  correct chunk and byte-rate bookkeeping.
- ``decode_wav`` walks the chunk list (skipping unknown chunks the way
  real decoders must — a LIST/INFO chunk in the middle is legal),
  validates the fmt contract, and returns the int16 samples.

Like the PNG codec, this is pure bytes -> values; the Arrow batching
lives in the callers (operators/multimodal).
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Encode int16 samples (interleaved if stereo) as a 16-bit PCM
    WAV. Deterministic: same samples, same bytes."""
    if channels not in (1, 2):
        raise ValueError(f"encode_wav: channels must be 1 or 2 (got {channels})")
    if len(samples) % channels:
        raise ValueError(
            f"encode_wav: {len(samples)} samples not divisible by {channels} channels"
        )
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"encode_wav: sample {s} outside int16")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a 16-bit PCM WAV to (sample_rate, channels, samples).
    Walks the chunk list (unknown chunks are skipped, as the RIFF spec
    requires), validates the PCM/16-bit fmt contract, and raises on
    anything else — silently mis-decoded audio is worse than a loud
    failure."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE stream")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 != len(data):
        raise ValueError(
            f"decode_wav: RIFF length {riff_len} does not match payload {len(data) - 8}"
        )
    pos = 12
    rate = channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError(
                    f"decode_wav: only 16-bit PCM supported (fmt={fmt_code}, bits={bits})"
                )
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    if len(pcm) % 2:
        raise ValueError("decode_wav: odd data-chunk length for 16-bit samples")
    return rate, channels, list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
