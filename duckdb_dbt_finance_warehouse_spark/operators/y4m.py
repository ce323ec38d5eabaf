"""Pure-stdlib YUV4MPEG2 (y4m) codec — the video companion to
``operators/png``/``operators/wav`` (SURVEY §7.6 multimodal).

The container has no ffmpeg/PyAV, but YUV4MPEG2 is the one video
container that needs neither entropy coding nor inter-frame prediction:
an ASCII stream header (``YUV4MPEG2 W… H… F… … C…\\n``), then per frame
an ASCII ``FRAME…\\n`` marker followed by raw planar YCbCr samples.
mjpegtools/ffmpeg read and write exactly this layout, so a stream this
module emits is a real video file, and ``decode_y4m`` is a genuine
frame decode — not a byte-stat stand-in:

- ``encode_y4m`` writes a spec-complete stream header (width, height,
  frame rate, interlacing, aspect, colorspace) and raw frames.
- ``decode_y4m`` parses the tagged header parameters (unknown
  parameters are skipped, as real decoders must — ``X…`` extensions
  are legal), validates every FRAME marker, and slices fixed-size
  planar frames; a truncated final frame raises.

Colorspaces cover the subsampling arithmetic that makes the format
non-trivial: ``Cmono`` (Y only), ``C444`` (full-res Cb/Cr) and
``C420jpeg``/``C420`` (quarter-res Cb/Cr — dims round UP for odd
sizes, per the mjpegtools convention). Like the PNG/WAV codecs this is
pure bytes -> values; Arrow batching lives in operators/multimodal.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2"

# colorspace tag -> chroma plane size as a function of (w, h); Y is
# always w*h. C420 variants differ only in siting (where the chroma
# sample sits inside the 2x2 block), not in layout — same plane sizes.
_CHROMA_DIMS = {
    "mono": lambda w, h: 0,
    "444": lambda w, h: w * h,
    "420jpeg": lambda w, h: ((w + 1) // 2) * ((h + 1) // 2),
    "420": lambda w, h: ((w + 1) // 2) * ((h + 1) // 2),
    "420mpeg2": lambda w, h: ((w + 1) // 2) * ((h + 1) // 2),
}


def frame_size(width: int, height: int, colorspace: str) -> int:
    """Bytes per frame: the Y plane plus two chroma planes."""
    if colorspace not in _CHROMA_DIMS:
        raise NotImplementedError(f"y4m: colorspace C{colorspace} not supported")
    return width * height + 2 * _CHROMA_DIMS[colorspace](width, height)


def encode_y4m(
    frames: list[bytes],
    width: int,
    height: int,
    colorspace: str = "mono",
    fps: str = "25:1",
) -> bytes:
    """Encode raw planar frames as a valid YUV4MPEG2 stream.
    Deterministic: same frames, same bytes. Each frame must be exactly
    ``frame_size(width, height, colorspace)`` bytes (Y plane then Cb
    then Cr, row-major)."""
    fsz = frame_size(width, height, colorspace)
    for i, fr in enumerate(frames):
        if len(fr) != fsz:
            raise ValueError(
                f"encode_y4m: frame {i} is {len(fr)} bytes, expected {fsz} "
                f"for {width}x{height} C{colorspace}"
            )
    head = (
        f"YUV4MPEG2 W{width} H{height} F{fps} Ip A1:1 C{colorspace}\n".encode("ascii")
    )
    return head + b"".join(b"FRAME\n" + fr for fr in frames)


def decode_y4m(data: bytes) -> tuple[int, int, str, list[bytes]]:
    """Decode a YUV4MPEG2 stream to (width, height, colorspace,
    frames) where each frame is the raw planar bytes. Validates the
    magic, parses tagged header parameters (unknown/X-extension tags
    skipped per spec), checks every FRAME marker, and raises on a
    truncated frame — silently mis-decoded video is worse than a loud
    failure."""
    nl = data.find(b"\n")
    if nl < 0 or data[:nl].split(b" ")[0] != MAGIC:
        raise ValueError("decode_y4m: bad magic — not a YUV4MPEG2 stream")
    try:
        header = data[:nl].decode("ascii")
    except UnicodeDecodeError as e:
        raise ValueError("decode_y4m: non-ASCII stream header") from e
    width = height = None
    colorspace = "420jpeg"  # the spec default when no C tag is present
    for tag in header.split(" ")[1:]:
        if not tag:
            continue
        if tag[0] in ("W", "H"):
            # validate here with codec context: a bare/garbled tag must
            # not surface as a naked int() ValueError, and a NEGATIVE
            # dimension would pass a truthiness check and turn every
            # frame into a misleading 'truncated frame' error
            if not tag[1:].isdigit() or int(tag[1:]) < 1:
                raise ValueError(
                    f"decode_y4m: bad {tag[0]} tag {tag!r} — dimensions "
                    "must be positive integers"
                )
            if tag[0] == "W":
                width = int(tag[1:])
            else:
                height = int(tag[1:])
        elif tag[0] == "C":
            colorspace = tag[1:]
        # F/I/A/X… parameters don't affect frame layout — skipped
    if not width or not height:
        raise ValueError("decode_y4m: missing W/H in stream header")
    fsz = frame_size(width, height, colorspace)
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"decode_y4m: bad FRAME marker at byte {pos}")
        # frame-level parameters (e.g. "FRAME Xtag\n") are legal; layout
        # is fixed by the stream header, so they're validated and skipped
        body = data[fnl + 1 : fnl + 1 + fsz]
        if len(body) != fsz:
            raise ValueError(
                f"decode_y4m: truncated frame {len(frames)} "
                f"({len(body)} of {fsz} bytes)"
            )
        frames.append(body)
        pos = fnl + 1 + fsz
    return width, height, colorspace, frames
