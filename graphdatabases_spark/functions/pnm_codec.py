"""Dependency-free netpbm (PGM/PPM) codec — the REAL pluggable decoder.

``multimodal.py``'s kernels were designed so a real codec drops in for
the deterministic fakes without touching the Spark-side plumbing
(schema, Arrow batching, UDF signatures).  This module proves that
interface with an actual image format parsed from bytes, no external
libraries: netpbm P5 (binary grayscale) and P6 (binary RGB), the
simplest real container (magic, whitespace/comment-separated header,
raw raster).

"Video" here is a netpbm STREAM — concatenated P5/P6 images in one
payload, which is a real netpbm convention (e.g. ffmpeg's
``-f image2pipe -vcodec pnm``) — so frame sampling parses genuine
frame boundaries rather than hashing.

Contracts match the fakes so downstream schema/size assertions hold:
``decode`` → 8 floats, ``resize`` → exactly width·height luma bytes,
``sample_frames`` → ``num_frames`` byte strings.
"""

from __future__ import annotations


def _parse_header(payload: bytes, pos: int) -> tuple[bytes, int, int, int, int]:
    """Parse one PNM header starting at ``pos``; returns
    (magic, width, height, maxval, raster_start)."""
    magic = payload[pos : pos + 2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload at offset {pos}: {magic!r}")
    i = pos + 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments (to end of line)
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace byte after maxval, then raster
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm rasters not supported")
    return magic, width, height, maxval, i


def pnm_decode(payload: bytes, pos: int = 0):
    """Decode one image at ``pos``; returns (luma ndarray h×w, next_pos).

    P6 RGB collapses to luma via the integer BT.601 weights."""
    import numpy as np

    magic, w, h, maxval, start = _parse_header(payload, pos)
    channels = 3 if magic == b"P6" else 1
    n = w * h * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=start)
    if channels == 3:
        rgb = raster.reshape(h, w, 3).astype(np.uint32)
        luma = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
        luma = luma.astype(np.uint8)
    else:
        luma = raster.reshape(h, w)
    return luma, start + n


def pnm_encode(luma, rgb=None) -> bytes:
    """Encode a grayscale h×w array as P5 (or an h×w×3 array as P6)."""
    import numpy as np

    if rgb is not None:
        arr = np.asarray(rgb, dtype=np.uint8)
        h, w, _ = arr.shape
        return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()
    arr = np.asarray(luma, dtype=np.uint8)
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()


class PnmCodec:
    """Drop-in codec for ``extract_features`` / ``resize_images`` /
    ``sample_frames`` — same output contracts as the deterministic
    fakes, real parsing underneath."""

    name = "pnm"

    def decode(self, payload: bytes) -> list[float]:
        """8 features in [0,1]: mean, std, min, max, p25, p75,
        aspect (w/(w+h)), edge energy (mean |horizontal gradient|)."""
        import numpy as np

        luma, _ = pnm_decode(payload)
        f = luma.astype(np.float64) / 255.0
        h, w = f.shape
        grad = float(np.abs(np.diff(f, axis=1)).mean()) if w > 1 else 0.0
        return [
            float(f.mean()),
            float(f.std()),
            float(f.min()),
            float(f.max()),
            float(np.percentile(f, 25)),
            float(np.percentile(f, 75)),
            w / (w + h),
            grad,
        ]

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        """Nearest-neighbor luma thumbnail: exactly width·height bytes
        (same size contract as the fake / a real grayscale thumb)."""
        import numpy as np

        luma, _ = pnm_decode(payload)
        h, w = luma.shape
        rows = (np.arange(height) * h) // height
        cols = (np.arange(width) * w) // width
        return luma[np.ix_(rows, cols)].tobytes()

    def sample_frames(self, payload: bytes, num_frames: int) -> list[bytes]:
        """Evenly sample ``num_frames`` frames from a concatenated
        P5/P6 stream; each sampled frame returns as its luma raster
        bytes. Over-sampling a short stream repeats frames (bounded
        output contract: always exactly ``num_frames`` entries)."""
        frames: list[bytes] = []
        pos = 0
        while pos < len(payload):
            luma, pos = pnm_decode(payload, pos)
            frames.append(luma.tobytes())
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
        if not frames:
            raise ValueError("empty netpbm stream")
        idx = [(i * len(frames)) // num_frames for i in range(num_frames)]
        return [frames[i] for i in idx]
