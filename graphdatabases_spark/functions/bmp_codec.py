"""Dependency-free Windows BMP codec — a THIRD real pluggable decoder.

``pnm_codec`` (image) and ``wav_codec`` (audio) prove the multimodal
kernels' codec interface with real containers; this module adds the
most widespread uncompressed raster format: BMP with the 40-byte
BITMAPINFOHEADER, 24-bit BGR or 8-bit paletted pixels, 4-byte-aligned
rows, and the format's signature bottom-up row order (positive height)
— all the details a byte-level parser must actually get right, none of
which the deterministic fakes exercise.

"Video" is a concatenated-BMP stream (each frame self-describes its
length via the file-header size field, so frame boundaries parse
exactly — the same convention the netpbm stream uses).

Contracts match the other codecs so downstream schema/size assertions
hold: ``decode`` → 8 floats in [0,1], ``resize`` → exactly
width·height luma bytes, ``sample_frames`` → ``num_frames`` byte
strings.
"""

from __future__ import annotations

import struct


def bmp_encode(luma_rows, width: int | None = None) -> bytes:
    """Encode a 2-D uint8 luma array as a 24-bit bottom-up BMP
    (each gray value replicated into BGR). Test/fixture helper."""
    import numpy as np

    arr = np.asarray(luma_rows, dtype=np.uint8)
    h, w = arr.shape
    row_len = (w * 3 + 3) & ~3
    raster = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for v in arr[r]:
            row += bytes([v, v, v])  # B G R
        row += b"\x00" * (row_len - len(row))
        raster += row
    header_size = 14 + 40
    total = header_size + len(raster)
    file_hdr = b"BM" + struct.pack("<IHHI", total, 0, 0, header_size)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + bytes(raster)


def bmp_decode(payload: bytes, pos: int = 0):
    """Decode one BMP at ``pos``; returns (luma ndarray h×w, next_pos).

    Supports BITMAPINFOHEADER (40-byte) uncompressed 24-bpp BGR and
    8-bpp paletted images, top-down (negative height) and the default
    bottom-up row order. RGB collapses to luma via the integer BT.601
    weights (same formula as the netpbm codec)."""
    import numpy as np

    if payload[pos : pos + 2] != b"BM":
        raise ValueError(f"not a BMP payload at offset {pos}: {payload[pos:pos+2]!r}")
    if len(payload) < pos + 54:
        raise ValueError("truncated BMP header")
    file_size, _, _, data_off = struct.unpack(
        "<IHHI", payload[pos + 2 : pos + 14]
    )
    if pos + file_size > len(payload):
        raise ValueError(
            f"truncated BMP: declared {file_size} bytes, "
            f"{len(payload) - pos} available"
        )
    (
        hdr_size,
        w,
        h_signed,
        planes,
        bpp,
        compression,
    ) = struct.unpack("<IiiHHI", payload[pos + 14 : pos + 34])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if compression != 0:
        raise ValueError(f"only uncompressed (BI_RGB) BMPs supported, got {compression}")
    if bpp not in (8, 24):
        raise ValueError(f"only 8/24-bpp BMPs supported, got {bpp}")
    if w <= 0 or h_signed == 0 or planes != 1:
        raise ValueError(f"malformed BMP dimensions w={w} h={h_signed} planes={planes}")
    bottom_up = h_signed > 0
    h = abs(h_signed)
    palette = None
    if bpp == 8:
        # Palette sits between the info header and the raster.
        n_colors = struct.unpack("<I", payload[pos + 46 : pos + 50])[0] or 256
        pal_start = pos + 14 + hdr_size
        pal = np.frombuffer(
            payload[pal_start : pal_start + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)
        # BGRX palette entries → luma lookup table.
        palette = (
            (77 * pal[:, 2].astype(np.uint32)
             + 150 * pal[:, 1].astype(np.uint32)
             + 29 * pal[:, 0].astype(np.uint32)) >> 8
        ).astype(np.uint8)
    bytes_pp = bpp // 8
    row_len = (w * bytes_pp + 3) & ~3
    raster = payload[pos + data_off : pos + data_off + row_len * h]
    if len(raster) < row_len * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_len)
    rows = rows[:, : w * bytes_pp]
    if bottom_up:
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows.reshape(h, w, 3).astype(np.uint32)
        luma = ((77 * bgr[:, :, 2] + 150 * bgr[:, :, 1] + 29 * bgr[:, :, 0]) >> 8).astype(
            np.uint8
        )
    else:
        luma = palette[rows]
    return luma, pos + max(file_size, data_off + row_len * h)


class BmpCodec:
    """Drop-in codec for ``extract_features`` / ``resize_images`` /
    ``sample_frames`` — same output contracts as the fakes and the
    netpbm codec, real BMP parsing underneath."""

    name = "bmp"

    def decode(self, payload: bytes) -> list[float]:
        """8 features in [0,1]: mean, std, min, max, p25, p75,
        aspect (w/(w+h)), edge energy — identical feature recipe to
        PnmCodec so downstream consumers are codec-agnostic."""
        import numpy as np

        luma, _ = bmp_decode(payload)
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
        import numpy as np

        luma, _ = bmp_decode(payload)
        h, w = luma.shape
        rows = (np.arange(height) * h) // height
        cols = (np.arange(width) * w) // width
        return luma[np.ix_(rows, cols)].tobytes()

    def sample_frames(self, payload: bytes, num_frames: int) -> list[bytes]:
        frames: list[bytes] = []
        pos = 0
        while pos < len(payload):
            luma, pos = bmp_decode(payload, pos)
            frames.append(luma.tobytes())
        if not frames:
            raise ValueError("empty BMP stream")
        idx = [(i * len(frames)) // num_frames for i in range(num_frames)]
        return [frames[i] for i in idx]
