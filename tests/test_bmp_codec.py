"""Third real codec drop-in: the dependency-free Windows BMP parser run
through the SAME mapInPandas kernels as the fakes and the netpbm/WAV
codecs — bottom-up rows, 4-byte row padding, 8-bpp palettes, and
concatenated-frame streams all parsed at the byte level."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from graphdatabases_spark.functions.bmp_codec import (
    BmpCodec,
    bmp_decode,
    bmp_encode,
)
from graphdatabases_spark.functions.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
)


def _gradient(h, w):
    return np.tile(((np.arange(w) * 255) // max(w - 1, 1)).astype(np.uint8), (h, 1))


class TestParser:
    def test_round_trip_bottom_up(self):
        """encode writes bottom-up rows (the BMP default); decode must
        hand back the original top-down array."""
        img = np.arange(24, dtype=np.uint8).reshape(4, 6)
        payload = bmp_encode(img)
        luma, end = bmp_decode(payload)
        assert end == len(payload)
        assert np.array_equal(luma, img)

    def test_row_padding_to_four_bytes(self):
        """w=3 at 24 bpp -> 9 data bytes padded to 12 per row; the pad
        must not leak into pixels."""
        img = _gradient(2, 3)
        payload = bmp_encode(img)
        row_len = (3 * 3 + 3) & ~3
        assert row_len == 12
        luma, _ = bmp_decode(payload)
        assert np.array_equal(luma, img)

    def test_8bpp_palette(self):
        """Hand-built 8-bpp BMP with a 2-entry palette: indices map
        through the palette's BGR luma."""
        w, h = 4, 2
        row_len = (w + 3) & ~3
        raster = bytes([0, 1, 0, 1]) + b"\x00" * (row_len - w)
        raster += bytes([1, 1, 0, 0]) + b"\x00" * (row_len - w)
        data_off = 14 + 40 + 8
        total = data_off + len(raster)
        payload = (
            b"BM"
            + struct.pack("<IHHI", total, 0, 0, data_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(raster), 0, 0, 2, 0)
            + bytes([0, 0, 0, 0])  # palette[0] = black
            + bytes([255, 255, 255, 0])  # palette[1] = white
            + raster
        )
        luma, _ = bmp_decode(payload)
        # raster rows are bottom-up: last raster row is image row 0
        assert luma.tolist() == [
            [255, 255, 0, 0],
            [0, 255, 0, 255],
        ]

    def test_rejects_non_bmp_and_truncation(self):
        with pytest.raises(ValueError, match="not a BMP"):
            bmp_decode(b"PNG\x00" + b"\x00" * 60)
        payload = bmp_encode(_gradient(4, 4))
        with pytest.raises(ValueError, match="truncated BMP"):
            bmp_decode(payload[:-5])
        # compressed BMPs are rejected, not mis-parsed
        bad = bytearray(bmp_encode(_gradient(2, 2)))
        bad[30:34] = struct.pack("<I", 1)  # BI_RLE8
        with pytest.raises(ValueError, match="uncompressed"):
            bmp_decode(bytes(bad))


class TestCodecContracts:
    def test_decode_matches_pnm_feature_recipe(self):
        """Same image through BMP and netpbm codecs must produce the
        SAME 8 features — codec-agnostic downstream consumers."""
        from graphdatabases_spark.functions.pnm_codec import PnmCodec, pnm_encode

        img = _gradient(6, 10)
        assert BmpCodec().decode(bmp_encode(img)) == pytest.approx(
            PnmCodec().decode(pnm_encode(img))
        )

    def test_resize_byte_contract(self):
        thumb = BmpCodec().resize(bmp_encode(_gradient(8, 8)), 4, 3)
        assert len(thumb) == 12

    def test_stream_frame_sampling(self):
        stream = b"".join(
            bmp_encode(np.full((2, 2), i, dtype=np.uint8)) for i in range(8)
        )
        frames = BmpCodec().sample_frames(stream, 4)
        assert [f[0] for f in frames] == [0, 2, 4, 6]


class TestSparkKernelsWithBmpCodec:
    @pytest.fixture(scope="class")
    def images_df(self, spark):
        rows = [
            (i, bytearray(bmp_encode(_gradient(4 + i, 8)))) for i in range(5)
        ]
        return spark.createDataFrame(rows, "doc_id bigint, payload binary")

    def test_extract_features_real(self, spark, images_df):
        got = extract_features(images_df, codec=BmpCodec()).orderBy("doc_id").collect()
        assert len(got) == 5
        exp = BmpCodec().decode(bmp_encode(_gradient(4, 8)))
        assert got[0]["features"] == pytest.approx(exp)

    def test_resize_images_real(self, spark, images_df):
        got = (
            resize_images(images_df, width=4, height=3, codec=BmpCodec())
            .orderBy("doc_id")
            .collect()
        )
        for r in got:
            assert len(bytes(r["thumb"])) == 12
        exp = BmpCodec().resize(bmp_encode(_gradient(4, 8)), 4, 3)
        assert bytes(got[0]["thumb"]) == exp

    def test_sample_frames_real_stream(self, spark):
        stream = b"".join(
            bmp_encode(np.full((2, 2), i, dtype=np.uint8)) for i in range(8)
        )
        df = spark.createDataFrame(
            [(1, bytearray(stream))], "doc_id bigint, payload binary"
        )
        got = (
            sample_frames(df, num_frames=4, codec=BmpCodec())
            .orderBy("frame_idx")
            .collect()
        )
        assert [bytes(r["frame"])[0] for r in got] == [0, 2, 4, 6]

    def test_codecs_share_plumbing(self, spark, images_df):
        real = extract_features(images_df, codec=BmpCodec())
        fake = extract_features(images_df, fake=True)
        assert real.schema == fake.schema
