"""RIFF/WAV PCM codec: real byte-level parsing + the drop-in proof for
the AUDIO modality through the unchanged multimodal Spark kernels
(mirrors tests/test_pnm_codec.py for images)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from graphdatabases_spark.functions.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
)
from graphdatabases_spark.functions.wav_codec import (
    WavCodec,
    wav_decode,
    wav_encode,
)


def _sine(n=800, rate=8000, freq=440, amp=0.5):
    t = np.arange(n) / rate
    return amp * np.sin(2 * np.pi * freq * t)


class TestWavParsing:
    def test_16bit_round_trip(self):
        x = _sine()
        got, rate = wav_decode(wav_encode(x, 8000))
        assert rate == 8000
        assert np.abs(got - x).max() < 1 / 32000  # one quantization step

    def test_stereo_collapses_to_mono(self):
        # hand-build a 2-channel 16-bit payload: L = 0.5, R = -0.5
        frames = 100
        pcm = struct.pack("<2h", 16384, -16384) * frames
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        payload = hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
        x, _ = wav_decode(payload)
        assert len(x) == frames
        assert np.abs(x).max() < 1e-4  # channels average to ~0

    def test_8bit_unsigned(self):
        pcm = bytes([128, 255, 0, 128])  # 0, +max, -max, 0
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        payload = hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
        x, _ = wav_decode(payload)
        assert x[0] == 0.0 and x[3] == 0.0
        assert x[1] > 0.99 and x[2] == -1.0

    def test_skips_interleaved_list_chunk(self):
        base = wav_encode(_sine(200))
        # splice a LIST/INFO chunk between fmt and data
        fmt_end = 12 + 8 + 16
        info = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = base[:fmt_end] + info + base[fmt_end:]
        x, rate = wav_decode(spliced)
        assert rate == 8000 and len(x) == 200

    def test_rejects_non_riff(self):
        with pytest.raises(ValueError, match="RIFF"):
            wav_decode(b"OggS" + b"\x00" * 40)

    def test_rejects_truncated_fmt_chunk(self):
        """A short fmt body must raise the documented ValueError, not
        struct.error (ADVICE r5)."""
        hdr = b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        short_fmt = b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
        with pytest.raises(ValueError, match="fmt chunk too short"):
            wav_decode(hdr + short_fmt)

    def test_rejects_data_chunk_overrunning_payload(self):
        """A data chunk declaring more bytes than remain must raise,
        not silently decode a truncated signal (ADVICE r5)."""
        base = wav_encode(_sine(200))
        with pytest.raises(ValueError, match="truncated b'data'"):
            wav_decode(base[:-10])


class TestWavCodecContracts:
    def test_decode_features_shape_and_values(self):
        f = WavCodec().decode(wav_encode(_sine(amp=0.5)))
        assert len(f) == 8
        assert all(0.0 <= v <= 1.0 for v in f)
        assert f[2] == pytest.approx(0.5, abs=1e-3)  # peak = amp
        assert f[1] == pytest.approx(0.5 / np.sqrt(2), abs=1e-2)  # sine RMS
        assert f[3] > 0.05  # 440 Hz crosses zero often

    def test_resize_byte_count_contract(self):
        thumb = WavCodec().resize(wav_encode(_sine()), 6, 4)
        assert len(thumb) == 24

    def test_sample_frames_bounded_output(self):
        clips = WavCodec().sample_frames(wav_encode(_sine(4000)), 5)
        win = (8000 * 25) // 1000
        assert len(clips) == 5
        assert all(len(c) == win for c in clips)


class TestSparkKernelsWithRealAudioCodec:
    @pytest.fixture(scope="class")
    def audio_df(self, spark):
        rows = [
            (i, bytearray(wav_encode(_sine(freq=220 * (i + 1), amp=0.2 * (i + 1)))))
            for i in range(4)
        ]
        return spark.createDataFrame(rows, "doc_id bigint, payload binary")

    def test_extract_features_real(self, spark, audio_df):
        got = extract_features(audio_df, codec=WavCodec()).orderBy("doc_id").collect()
        assert len(got) == 4
        peaks = [r["features"][2] for r in got]
        assert peaks == pytest.approx([0.2, 0.4, 0.6, 0.8], abs=1e-3)
        exp = WavCodec().decode(wav_encode(_sine(freq=220, amp=0.2)))
        assert got[0]["features"] == pytest.approx(exp)

    def test_resize_images_real(self, spark, audio_df):
        got = (
            resize_images(audio_df, width=5, height=2, codec=WavCodec())
            .orderBy("doc_id")
            .collect()
        )
        for r in got:
            assert len(bytes(r["thumb"])) == 10

    def test_sample_frames_real(self, spark, audio_df):
        df = audio_df.filter("doc_id = 0")
        got = (
            sample_frames(df, num_frames=3, codec=WavCodec())
            .orderBy("frame_idx")
            .collect()
        )
        assert [r["frame_idx"] for r in got] == [0, 1, 2]
        win = (8000 * 25) // 1000
        assert all(len(bytes(r["frame"])) == win for r in got)

    def test_fake_and_real_share_plumbing(self, spark, audio_df):
        """Identical schema/plan for the fake, the image codec, and the
        audio codec — the drop-in interface is modality-agnostic."""
        real = extract_features(audio_df, codec=WavCodec())
        fake = extract_features(audio_df, fake=True)
        assert real.schema == fake.schema
        assert real.count() == fake.count() == 4
