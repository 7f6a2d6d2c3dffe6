"""Dependency-free RIFF/WAV PCM codec — the REAL pluggable AUDIO decoder.

``pnm_codec`` proved the multimodal kernels' codec interface with a
real image format; this module proves the AUDIO modality the same way:
a genuine RIFF/WAVE container parser (chunked layout, ``fmt `` +
``data`` chunks, 8-bit unsigned / 16-bit signed little-endian PCM,
multi-channel collapse to mono) with no external libraries.

The three kernel contracts map to audio semantics without changing the
Spark-side plumbing (schema, Arrow batching, UDF signatures — see
``multimodal.py``):

- ``decode``        → 8 summary features in [0, 1] (level, dynamics,
                      zero-crossing rate, spectral-flux proxy)
- ``resize(w, h)``  → fixed-size waveform thumbnail: the signal
                      nearest-neighbor-resampled to exactly ``w·h``
                      8-bit samples — the same byte-count contract the
                      image path promises
- ``sample_frames`` → ``num_frames`` evenly spaced fixed-length clips
                      (25 ms windows) as 8-bit byte strings
"""

from __future__ import annotations

import struct


def wav_encode(samples, sample_rate: int = 8000) -> bytes:
    """Encode a mono float array in [-1, 1] as 16-bit PCM WAV bytes."""
    import numpy as np

    arr = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (arr * 32767.0).round().astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm


def wav_decode(payload: bytes):
    """Parse a RIFF/WAVE PCM payload; returns (mono float64 array in
    [-1, 1], sample_rate). Walks the chunk list (a real container can
    interleave LIST/INFO chunks before ``data``), averages channels."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload: {payload[:12]!r}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        # A declared size larger than the remaining payload is a
        # malformed/truncated container, not a short read to tolerate:
        # silently truncating ``data`` would decode garbage-length
        # audio, and a short ``fmt `` would surface as struct.error
        # instead of this module's documented ValueError (ADVICE r5).
        if len(body) < size:
            raise ValueError(
                f"truncated {cid!r} chunk: declared {size} bytes, "
                f"{len(body)} available"
            )
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(
                    f"fmt chunk too short: {size} bytes (PCM needs 16)"
                )
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only 8/16-bit PCM supported, got fmt={fmt}")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return x, rate


def _to_u8(x) -> bytes:
    import numpy as np

    return (
        (np.clip(x, -1.0, 1.0) * 127.0).round().astype(np.int8).view(np.uint8)
    ).tobytes()


class WavCodec:
    """Drop-in codec for ``extract_features`` / ``resize_images`` /
    ``sample_frames`` — same output contracts as the deterministic
    fakes and the netpbm codec, real RIFF parsing underneath."""

    name = "wav"

    def decode(self, payload: bytes) -> list[float]:
        """8 features in [0,1]: mean |x|, RMS, peak, zero-crossing
        rate, p25/p75 of |x|, crest ratio (RMS/peak), spectral-flux
        proxy (mean |Δx| / 2)."""
        import numpy as np

        x, _ = wav_decode(payload)
        if len(x) == 0:
            return [0.0] * 8
        ax = np.abs(x)
        peak = float(ax.max())
        rms = float(np.sqrt((x * x).mean()))
        zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
        flux = float(np.abs(np.diff(x)).mean() / 2.0) if len(x) > 1 else 0.0
        return [
            float(ax.mean()),
            rms,
            peak,
            zcr,
            float(np.percentile(ax, 25)),
            float(np.percentile(ax, 75)),
            rms / peak if peak > 0 else 0.0,
            flux,
        ]

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        """Waveform thumbnail: nearest-neighbor resample to exactly
        ``width·height`` 8-bit samples (the image path's byte-count
        contract, so downstream size assertions hold per modality)."""
        import numpy as np

        x, _ = wav_decode(payload)
        need = width * height
        if len(x) == 0:
            return b"\x00" * need
        idx = (np.arange(need) * len(x)) // need
        return _to_u8(x[idx])

    def sample_frames(self, payload: bytes, num_frames: int) -> list[bytes]:
        """``num_frames`` evenly spaced 25 ms clips as 8-bit bytes;
        a short signal repeats clips (always exactly ``num_frames``
        entries — the bounded output contract)."""
        import numpy as np

        x, rate = wav_decode(payload)
        if len(x) == 0:
            raise ValueError("empty PCM stream")
        win = max(1, (rate * 25) // 1000)
        starts = [
            min((i * len(x)) // num_frames, max(0, len(x) - win))
            for i in range(num_frames)
        ]
        out = []
        for s in starts:
            clip = x[s : s + win]
            if len(clip) < win:  # pad the tail clip to the fixed window
                clip = np.pad(clip, (0, win - len(clip)))
            out.append(_to_u8(clip))
        return out
