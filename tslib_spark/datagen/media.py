"""Deterministic synthetic media payloads (PPM images + PCM WAVs).

The shared *input definition* for the media_decode contract query and
its frozen oracle: both sides regenerate identical bytes from the seeded
RNG (like the parquet testdata both sides scan), then the oracle derives
the expected features with its own independent math — never by calling
the production decoders.
"""

from __future__ import annotations

import struct

import numpy as np


def media_pixels(media_id: int) -> np.ndarray:
    """The known RGB pixel array behind an even (image) media_id."""
    rng = np.random.default_rng(1000 + media_id)
    w, h = 16 + media_id % 5, 12 + media_id % 7
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def media_samples(media_id: int) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) behind an odd (audio) media_id."""
    rate = 8000
    n = int(rate * (0.2 + (media_id % 3) * 0.1))
    x = np.sin(np.arange(n) * (0.02 + 0.01 * (media_id % 5))) * 15000
    return rate, x.astype("<i2")


def synth_media_payloads(n: int) -> list[tuple[int, bytes]]:
    """n deterministic payloads: even ids → P6 PPM, odd ids → PCM WAV."""
    out = []
    for i in range(n):
        if i % 2 == 0:
            rgb = media_pixels(i)
            h, w = rgb.shape[:2]
            out.append((i, b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()))
        else:
            rate, x = media_samples(i)
            data = x.tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
            riff = (
                b"RIFF"
                + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )
            out.append((i, riff))
    return out
