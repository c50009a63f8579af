"""WAV I/O and format conversion.

The reference delegates this to SDL (SDL_LoadWAV + SDL_ConvertAudioSamples,
src/sound_system.zig:739-785): every loaded sound is converted to the
internal format float32 / mono / 44.1 kHz. We implement a minimal RIFF
reader (PCM u8/s16/s32 and IEEE float32), channel downmix by averaging, and
linear-interpolation resampling to the target rate, plus a float32-stereo
writer for the offline renderer.
"""

from __future__ import annotations

import struct

import numpy as np


def read_wav(path) -> tuple[np.ndarray, int]:
    """Return (samples[(n, channels)] float32 in [-1, 1], sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format tag is the first two
        # bytes of the SubFormat GUID at fmt-chunk offset 24
        if len(fmt_body) >= 26:
            (audio_format,) = struct.unpack_from("<H", fmt_body, 24)
        else:
            raise ValueError(f"{path}: truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
    if audio_format == 1:  # PCM
        if bits == 8:
            x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(raw, "<f4").astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported format tag {audio_format}")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), rate


def write_wav(path, samples: np.ndarray, sample_rate: int) -> None:
    """Write float32 samples (n,) or (n, channels) as IEEE-float WAV."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    raw = x.astype("<f4").tobytes()
    byte_rate = sample_rate * channels * 4
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(raw)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 3, channels, sample_rate, byte_rate, channels * 4, 32))
        f.write(b"data")
        f.write(struct.pack("<I", len(raw)))
        f.write(raw)


def to_mono(x: np.ndarray) -> np.ndarray:
    return x.mean(axis=1) if x.ndim == 2 else x


def resample_linear(x: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    if src_rate == dst_rate:
        return x.astype(np.float32)
    n_out = int(round(len(x) * dst_rate / src_rate))
    t = np.arange(n_out, dtype=np.float64) * (src_rate / dst_rate)
    i0 = np.minimum(t.astype(np.int64), len(x) - 1)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    frac = (t - i0).astype(np.float32)
    return (x[i0] * (1.0 - frac) + x[i1] * frac).astype(np.float32)


def load_sound(path, target_rate: int = 44100) -> np.ndarray:
    """Load any supported WAV as float32 mono at target_rate — the analogue
    of the reference's internal sound-effect format (sound_system.zig:11-15)."""
    x, rate = read_wav(path)
    return resample_linear(to_mono(x), rate, target_rate)
