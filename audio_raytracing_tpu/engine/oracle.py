"""Per-sample NumPy oracle of the full block renderer.

A faithful scalar port of the reference audio path (callback ->
buildAmbisonicReverb -> rotateAmbisonic -> ambisonicToStereo,
src/sound_system.zig:123-524) used as the golden model for
engine/voices.py. Implements this framework's documented spec: identical
to the reference except (a) per-voice-independent reverb (see
ops/reverb.py) and (b) negative doppler offsets clamped to 0 (see
ops/doppler.py). Tests only — deliberately slow and literal.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..ops.eq import EQ_A, EQ_B0, EQ_B1, EQ_BAND_SIGNS, EQ_FREQS
from ..ops.reverb import ReverbOracle
from ..utils import quat

SQRT3 = math.sqrt(3.0)


class OracleVoice:
    def __init__(self, samples, pos, gain=1.0, repeat=False):
        self.samples = np.asarray(samples, np.float32)
        self.pos = np.asarray(pos, np.float32)
        self.gain = float(gain)
        self.repeat = bool(repeat)
        self.cursor = 0
        self.finished = False
        self.prev_dist = None
        self.eq_z = np.zeros(4, np.float32)
        self.eq_gains = np.ones(4, np.float32)
        self.reverb = ReverbOracle()
        self.wet = 0.0
        self.occlusion = 0.0
        self.refl_dist = np.zeros(6, np.float32)
        self.refl_lam = np.zeros(6, np.float32)
        self.refl_dist_prev = [None] * 6

    def eq_apply(self, x):
        ys = EQ_B0 * np.float32(x) + self.eq_z
        self.eq_z = EQ_B1 * np.float32(x) - EQ_A * ys
        bands = ys - np.asarray([0.0, ys[2], ys[3], 0.0], np.float32)
        return float(np.sum(bands * EQ_BAND_SIGNS * self.eq_gains))


class OracleEngine:
    def __init__(self, cfg: Config = DEFAULT_CONFIG, hrtf_l=None, hrtf_r=None):
        self.cfg = cfg
        self.voices: list[OracleVoice] = []
        self.listener = np.zeros(3, np.float32)
        self.orientation = np.asarray([0, 0, 0, 1], np.float32)
        self.hrtf_l = hrtf_l if hrtf_l is not None else np.zeros((4, 128), np.float32)
        self.hrtf_r = hrtf_r if hrtf_r is not None else np.zeros((4, 128), np.float32)
        self.overlap = np.zeros((2 * cfg.block_size, 2), np.float32)

    # --- doppler fetches (zig:248-268, 355-372, 787-845) ---

    def _fetch_repeat(self, v, prev_d, d, frame_index, i, total_frames, headroom):
        n = self.cfg.block_size
        s = v.samples
        frac = (n * frame_index + i) / (n * total_frames)
        dist = prev_d + (d - prev_d) * frac
        foff = float(
            v.cursor + headroom * len(s) - self.cfg.sample_rate * dist / self.cfg.speed_of_sound
        )
        foff = max(foff, 0.0)
        ioff = int(foff)
        beta = foff - math.trunc(foff)
        a = s[(ioff + i) % len(s)]
        b = s[(ioff + i - 1) % len(s)]
        return a + beta * (b - a)

    def _fetch_oneshot(self, v, prev_d, d, frame_index, k, total_frames, end, refl):
        n = self.cfg.block_size
        s = v.samples
        frac = (n * frame_index + k) / (n * total_frames)
        dist = prev_d + (d - prev_d) * frac
        foff = float(v.cursor - self.cfg.sample_rate * dist / self.cfg.speed_of_sound)
        foff = max(foff, 0.0)
        ioff = int(foff)
        beta = foff - math.trunc(foff)
        nxt = s[ioff + k + 1] if ioff + k + 1 < end else 0.0
        cur = s[ioff + k] if ioff + k < end else 0.0
        t = beta if refl else (1.0 - beta)
        return nxt + t * (cur - nxt)

    def render_block(self, frame_index, total_frames):
        cfg = self.cfg
        n = cfg.block_size
        amb = np.zeros((4, n), np.float32)
        for v in self.voices:
            if v.finished:
                continue
            rel = v.pos - self.listener
            length = float(np.linalg.norm(rel))
            if length < 1e-6:
                norm = 0.0
            elif length < 0.1:
                norm = SQRT3 / 0.1
            else:
                norm = SQRT3 / length
            sh = np.asarray([1.0, norm * rel[0], norm * rel[1], norm * rel[2]], np.float32)
            dist = length
            if v.prev_dist is None:
                v.prev_dist = dist
            for b in range(6):
                if v.refl_dist_prev[b] is None:
                    v.refl_dist_prev[b] = v.refl_dist[b]

            v.eq_gains = np.clip(
                1.0 - cfg.air_absorption * dist * (v.occlusion + 1.0) * EQ_FREQS, 0.0, 1.0
            ).astype(np.float32)
            v.eq_gains = v.eq_gains / (dist + 1.0) / (v.occlusion + 1.0)

            reverb_input = np.zeros(n, np.float32)
            if v.repeat:
                rng = range(n)
                end = None
            else:
                begin = min(v.cursor, len(v.samples))
                end = min(v.cursor + n, len(v.samples))
                rng = range(end - begin)
            for k in rng:
                if v.repeat:
                    sample = self._fetch_repeat(
                        v, v.prev_dist, dist, frame_index, k, total_frames, 1
                    )
                else:
                    sample = self._fetch_oneshot(
                        v, v.prev_dist, dist, frame_index, k, total_frames, end, False
                    )
                reverb_input[k] = sample * v.gain / (dist + 2.0) / (v.occlusion + 2.0)
                e = v.eq_apply(sample)
                for j in range(4):
                    amb[j, k] += sh[j] * e * v.gain
                for b, (ch, sign) in enumerate(
                    [(1, 1), (1, -1), (2, 1), (2, -1), (3, 1), (3, -1)]
                ):
                    if v.repeat:
                        rs = self._fetch_repeat(
                            v, v.refl_dist_prev[b], v.refl_dist[b], frame_index, k, total_frames, 4
                        )
                    else:
                        rs = self._fetch_oneshot(
                            v, v.refl_dist_prev[b], v.refl_dist[b], frame_index, k, total_frames, end, True
                        )
                    rs = rs * v.gain * v.refl_lam[b] / (v.refl_dist[b] + 1.0)
                    amb[0, k] += rs
                    amb[ch, k] += sign * rs

            rv = v.reverb.apply(reverb_input)
            amb[0] += v.wet * rv

            v.cursor += n
            if not v.repeat and v.cursor >= len(v.samples) + cfg.finish_grace_samples:
                v.finished = True
            if frame_index + 1 == total_frames:
                v.prev_dist = dist
                for b in range(6):
                    v.refl_dist_prev[b] = v.refl_dist[b]

        # rotate (zig:480-492)
        xyz = amb[1:4].T
        amb[1:4] = quat.rotate(self.orientation[None, :], xyz).T

        # HRTF decode + overlap (zig:501-524, 142-160)
        for c in range(4):
            l = np.convolve(amb[c], self.hrtf_l[c])
            r = np.convolve(amb[c], self.hrtf_r[c])
            self.overlap[: len(l), 0] += l
            self.overlap[: len(r), 1] += r
        out = self.overlap[:n].copy()
        self.overlap[:n] = self.overlap[n:]
        self.overlap[n:] = 0.0
        return out

    def render(self, n_samples):
        n = self.cfg.block_size
        total_frames = n_samples // n + 1  # zig:140
        blocks = []
        remaining = n_samples
        fi = 0
        while remaining > 0:
            blocks.append(self.render_block(fi, total_frames))
            fi += 1
            remaining -= n
        for v in self.voices:
            pass  # finished sweep is a no-op here; voices list kept
        return np.concatenate(blocks, axis=0)
