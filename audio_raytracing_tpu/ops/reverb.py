"""Diffuser + FDN reverb, block-parallel for TPU.

Port of the reference Reverb (src/sound_system.zig:598-736; design credit:
signalsmith-audio.co.uk "Let's write a reverb"): 4 diffuser stages (per-
channel pure delays with fixed prime-ish lengths, channel shuffles,
polarity flips, unnormalized 4x4 Hadamard mix) followed by a 4-line FDN
feedback loop (delay read -> x feedback_gain -> one-pole lowpass alpha=0.2
-> Householder mix -> + input -> write back), feedforward tap, final x0.5.

TPU-first restructuring: the reference processes sample-by-sample. Here a
128-sample block is processed with almost no sequential work:
  * diffuser stages are pure delays -> block reads/writes on ring buffers
    (for delay D < block the tail of the output comes straight from the
    input, x[j-D]);
  * all four FDN delays (6427/2153/5153/2879, sound_system.zig:620) exceed
    the block size, so the whole block's delayed values can be read up
    front — within a block nothing read was written in the same block;
  * the only true recurrence is the one-pole lowpass state (length-4
    vector), run as a single lax.scan of 128 tiny steps.
The computation is numerically identical to the per-sample loop (same
operation order per sample), verified against the NumPy oracle in tests.

Divergence from the reference, deliberate: the reference accumulates every
voice's reverb into one shared scratch buffer that is re-halved by each
voice's apply() call (callback passes the same buf2 to all voices,
sound_system.zig:461-465 + 727-734), so voice N's wet mix leaks voices
0..N-1's reverb scaled by 0.5^(N-k). We compute each voice's reverb
independently (result = 0.5 * (feedforward + feedback_mix)) and mix
wet-weighted sums in the engine — identical for a single voice, and the
physically sensible reading of the multi-voice case.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# tables from sound_system.zig:602-632
DIFFUSER_DELAYS = np.asarray(
    [[383, 947, 1489, 3571], [31, 449, 937, 2671], [131, 179, 1619, 1879], [463, 593, 443, 887]],
    np.int32,
)  # [stage, channel]
DIFFUSER_SHUFFLES = np.asarray(
    [[3, 1, 0, 2], [0, 1, 3, 2], [0, 1, 3, 2], [2, 0, 3, 1]], np.int32
)
DIFFUSER_POLARITIES = np.asarray(
    [[-1, 1, 1, -1], [-1, -1, 1, 1], [1, -1, 1, -1], [-1, 1, 1, -1]], np.float32
)
FEEDBACK_DELAYS = np.asarray([6427, 2153, 5153, 2879], np.int32)
HADAMARD = np.asarray(
    [[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]], np.float32
)
HOUSEHOLDER = 0.5 * np.asarray(
    [[1, -1, -1, -1], [-1, 1, -1, -1], [-1, -1, 1, -1], [-1, -1, -1, 1]], np.float32
)
DIFF_BUF_LEN = 4096  # sound_system.zig:634
FB_BUF_LEN = 8192  # sound_system.zig:636
FB_LOWPASS_ALPHA = 0.2  # sound_system.zig:715
DEFAULT_FEEDBACK_GAIN = 0.9  # sound_system.zig:639


class ReverbState(NamedTuple):
    """Functional reverb state for V voices (the reference's ~98k floats per
    voice, sound_system.zig:634-639, as padded arrays)."""

    diff_buf: jnp.ndarray  # (V, 4 stages, 4 channels, DIFF_BUF_LEN)
    diff_cursor: jnp.ndarray  # (V, 4, 4) int32, wraps mod DIFFUSER_DELAYS
    fb_buf: jnp.ndarray  # (V, 4, FB_BUF_LEN)
    fb_cursor: jnp.ndarray  # (V, 4) int32, wraps mod FEEDBACK_DELAYS
    fb_filter: jnp.ndarray  # (V, 4) one-pole lowpass state


def reverb_init(n_voices: int) -> ReverbState:
    return ReverbState(
        diff_buf=jnp.zeros((n_voices, 4, 4, DIFF_BUF_LEN), jnp.float32),
        diff_cursor=jnp.zeros((n_voices, 4, 4), jnp.int32),
        fb_buf=jnp.zeros((n_voices, 4, FB_BUF_LEN), jnp.float32),
        fb_cursor=jnp.zeros((n_voices, 4), jnp.int32),
        fb_filter=jnp.zeros((n_voices, 4), jnp.float32),
    )


def _pure_delay_block(buf, cursor, x, delay: int, block: int):
    """One ring-buffer pure delay over a block (static delay).

    buf: (V, L) with ring length `delay` (L >= delay); cursor: (V,) int32;
    x: (V, block). Returns (out (V, block), new_buf, new_cursor).
    Matches the per-sample loop at sound_system.zig:660-666: out = value at
    cursor before x is stored there.
    """
    j = jnp.arange(block)
    idx = jnp.mod(cursor[:, None] + j[None, :], delay)  # (V, block)
    read = jnp.take_along_axis(buf, idx, axis=1)
    if delay >= block:
        out = read
        new_buf = jax.vmap(lambda b, i, v: b.at[i].set(v))(buf, idx, x)
    else:
        # tail of the block re-reads what the block itself wrote: x[j - delay]
        out = jnp.where(j[None, :] < delay, read, jnp.roll(x, delay, axis=1))
        # only the last `delay` writes survive
        keep = block - delay
        new_buf = jax.vmap(lambda b, i, v: b.at[i].set(v))(
            buf, idx[:, keep:], x[:, keep:]
        )
    new_cursor = jnp.mod(cursor + block, delay)
    return out, new_buf, new_cursor


def reverb_apply_block(x, state: ReverbState, feedback_gain,
                       damping_alpha=None):
    """Apply the reverb to a block for all voices.

    x: (V, N) input; feedback_gain: (V,). Returns (out (V, N), new state).

    damping_alpha: optional per-voice (V,) one-pole coefficient for the
    in-loop lowpass, replacing the reference's fixed alpha = 0.2
    (sound_system.zig:715). None keeps exact reference parity. Smaller
    alpha damps high bands faster per pass; engine/calibrate.py solves it
    from a traced IR's per-band T60 ratio (fdn_damping_for_band_t60s).
    """
    V, N = x.shape
    chunk = jnp.broadcast_to(x[:, None, :] * 0.25, (V, 4, N))  # split (zig:645-651)

    diff_buf = state.diff_buf
    diff_cur = state.diff_cursor
    new_bufs = []
    new_curs = []
    for stage in range(4):
        outs = []
        s_bufs = []
        s_curs = []
        for ch in range(4):
            o, nb, nc = _pure_delay_block(
                diff_buf[:, stage, ch],
                diff_cur[:, stage, ch],
                chunk[:, ch, :],
                int(DIFFUSER_DELAYS[stage, ch]),
                N,
            )
            outs.append(o)
            s_bufs.append(nb)
            s_curs.append(nc)
        chunk = jnp.stack(outs, axis=1)
        new_bufs.append(jnp.stack(s_bufs, axis=1))
        new_curs.append(jnp.stack(s_curs, axis=1))
        # shuffle + polarity (zig:668-679), then Hadamard across channels
        chunk = chunk[:, DIFFUSER_SHUFFLES[stage], :] * DIFFUSER_POLARITIES[stage][None, :, None]
        chunk = jnp.einsum("rc,vcn->vrn", jnp.asarray(HADAMARD), chunk, precision=jax.lax.Precision.HIGHEST)
    new_diff_buf = jnp.stack(new_bufs, axis=1)
    new_diff_cur = jnp.stack(new_curs, axis=1)

    feedforward = jnp.sum(chunk, axis=1)  # (V, N) (zig:695)

    # --- FDN feedback loop (zig:697-725) ---
    j = jnp.arange(N)
    reads = []
    idxs = []
    for ch in range(4):
        idx = jnp.mod(state.fb_cursor[:, ch : ch + 1] + j[None, :], int(FEEDBACK_DELAYS[ch]))
        idxs.append(idx)
        reads.append(jnp.take_along_axis(state.fb_buf[:, ch], idx, axis=1))
    r = jnp.stack(reads, axis=1)  # (V, 4, N) — all FDN delays > N, so safe

    # one-pole lowpass recurrence on (V, 4): f = a*(g*r) + (1-a)*f_prev
    a = (
        FB_LOWPASS_ALPHA if damping_alpha is None
        else jnp.asarray(damping_alpha)[:, None]
    )
    gr = r * feedback_gain[:, None, None]

    def lp_step(f, x_t):
        f = a * x_t + (1.0 - a) * f
        return f, f

    f_last, f_seq = jax.lax.scan(lp_step, state.fb_filter, jnp.moveaxis(gr, 2, 0))
    filt = jnp.moveaxis(f_seq, 0, 2)  # (V, 4, N)

    mixed = jnp.einsum("rc,vcn->vrn", jnp.asarray(HOUSEHOLDER), filt, precision=jax.lax.Precision.HIGHEST)
    writes = mixed + chunk  # future += current (zig:719)

    new_fb_buf = state.fb_buf
    new_fb_cur = []
    for ch in range(4):
        new_fb_buf = new_fb_buf.at[:, ch].set(
            jax.vmap(lambda b, i, v: b.at[i].set(v))(new_fb_buf[:, ch], idxs[ch], writes[:, ch])
        )
        new_fb_cur.append(jnp.mod(state.fb_cursor[:, ch] + N, int(FEEDBACK_DELAYS[ch])))

    out = 0.5 * (feedforward + jnp.sum(r, axis=1))  # mix (zig:727-734)
    new_state = ReverbState(
        diff_buf=new_diff_buf,
        diff_cursor=new_diff_cur,
        fb_buf=new_fb_buf,
        fb_cursor=jnp.stack(new_fb_cur, axis=1),
        fb_filter=f_last,
    )
    return out, new_state


# ---------------------------------------------------------------------------
# NumPy oracle: faithful per-sample port for differential tests.
# ---------------------------------------------------------------------------


class ReverbOracle:
    """Per-sample NumPy port of Reverb.apply (sound_system.zig:643-735),
    with the per-voice-independent output semantics documented above
    (result starts at zero; no cross-voice accumulation)."""

    def __init__(self, damping_alpha: float = FB_LOWPASS_ALPHA):
        self.diff_buf = np.zeros((4, 4, DIFF_BUF_LEN), np.float32)  # [ch][stage]
        self.diff_cur = np.zeros((4, 4), np.int64)  # [ch][stage]
        self.fb_buf = np.zeros((4, FB_BUF_LEN), np.float32)
        self.fb_cur = np.zeros(4, np.int64)
        self.fb_filter = np.zeros(4, np.float32)
        self.feedback_gain = DEFAULT_FEEDBACK_GAIN
        self.damping_alpha = damping_alpha

    def apply(self, samples: np.ndarray) -> np.ndarray:
        n = len(samples)
        result = np.zeros(n, np.float32)
        chunk = np.stack([samples] * 4).astype(np.float32) * 0.25
        for stage in range(4):
            delays = DIFFUSER_DELAYS[stage]
            for k in range(4):
                for jj in range(n):
                    s = chunk[k, jj]
                    cur = self.diff_cur[k, stage]
                    chunk[k, jj] = self.diff_buf[k, stage, cur]
                    self.diff_buf[k, stage, cur] = s
                    self.diff_cur[k, stage] = (cur + 1) % delays[k]
            shuf = DIFFUSER_SHUFFLES[stage]
            pol = DIFFUSER_POLARITIES[stage]
            chunk = chunk[shuf] * pol[:, None]
            chunk = (HADAMARD @ chunk).astype(np.float32)
        result += chunk.sum(axis=0)
        for jj in range(n):
            current = chunk[:, jj].copy()
            for i in range(4):
                chunk[i, jj] = self.fb_buf[i, self.fb_cur[i]]
            future = chunk[:, jj] * np.float32(self.feedback_gain)
            future = np.float32(self.damping_alpha) * future + np.float32(
                1.0 - self.damping_alpha
            ) * self.fb_filter
            self.fb_filter = future.copy()
            future = (HOUSEHOLDER @ future).astype(np.float32)
            future = future + current
            for i in range(4):
                self.fb_buf[i, self.fb_cur[i]] = future[i]
                self.fb_cur[i] = (self.fb_cur[i] + 1) % FEEDBACK_DELAYS[i]
        result += chunk.sum(axis=0)
        return result * np.float32(0.5)
