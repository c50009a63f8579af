"""Differentiable inverse acoustics — gradient-fit scene parameters
against a target impulse response THROUGH the ray tracer.

models/ir.py::trace_ir is a pure `lax.scan` over bounces whose arrival
amplitudes are smooth in the material absorptions (keep_amp products),
the air model, and the path geometry, and whose histogram scatter is a
`segment_sum` — i.e. the whole forward model is reverse-mode
differentiable by construction. This module packages that into a small
calibration API:

  * fit_materials — recover per-group, per-band surface absorption from
    a measured/target energy histogram (the classic "match the room's
    T30 per band" problem, solved directly in absorption space instead
    of via Sabine/Eyring hand-iteration).
  * fit_source_position — recover a source position from a target IR.
    Arrival TIMING only carries gradients once binning is softened:
    trace_ir(soft_bins=True) splits each arrival linearly between its
    two neighboring bins, making the histogram C0 in the path lengths.

TPU mapping: the ENTIRE optimization is one compiled dispatch — a
`lax.scan` over optimizer steps whose body is value_and_grad of the
tracer + an optax update. Nothing returns to the host until the loss
trace comes back, so the ~20 ms relay round trip (see
benchmarks/RESULTS.md) is paid once per fit, not once per step.

Capability extension: the reference (Zig/SDL, /root/reference) has no
inverse or autodiff surface at all — forward tracing only
(raytracer.zig, main.zig:670-780). Gradient identifiability notes live
on each fit function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import DEFAULT_CONFIG, Config
from .ir import fibonacci_sphere, trace_ir


class FitResult(NamedTuple):
    """params: fitted values in natural units (absorption in (0,1), or a
    position). losses: (n_steps,) loss trace (diagnose convergence /
    local minima). raw: final unconstrained parameters (resume a fit by
    passing them back as raw_init)."""

    params: object
    losses: object
    raw: object


def smooth_energy(energy, k: int):
    """Boxcar-smooth (n_bands, n_bins) histograms along bins (width k).

    Monte-Carlo histograms are sparse at practical ray counts; comparing
    them bin-for-bin makes the loss landscape a bed of nails. A k-bin
    boxcar (~k/bps samples of integration) trades temporal resolution
    for a smooth, low-variance target — same role as the schroeder
    backward integration in T30 fits, but local."""
    if k <= 1:
        return energy
    kern = jnp.ones((k,), jnp.float32) / float(k)
    return jax.vmap(lambda e: jnp.convolve(e, kern, mode="same"))(energy)


def log_energy_loss(
    energy,
    target,
    smooth: int = 8,
    eps: float | None = None,
    gain_invariant: bool = False,
):
    """Mean squared log-energy distance between two (n_bands, n_bins)
    histograms, boxcar-smoothed. Log domain: reverberant decay spans
    many orders of magnitude — a linear MSE would only see the direct
    sound; log-MSE weights every decade of the decay equally.

    eps floors both sides before the log. None (default) = 1e-3 x the
    target's mean bin energy: an ABSOLUTE floor like 1e-12 lets sparse
    histograms disagree by ~20 logs wherever one side is empty, which
    saturates the loss into plateaus a few bins of misalignment away
    (measured: a 0.2 m source offset already sat at ~95% of the far
    loss) — the relative floor keeps the basin wide and the gradients
    alive.

    gain_invariant=True normalizes BOTH histograms to unit total energy
    before comparing — the loss then ignores one overall scale on
    either side (a mic/DAC calibration constant) while keeping
    between-band ratios and decay slopes, which identify absorption.
    Use it against MEASURED targets (measured_ir_to_energy). "per_band"
    normalizes each band separately (unknown spectral tilt too) —
    measurably weaker identification: only within-band shape then
    constrains the low bands. (Subtracting the mean log-difference
    instead does NOT work: the eps-floored empty bins pin the offset,
    so the scale leaks back in — measured as the fit collapsing to
    absorption ~ 0 against a 13.7x-hot target.)"""
    a = smooth_energy(energy, smooth)
    b = smooth_energy(target, smooth)
    if gain_invariant == "per_band":
        a = a / jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), 1e-30)
        b = b / jnp.maximum(jnp.sum(b, axis=-1, keepdims=True), 1e-30)
    elif gain_invariant:
        a = a / jnp.maximum(jnp.sum(a), 1e-30)
        b = b / jnp.maximum(jnp.sum(b), 1e-30)
    if eps is None:
        eps = 1e-3 * jnp.mean(b)
    d = jnp.log(a + eps) - jnp.log(b + eps)
    return jnp.mean(d**2)


def measured_ir_to_energy(h, cfg: Config = DEFAULT_CONFIG):
    """Convert a measured time-domain impulse response into the tracer's
    (n_bands, n_bins) energy-histogram convention, so fit_materials can
    calibrate a scene against a real measurement.

    h: (N,) pressure IR at cfg.sample_rate. Band-split with the engine's
    own 4-band LR2 filterbank (ops/eq.py::eq_band_signals — the same
    crossover the renderer mixes through), squared per sample, and
    truncated/zero-padded to cfg.ir_n_bins. Requires
    cfg.ir_bins_per_sample == 1 (the default), where one histogram bin
    is exactly one sample of delay.

    A measurement's absolute scale is arbitrary (mic/preamp gain) and
    its spectral tilt partly equipment — fit with
    log_energy_loss(gain_invariant=True) (fit_materials passes it
    through) so only decay shapes and ratios drive the fit."""
    if cfg.ir_bins_per_sample != 1:
        raise ValueError(
            "measured_ir_to_energy maps one sample to one bin; "
            f"cfg.ir_bins_per_sample must be 1, got {cfg.ir_bins_per_sample}"
        )
    from ..ops.eq import eq_band_signals

    h = jnp.asarray(h, jnp.float32)
    bands, _ = eq_band_signals(h[None])  # (1, 4, N)
    e = bands[0] ** 2
    n_bins = cfg.ir_n_bins
    n = e.shape[1]
    if n >= n_bins:
        return e[:, :n_bins]
    return jnp.pad(e, ((0, 0), (0, n_bins - n)))


def run_fit(
    loss_fn,
    raw0,
    n_steps: int,
    optimizer=None,
    lr: float = 0.25,
    decay: bool = False,
    keep_best: bool = True,
):
    """adam-descend loss_fn from raw0 for n_steps inside one lax.scan.

    Returns (raw_best, losses). jit-wrapped: one device dispatch per
    call signature. loss_fn must be jax-traceable (it is re-traced, not
    called, per step).

    keep_best returns the lowest-loss iterate instead of the last —
    geometry fits have sharp basins (a direct-path bin is ~8 mm of
    travel at the default binning) that a constant adam step repeatedly
    overshoots; keeping the best pass-through beats trying to settle.
    Measured on the box-room source fit (tests/test_inverse.py):
    constant lr=0.03 + keep_best lands 1.7 mm from truth, while
    decay=True (cosine lr -> 0) anneals into a 0.26 m local minimum —
    the late exploration the constant step keeps doing is what finds
    the global basin. decay stays available for smooth landscapes."""
    opt = optimizer
    if opt is None:
        sched = optax.cosine_decay_schedule(lr, n_steps) if decay else lr
        opt = optax.adam(sched)

    @jax.jit
    def _run(raw0):
        def step(carry, _):
            raw, st, best_raw, best_loss = carry
            loss, g = jax.value_and_grad(loss_fn)(raw)
            better = loss < best_loss
            best_raw = jax.tree.map(
                lambda b, r: jnp.where(better, r, b), best_raw, raw
            )
            best_loss = jnp.where(better, loss, best_loss)
            up, st = opt.update(g, st, raw)
            return (optax.apply_updates(raw, up), st, best_raw, best_loss), loss

        carry0 = (raw0, opt.init(raw0), raw0, jnp.float32(jnp.inf))
        (raw, _, best_raw, _), losses = jax.lax.scan(
            step, carry0, None, length=n_steps
        )
        return (best_raw if keep_best else raw), losses

    return _run(raw0)


def _group_onehot(groups, n_groups: int):
    # (T, G) one-hot — group-absorption fetch as a matmul, not a gather
    # (TPU gathers serialize; this sits inside every grad step)
    return (
        groups[:, None] == jnp.arange(n_groups, dtype=groups.dtype)[None, :]
    ).astype(jnp.float32)


def fit_materials(
    scene_arrays,
    source,
    listener,
    target_energy,
    *,
    groups=None,
    n_groups: int | None = None,
    cfg: Config = DEFAULT_CONFIG,
    n_steps: int = 200,
    lr: float = 0.25,
    init: float = 0.5,
    smooth: int = 8,
    gain_invariant: bool = False,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    raw_init=None,
    loss_eps: float | None = None,
    **trace_kw,
) -> FitResult:
    """Fit per-band surface absorption to a target energy histogram.

    loss_eps: optional absolute floor for log_energy_loss. Against NOISY
    targets, set it to (a few times) the noise's mean bin energy: bins
    below the floor then stop contributing gradient, so the fit ignores
    the noise floor instead of lowering absorption to "explain" it —
    measured on the 6x3x5 box at 20 dB energy SNR, the highest band
    (true alpha 0.7, fastest-decaying tail) recovers 0.30 without the
    floor and ~0.65 with it (tests/test_inverse.py's noise envelope).

    target_energy: (n_bands, n_bins) — a traced IR's energy whose
    materials you want to recover, or a real measurement through
    measured_ir_to_energy (then set gain_invariant=True — see
    log_energy_loss). groups: optional (T_padded,) int32
    mapping each triangle to a material group (walls/floor/ceiling...);
    None fits one global material. n_groups is required with groups.

    Parameterization: absorption = sigmoid(raw), so the fit can never
    leave (0, 1) and adam steps act in logit space (multiplicative near
    the ends, where absorption perception is log-like too).

    Identifiability: each band's echo energy is strictly decreasing in
    every absorption it touches (keep_amp = sqrt(1-a) products), so a
    realizable target has a well-posed per-band solution as long as each
    group is actually hit by the ray set — an unhit group keeps its
    init (zero gradient). Bands are independent.

    trace_kw forwards to trace_ir (e.g. scattering_rng="hash" +
    material_scattering for diffuse rooms — keep rng_seed fixed so the
    target stays realizable under the same ray realization).
    """
    if groups is not None and n_groups is None:
        raise ValueError("groups requires n_groups")
    n_bands = scene_arrays.absorption.shape[1]
    g = 1 if groups is None else int(n_groups)
    if dirs is None:
        dirs = jnp.asarray(fibonacci_sphere(n_rays or cfg.rays_per_source))
    oh = None if groups is None else _group_onehot(jnp.asarray(groups), g)
    p0 = jnp.clip(jnp.float32(init), 1e-4, 1.0 - 1e-4)
    raw0 = (
        raw_init
        if raw_init is not None
        else jnp.full((g, n_bands), jnp.log(p0) - jnp.log1p(-p0), jnp.float32)
    )
    target = jnp.asarray(target_energy)

    def loss_fn(raw):
        a = jax.nn.sigmoid(raw)  # (G, n_bands)
        absorption = (
            jnp.broadcast_to(a[0], scene_arrays.absorption.shape)
            if oh is None
            else jnp.dot(oh, a, precision=jax.lax.Precision.HIGHEST)
        )
        ir = trace_ir(
            scene_arrays._replace(absorption=absorption),
            source,
            listener,
            cfg=cfg,
            max_bounces=max_bounces,
            dirs=dirs,
            **trace_kw,
        )
        return log_energy_loss(
            ir.energy, target, smooth=smooth, eps=loss_eps,
            gain_invariant=gain_invariant,
        )

    raw, losses = run_fit(loss_fn, raw0, n_steps, lr=lr)
    return FitResult(params=jax.nn.sigmoid(raw), losses=losses, raw=raw)


def fit_source_and_materials(
    scene_arrays,
    listener,
    target_energy,
    x0,
    *,
    groups=None,
    n_groups: int | None = None,
    cfg: Config = DEFAULT_CONFIG,
    stages: tuple = ((200, 32), (300, 8)),
    refine_steps: int = 150,
    lr_pos: float = 0.03,
    lr_mat: float = 0.25,
    init: float = 0.5,
    gain_invariant: bool = False,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    raw_init=None,
    **trace_kw,
) -> FitResult:
    """Jointly fit a source position AND per-group, per-band absorption
    to one target energy histogram (the full calibration problem: where
    is the source and what is the room made of — fit_source_position
    assumes known materials; this does not).

    The two parameter families get separate adams via
    optax.multi_transform (meters moving soft-binned arrival times vs
    logit-space absorption scaling decay slopes; lr_pos, lr_mat), and the
    schedule is staged — each measured necessary on the box-room probe
    (2026-08-18, 256 rays x 2 bounces, 0.28 m initial offset, true
    absorption 0.2/0.3/0.4/0.5 from init 0.5):

      1..k  joint stages over `stages` = ((steps, smooth), ...), smooth
            annealed coarse -> fine. One fine-only joint stage stalls
            0.26 m out (free absorption absorbs the level mismatch and
            flattens the timing gradient); coarse(32) -> fine(8) lands
            the position at 4.4 mm.
      k+1   materials-only refine at the pinned position (refine_steps,
            fit_materials, hard bins): at the fine smooth the best JOINT
            iterate trades low-band absorption against residual binning
            noise (drifts +0.13); re-fitting absorption alone recovers
            it to ~0.02. Skipped when refine_steps=0.

    Same basin caveat as fit_source_position: start x0 within a few tens
    of centimeters at the default binning. losses concatenates every
    stage's trace (loss scales differ across smooths — diagnostic only).

    Returns FitResult with params={"pos": (3,), "mat": (G, n_bands)}.
    """
    if groups is not None and n_groups is None:
        raise ValueError("groups requires n_groups")
    n_bands = scene_arrays.absorption.shape[1]
    g = 1 if groups is None else int(n_groups)
    if dirs is None:
        dirs = jnp.asarray(fibonacci_sphere(n_rays or cfg.rays_per_source))
    oh = None if groups is None else _group_onehot(jnp.asarray(groups), g)
    p0 = jnp.clip(jnp.float32(init), 1e-4, 1.0 - 1e-4)
    raw = (
        raw_init
        if raw_init is not None
        else {
            "pos": jnp.asarray(x0, jnp.float32),
            "mat": jnp.full(
                (g, n_bands), jnp.log(p0) - jnp.log1p(-p0), jnp.float32
            ),
        }
    )
    target = jnp.asarray(target_energy)

    def absorption_of(mat_raw):
        a = jax.nn.sigmoid(mat_raw)  # (G, n_bands)
        return (
            jnp.broadcast_to(a[0], scene_arrays.absorption.shape)
            if oh is None
            else jnp.dot(oh, a, precision=jax.lax.Precision.HIGHEST)
        )

    opt = optax.multi_transform(
        {"pos": optax.adam(lr_pos), "mat": optax.adam(lr_mat)},
        {"pos": "pos", "mat": "mat"},
    )
    all_losses = []
    for n_steps, smooth in stages:

        def loss_fn(raw, smooth=smooth):
            ir = trace_ir(
                scene_arrays._replace(absorption=absorption_of(raw["mat"])),
                raw["pos"],
                listener,
                cfg=cfg,
                max_bounces=max_bounces,
                dirs=dirs,
                soft_bins=True,
                **trace_kw,
            )
            return log_energy_loss(
                ir.energy, target, smooth=smooth,
                gain_invariant=gain_invariant,
            )

        raw, losses = run_fit(loss_fn, raw, n_steps, optimizer=opt)
        all_losses.append(losses)

    mat_raw = raw["mat"]
    if refine_steps:
        res = fit_materials(
            scene_arrays, raw["pos"], listener, target, groups=groups,
            n_groups=n_groups, cfg=cfg, n_steps=refine_steps, lr=lr_mat,
            smooth=stages[-1][1], gain_invariant=gain_invariant, dirs=dirs,
            max_bounces=max_bounces, raw_init=mat_raw, **trace_kw,
        )
        mat_raw = res.raw
        all_losses.append(res.losses)
    raw = {"pos": raw["pos"], "mat": mat_raw}
    return FitResult(
        params={"pos": raw["pos"], "mat": jax.nn.sigmoid(mat_raw)},
        losses=jnp.concatenate(all_losses),
        raw=raw,
    )


def fit_source_position(
    scene_arrays,
    listener,
    target_energy,
    x0,
    *,
    cfg: Config = DEFAULT_CONFIG,
    n_steps: int = 300,
    lr: float = 0.05,
    smooth: int = 16,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    **trace_kw,
) -> FitResult:
    """Fit a source position (3,) to a target energy histogram.

    Traces with soft_bins=True so arrival times carry gradients (hard
    binning has zero timing derivative almost everywhere); amplitude
    gradients (1/(d+1) spreading, air absorption, specular lobes) flow
    either way. NaN-safety of the geometry gradients is handled in
    ops/intersect.intersect_pairs (masked-lane finite reciprocal).

    The loss is only locally convex — echoes realign with the target
    within roughly a bin width per path (~1/bps samples of travel), so
    start x0 within a few tens of centimeters at the default binning,
    or anneal `smooth` down over restarts for larger basins. The direct
    term usually dominates and its basin is the whole room; losses in
    FitResult show whether the reflections locked in (staircase drops).
    """
    if dirs is None:
        dirs = jnp.asarray(fibonacci_sphere(n_rays or cfg.rays_per_source))
    target = jnp.asarray(target_energy)

    def loss_fn(pos):
        ir = trace_ir(
            scene_arrays,
            pos,
            listener,
            cfg=cfg,
            max_bounces=max_bounces,
            dirs=dirs,
            soft_bins=True,
            **trace_kw,
        )
        return log_energy_loss(ir.energy, target, smooth=smooth)

    raw, losses = run_fit(loss_fn, jnp.asarray(x0, jnp.float32), n_steps, lr=lr)
    return FitResult(params=raw, losses=losses, raw=raw)
