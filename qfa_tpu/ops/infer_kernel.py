"""Fused Pallas inference: the full prediction stack in ONE kernel launch.

Per spectrum the predict path (``/root/reference/QFA/model.py:160-180``)
needs the marginal NLL (OOD score), the posterior latents ``hmean = K^-1
w`` / ``hcov = K^-1``, the unabsorbed continuum ``F hmean + mu`` and its
uncertainty ``sqrt(diag(F hcov F^T))``. The XLA scan path
(``infer.predict_resident``) is correct but dispatches ~10 kernels per
batch — and on the target device every launch costs ~0.6 ms, which caps
it near 150k spectra/s. This kernel runs the whole dataset in one launch:

* residual assembly ``delta = (flux - mu A) mask`` (prediction-path
  Ly-alpha-only absorption), noise diagonal, masked precision — VPU;
* the same ``[Gram | F | ones]`` row-major contraction as the training
  kernels: one MXU pass for all capacitances/projections per tile;
* unrolled Cholesky + solves for ``hmean``, ``K^-1`` and the NLL;
* two more MXU dots close the loop: ``cont = hmean @ F + mu`` against the
  F rows, and — because ``diag(F K^-1 F^T)[p] = sum_ij K^-1[ij] G[p,ij]``
  — the predictive variance against the Gram rows.

Outputs: per-tile continuum and uncertainty planes plus a per-spectrum
stats row packing ``[ll, n_obs, hmean, hcov]``.

Verified against ``models.qfa.predict`` (itself golden-file- and
cross-implementation-verified) in tests/test_infer_kernel.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import QFAParams
from .epoch_kernel import (
    _chol_t,
    _kinv_column,
    _solve_lower_t,
    _solve_upper_t,
    _tri_idx,
    _tri_pairs,
)
from .fused_step import _round_up, tau_law_abc

Array = jnp.ndarray

LOG_2PI = 1.8378770664093453

#: stats layout (ROW indices within the lane-major (rows, N) stats
#: output): [ll, n_obs, hmean (nh), hcov (nh*nh)] packed contiguously
STAT_LL, STAT_NOBS, STAT_H0 = 0, 1, 2

__all__ = ["FusedPredictOutputs", "fused_predict", "default_tile_batch"]


def default_tile_batch(npix: int) -> int:
    """Npix-aware VMEM-safe tile for the fused prediction kernel.

    256 rows fit comfortably at SDSS width; DESI-scale grids (npix > 4000
    -> P ~ 9.3k lanes) stream ~6 double-buffered (TB, P) planes: measured
    on the v5e, 128-row tiles compile and run ~12% faster than 64 while
    256 fails to compile (the training kernel takes 128 at DESI width too
    since the accumulation-dot split — ``train.pallas_engine.
    pick_tile_batch``).
    Tiles below 128 cannot lower at all off interpret mode — the
    lane-major stats output needs a 128-multiple minor block dim
    (``ops.validate.validate_predict_kernel``, found by the bench.py
    --smoke lowering check) — so 128 is also the floor for wider grids.
    128 was only *measured* up to DESI width (~9.3k lanes); grids beyond
    that run on the same 128 floor with no narrower fallback available,
    so ``bench.py --smoke`` includes an ultra-wide (~13k-lane) lowering
    check to prove the assumption against the real toolchain. Used
    whenever the caller does not pass an explicit ``tile_batch``.
    """
    return 128 if npix > 4000 else 256


class FusedPredictOutputs(NamedTuple):
    ll: Array  #: (N,) per-spectrum NLL (OOD score).
    hmean: Array  #: (N, Nh) posterior latent means.
    hcov: Array  #: (N, Nh, Nh) posterior covariances.
    continuum: Array  #: (N, Npix) predicted unabsorbed continuum.
    continuum_std: Array  #: (N, Npix) predictive uncertainty.
    n_obs: Array  #: (N,) observed-pixel counts.


def _predict_kernel(
    hyper_ref,  # SMEM (1, 8): law_a, law_b, law_c, tau0, c0, beta
    flux_ref,  # (TB, P)
    error_ref,  # (TB, P); masked pixels carry error == 0 unless mask given
    zabs_ref,  # (TB, P), or the (TB, 128k) zq column when derive_zabs
    *rest,  # [mask_ref], mu_ref (1,P), rows_ref (4,P), rhst_ref (RC,P),
    # outputs: [cont_ref (TB,P), std_ref (TB,P) unless stats_only],
    #          stats_ref (RS, TB) lane-major stats rows
    nh: int,
    tb: int,
    derive_mask: bool,
    derive_zabs: bool,
    stats_only: bool,
    pb: int,  #: blue-padded lane count (round_up(nb, 128), <= p_lanes)
    p_lanes: int,  #: full padded pixel width P
):
    mask_ref = None
    if not derive_mask:
        mask_ref, *rest = rest
    mu_ref, rows_ref, rhst_ref, *rest = rest
    if stats_only:
        cont_ref = std_ref = None
        (stats_ref,) = rest
    else:
        cont_ref, std_ref, stats_ref = rest
    f32 = jnp.float32
    ntri = nh * (nh + 1) // 2  # lower-triangle Gram rows (symmetric)
    ones_row = ntri + nh

    law_a = hyper_ref[0, 0]
    law_b = hyper_ref[0, 1]
    law_c = hyper_ref[0, 2]
    tau0 = hyper_ref[0, 3]
    c0 = hyper_ref[0, 4]
    beta = hyper_ref[0, 5]

    # flux/error may stream as bfloat16 (survey-scale OOD sweeps); all
    # arithmetic stays f32
    flux = flux_ref[...].astype(f32)
    err = error_ref[...].astype(f32)
    m = (err > 0.0).astype(f32) if derive_mask else mask_ref[...].astype(f32)
    mu = mu_ref[...]  # (1, P)
    psi = rows_ref[0:1, :]
    omega_row = rows_ref[1:2, :]
    blue = rows_ref[2:3, :]

    # Blue-restricted absorption chain (see ops.epoch_kernel): the tau
    # elementwise work + its exps run on the first pb = round_up(nb, 128)
    # lanes only; red lanes have amp = 1, zdep = 0. pb == 0 (red-only
    # grid) falls back to the unrestricted path (zero-width slices would
    # not lower).
    split = 0 < pb < p_lanes
    blue_b = blue[:, :pb] if split else blue
    if derive_zabs:
        # zabs_ref carries only the (TB, lanes) zq column (lane 0 =
        # log1p(zqso)); rows_ref row 3 is the static log(lam/lam_lya)
        # row — log(1+zabs) is an outer add, no per-pixel pow/log
        zq = zabs_ref[:, 0:1]  # (TB, 1)
        loglam_b = rows_ref[3:4, :pb] if split else rows_ref[3:4, :]
        logzp1 = (zq + loglam_b) * blue_b  # (TB, PB)
        tau_line = law_a * jnp.exp(law_b * logzp1) + law_c
        zp1b = jnp.exp(beta * logzp1)
    else:
        zfull = zabs_ref[...].astype(f32)
        zp1 = 1.0 + (zfull[:, :pb] if split else zfull)
        tau_line = law_a * zp1**law_b + law_c
        zp1b = zp1**beta
    amp_b = jnp.where(blue_b > 0, jnp.exp(-tau_line), 1.0)  # (TB, PB)
    tau_hi = tau0 * zp1b
    root = 1.0 - c0 - jnp.exp(-tau_hi)
    zdep_b = jnp.where(blue_b > 0, root * root, 0.0)
    if split:
        # red side: amp = 1, zdep = 0. Red bases are computed FULL width
        # and sliced — Mosaic cannot broadcast a (1, X) row slice at a
        # nonzero lane offset (mu[:, pb:] / psi[:, pb:]), while offset-0
        # broadcasts and (TB, X) offset slices lower fine.
        base_delta = (flux - mu) * m
        base_d = psi + err * err
        err_b = err[:, :pb]
        delta = jnp.concatenate(
            [
                (flux[:, :pb] - mu[:, :pb] * amp_b) * m[:, :pb],
                base_delta[:, pb:],
            ],
            axis=1,
        )
        d_b = (
            amp_b * amp_b * psi[:, :pb]
            + omega_row[:, :pb] * zdep_b
            + err_b * err_b
        )
        d = jnp.concatenate([d_b, base_d[:, pb:]], axis=1)
        d_safe = jnp.where(m > 0, d, 1.0)
        dinv = m / d_safe
        dinv_b, dinv_r = dinv[:, :pb], dinv[:, pb:]
        w_row = jnp.concatenate([amp_b * amp_b * dinv_b, dinv_r], axis=1)
        u_row = jnp.concatenate(
            [amp_b * dinv_b * delta[:, :pb], dinv_r * delta[:, pb:]], axis=1
        )
    else:
        delta = (flux - mu * amp_b) * m
        d = amp_b * amp_b * psi + omega_row * zdep_b + err * err
        d_safe = jnp.where(m > 0, d, 1.0)
        dinv = m / d_safe
        w_row = amp_b * amp_b * dinv
        u_row = amp_b * dinv * delta
    # quad and logdet enter the NLL only as a SUM — one folded plane
    # halves their lane reductions (a (1, P) ones-dot costs a full MXU
    # block-pass regardless of its single output row; cf. epoch_kernel)
    ql_row = delta * delta * dinv + m * jnp.log(d_safe)

    # lane-major small-matrix work (spectra on lanes; each MXU output is
    # lane-offset-0 so the per-spectrum math never mixes offsets)
    hp = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=f32)

    def dot_lanes(rows, x):
        return jax.lax.dot_general(rows, x, (((1,), (1,)), ((), ())), **hp)

    k_t = dot_lanes(rhst_ref[0:ntri, :], w_row)  # (ntri, TB)
    w_t = dot_lanes(rhst_ref[ntri : ntri + nh, :], u_row)  # (nh, TB)
    ones_r = rhst_ref[ones_row : ones_row + 1, :]
    sum_ql = dot_lanes(ones_r, ql_row)  # (1, TB) quad + logdet_d
    n_obs = dot_lanes(ones_r, m)

    # triangle -> flat (a*nh+b) list; the Cholesky reads the lower half only
    k_cols = [
        k_t[_tri_idx(a, b) : _tri_idx(a, b) + 1, :]
        for a in range(nh)
        for b in range(nh)
    ]
    for a in range(nh):
        k_cols[a * nh + a] = k_cols[a * nh + a] + 1.0
    w_cols = [w_t[a : a + 1, :] for a in range(nh)]
    chol = _chol_t(k_cols, nh)
    y = _solve_lower_t(chol, w_cols, nh)
    alpha = _solve_upper_t(chol, y, nh)  # hmean rows (1, TB)
    logdet_k = 2.0 * sum(jnp.log(chol[a][a]) for a in range(nh))
    ll = 0.5 * (
        sum_ql - sum(yi * yi for yi in y) + n_obs * LOG_2PI + logdet_k
    )  # (1, TB)

    # K^-1 rows (posterior covariance), lane-major; full set feeds the
    # stats output, a pre-doubled lower triangle feeds the symmetric
    # variance contraction diag(F K^-1 F^T) = sum_tri w K^-1[ab] G[ab]
    kinv_rows = [None] * (nh * nh)
    for b in range(nh):
        mj = _kinv_column(chol, b, nh)
        for a in range(nh):
            kinv_rows[a * nh + b] = mj[a]
    kinv_t = jnp.concatenate(kinv_rows, axis=0)  # (nh*nh, TB)
    alpha_t = jnp.concatenate(alpha, axis=0)  # (nh, TB)

    if not stats_only:
        cont = (
            jax.lax.dot_general(
                alpha_t, rhst_ref[ntri : ntri + nh, :],
                (((0,), (0,)), ((), ())), **hp,
            )
            + mu
        )
        kinv_tri = jnp.concatenate(
            [
                (1.0 if a == b else 2.0) * kinv_rows[a * nh + b]
                for (a, b) in _tri_pairs(nh)
            ],
            axis=0,
        )  # (ntri, TB)
        var = jax.lax.dot_general(
            kinv_tri, rhst_ref[0:ntri, :], (((0,), (0,)), ((), ())), **hp
        )
        # the continuum/std planes are the kernel's dominant output
        # traffic (2 Npix floats/spectrum); out_dtype=bfloat16 halves
        # their HBM footprint (measured speed-NEUTRAL at 65k — the
        # f32->bf16 store relayout offsets the halved bytes, like the
        # bf16 input planes)
        cont_ref[...] = cont.astype(cont_ref.dtype)
        std_ref[...] = jnp.sqrt(jnp.maximum(var, 0.0)).astype(std_ref.dtype)

    # pack per-spectrum stats [ll, n_obs, hmean, hcov] LANE-MAJOR (rows x
    # spectra) — everything above already lives in that layout, so the
    # write is one aligned block. The old (TB, 128) row-major stats output
    # needed a per-tile (n_stat, TB) -> (TB, n_stat) Mosaic transpose that
    # dominated the whole kernel (measured ~3-4x the kernel's DMA+compute
    # model); the host-side wrapper now slices rows instead.
    n_stat = 2 + nh + nh * nh
    pad_rows = stats_ref.shape[0] - n_stat
    stats_ref[...] = jnp.concatenate(
        [ll, n_obs, alpha_t, kinv_t, jnp.zeros((pad_rows, tb), f32)], axis=0
    )  # (n_stat+pad, TB)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tau_which", "tile_batch", "interpret", "stats_only", "derive_zabs",
        "out_dtype",
    ),
)
def fused_predict(
    params: QFAParams,
    mu: Array,
    flux: Array,
    error: Array,
    zabs: Array,
    mask: Array | None = None,
    *,
    tau_which: str = "becker",
    tile_batch: int | None = None,
    interpret: bool = False,
    stats_only: bool = False,
    loglam: Array | None = None,
    derive_zabs: bool = False,
    out_dtype=jnp.float32,
) -> FusedPredictOutputs:
    """Predict continua/posteriors/OOD scores for a resident dataset in one
    kernel launch.

    ``N`` must be a multiple of ``tile_batch`` (pad with zero rows — they
    come back as inert all-masked outputs); ``tile_batch=None`` picks the
    npix-aware VMEM-safe default (:func:`default_tile_batch` — 128 at
    DESI width). ``mask=None`` derives the mask from ``error > 0`` (the
    data layer sanitizes masked pixels to 0).
    ``derive_zabs=True`` takes the ``(N, 128)`` :func:`~qfa_tpu.ops.zq_column`
    buffer in place of the ``(N, Npix)`` zabs plane (plus ``loglam`` =
    :func:`~qfa_tpu.ops.loglam_row`), rebuilding absorber redshifts
    in-kernel.

    ``stats_only=True`` skips the two (N, Npix) continuum/uncertainty
    planes and returns only the per-spectrum stats (ll, posterior,
    n_obs) — the survey-scale OOD sweep: output traffic drops from
    ~2 Npix floats to ~80 per spectrum (``continuum``/``continuum_std``
    come back as None).

    ``out_dtype=jnp.bfloat16`` stores the continuum/uncertainty planes
    as bfloat16 (in-kernel cast; all arithmetic and the per-spectrum
    stats stay f32 — ll/posteriors are bitwise-unchanged). Halves the
    output planes' HBM footprint — a 786k-spectrum full-output sweep
    drops from ~12 GB to ~6 GB of result planes — at ~0.4% relative
    output precision; measured speed-neutral (the f32->bf16 store
    relayout offsets the halved write bytes). For catalog production,
    not golden-parity work.
    """
    npix, nh = params.F.shape
    nb = params.omega.shape[0]
    if nh * nh + nh + 2 > 128:
        raise ValueError("stats-row layout supports nh*nh+nh+2 <= 128")
    n = flux.shape[0]
    tb = tile_batch if tile_batch is not None else default_tile_batch(npix)
    if n % tb:
        raise ValueError(f"N={n} not divisible by tile_batch={tb}")
    p = _round_up(npix, 128)
    rc = _round_up(nh * (nh + 1) // 2 + nh + 1, 8)
    f32 = jnp.float32
    from .validate import validate_predict_kernel

    validate_predict_kernel(
        tile_batch=tb, p_lanes=p, n_rows=n, interpret=interpret
    )

    def pad_px(x, width=None):
        width = p if width is None else width
        dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else f32
        if x.shape[-1] == width and x.dtype == dt:
            return x
        return jnp.pad(
            x.astype(dt), [(0, 0)] * (x.ndim - 1) + [(0, width - x.shape[-1])]
        )

    flux_p = pad_px(flux)
    error_p = pad_px(error)
    if derive_zabs:
        from .epoch_kernel import _validate_zq

        _validate_zq(zabs, loglam, n)
        zabs_p = zabs.astype(f32)
    else:
        if zabs.shape[-1] not in (nb, npix, p):
            raise ValueError(
                f"zabs plane width {zabs.shape[-1]} matches neither Nb="
                f"{nb} nor Npix={npix}; if this is a zq_column buffer, "
                "pass derive_zabs=True (and loglam)"
            )
        zabs_p = pad_px(zabs)
    mask_p = pad_px(mask) if mask is not None else None

    def row(x, width=None):
        width = npix if width is None else width
        return jnp.zeros((p,), f32).at[:width].set(x.astype(f32))

    rows = jnp.stack([
        row(params.Psi),
        row(params.omega, nb),
        row(jnp.ones((nb,), f32), nb),
        jnp.zeros((p,), f32) if not derive_zabs else row(loglam),
    ])
    mu_row = row(mu)[None, :]
    # [tri(gram) | F | ones] rows, built once outside the kernel
    # (read-only here; only the symmetric Gram's lower triangle is stored)
    f_p = jnp.pad(params.F.astype(f32), ((0, p - npix), (0, 0)))
    ntri = nh * (nh + 1) // 2
    gram_t = jnp.stack(
        [f_p.T[a] * f_p.T[b] for (a, b) in _tri_pairs(nh)]
    )  # (ntri, p)
    rhst = jnp.concatenate(
        [gram_t, f_p.T, jnp.ones((1, p), f32),
         jnp.zeros((rc - ntri - nh - 1, p), f32)]
    )

    law_a, law_b, law_c = tau_law_abc(tau_which)
    hyper = jnp.stack(
        [jnp.asarray(law_a, f32), jnp.asarray(law_b, f32),
         jnp.asarray(law_c, f32), params.tau0.astype(f32),
         params.c0.astype(f32), params.beta.astype(f32),
         jnp.asarray(0.0, f32), jnp.asarray(0.0, f32)]
    )[None, :]

    kernel = functools.partial(
        _predict_kernel, nh=nh, tb=tb, derive_mask=mask is None,
        derive_zabs=derive_zabs, stats_only=stats_only,
        pb=min(_round_up(nb, 128), p), p_lanes=p,
    )
    tile = pl.BlockSpec((tb, p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    z_tile = tile if not derive_zabs else pl.BlockSpec(
        (tb, zabs_p.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    whole = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n // tb,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            tile,  # flux
            tile,  # error
            z_tile,  # zabs plane, or the zq column when derive_zabs
            *([] if mask_p is None else [tile]),
            whole((1, p)),  # mu
            whole((4, p)),  # psi/omega/blue rows
            whole((rc, p)),  # rhst
        ],
        out_specs=[
            *([] if stats_only else [tile, tile]),  # continuum, std
            pl.BlockSpec((_round_up(2 + nh + nh * nh, 8), tb),
                         lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # stats (lane-major)
        ],
        out_shape=[
            *([] if stats_only else [
                jax.ShapeDtypeStruct((n, p), out_dtype),
                jax.ShapeDtypeStruct((n, p), out_dtype),
            ]),
            jax.ShapeDtypeStruct(
                (_round_up(2 + nh + nh * nh, 8), n), f32
            ),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(
        hyper, flux_p, error_p, zabs_p,
        *([] if mask_p is None else [mask_p]),
        mu_row, rows, rhst,
    )
    if stats_only:
        (stats,) = outs
        cont = std = None
    else:
        cont, std, stats = outs
    # stats come back lane-major (rows x N): slicing rows is free; only
    # the small hmean/hcov views transpose (XLA, outside the kernel)
    return FusedPredictOutputs(
        ll=stats[STAT_LL, :],
        hmean=stats[STAT_H0 : STAT_H0 + nh, :].T,
        hcov=stats[STAT_H0 + nh : STAT_H0 + nh + nh * nh, :].T.reshape(
            n, nh, nh
        ),
        continuum=None if stats_only else cont[:, :npix],
        continuum_std=None if stats_only else std[:, :npix],
        n_obs=stats[STAT_NOBS, :],
    )
