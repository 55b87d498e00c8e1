"""Fused Pallas training step: loss + analytic parameter gradients in ONE kernel.

This is the PER-STEP engine — one launch per batch — used where batches
arrive one at a time (the host-streaming trainer via
``train.loop.make_pallas_step_fn``). The resident-data production trainer
is the WHOLE-EPOCH kernel (``ops.epoch_kernel``), which additionally runs
the optimizer in-kernel and eliminates per-batch launches entirely.

The XLA path for ``loss_and_grads`` lowers to ~7-9 kernels per step (prep,
stacked GEMM, Cholesky chain, transposed backward GEMMs, per-parameter
reductions). Each kernel launch carries fixed overhead (acute on tunneled
devices, real on any hardware via HBM round trips), so the hot training
op here is a single ``pallas_call`` that, per batch tile:

1. builds the absorption amplitude, noise diagonal and masked precision
   (VPU, in registers);
2. runs the per-row contractions ``(TB, Npix) @ (Npix, RC)`` against a
   shared ``[Gram | F | ones]`` RHS on the MXU (full f32 precision) —
   capacitance K, projection w, quad, logdet_d, pixel counts;
3. factorizes every K with an unrolled Cholesky, solves for the posterior
   mean, and evaluates the per-spectrum NLL;
4. computes the ANALYTIC backward: with ``M = K^-1``, ``alpha = K^-1 w``,

       dnll/dK        = 1/2 (M + alpha alpha^T)     =: S
       dnll/dw        = -alpha
       dnll/dquad     = dnll/dlogdet_d = 1/2

   two more MXU GEMMs turn S/alpha into per-pixel cotangents and
   Gram-space gradients, and VPU reductions accumulate dPsi / domega /
   dtau0 / dc0 / dbeta and the per-element contribution counts across
   grid steps.

The caller finishes with one tiny fused elementwise combination
(:func:`finish_f_gradient`) and the Adam update.

Gradient correctness is tested against ``jax.grad`` through the XLA path
(tests/test_fused_step.py); the masked-likelihood semantics match
``/root/reference/QFA/model.py:107-158`` with the algebra bugs fixed
(SURVEY.md section 3, bugs 2-3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.batch import SpectraBatch
from ..models.params import QFAParams
from ..models.qfa import GradCounts

Array = jnp.ndarray

LOG_2PI = 1.8378770664093453

#: Power-law form ``a * (1+z)^b + c`` covering every supported tau law
#: (reference laws at /root/reference/QFA/utils.py:95-141).
TAU_LAW_ABC = {
    "becker": (0.751 / 4.5**2.90, 2.90, -0.132),
    "fg": (0.0018, 3.92, 0.0),
    "kamble": (5.54e-3, 3.182, 0.0),
    "mock": (0.2231435513142097 / 3.25**3.2, 3.2, 0.0),
}

__all__ = [
    "TAU_LAW_ABC",
    "tau_law_abc",
    "FusedStepOutputs",
    "fused_loss_grads",
    "finish_f_gradient",
]


def tau_law_abc(tau_which) -> tuple[float, float, float]:
    """Power-law coefficients for a NAMED tau law — the Pallas kernels
    hard-code the family ``a (1+z)^b + c``, so an arbitrary tau callable
    (accepted by the XLA paths, ``/root/reference/QFA/model.py:26-33``)
    must fail loudly here instead of silently training the wrong law."""
    if not isinstance(tau_which, str):
        raise ValueError(
            "the Pallas kernels support only the named mean-optical-depth "
            f"laws {sorted(TAU_LAW_ABC)} (power-law form a(1+z)^b + c); "
            f"got {tau_which!r} — use the XLA engine "
            "(models.qfa / train.fit) for arbitrary tau callables, or "
            "pass tau=partial(tau, which='<law>') so the law name can be "
            "recovered (physics.tau.resolve_tau)"
        )
    try:
        return TAU_LAW_ABC[tau_which]
    except KeyError:
        raise NotImplementedError(
            f"unknown mean optical depth law {tau_which!r}; "
            f"available: {sorted(TAU_LAW_ABC)}"
        ) from None


class FusedStepOutputs(NamedTuple):
    loss_sum: Array  #: () summed NLL over the batch.
    grads: QFAParams  #: summed gradients (not normalized).
    counts: GradCounts  #: per-element contribution counts.


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# In-kernel small linear algebra on (n*n, TB)-transposed layout:
# each K column lives along the lane dimension (full VPU width).
# ---------------------------------------------------------------------------


def _chol_t(k_t, nh):
    """Unrolled Cholesky; ``k_t`` is a list of nh*nh arrays (TB,)."""
    col = [[None] * nh for _ in range(nh)]
    for j in range(nh):
        s = k_t[j * nh + j]
        for p in range(j):
            s = s - col[j][p] * col[j][p]
        d = jnp.sqrt(s)
        inv_d = 1.0 / d
        col[j][j] = d
        for i in range(j + 1, nh):
            s = k_t[i * nh + j]
            for p in range(j):
                s = s - col[i][p] * col[j][p]
            col[i][j] = s * inv_d
    return col


def _solve_lower_t(chol, b, nh):
    y = []
    for i in range(nh):
        s = b[i]
        for j in range(i):
            s = s - chol[i][j] * y[j]
        y.append(s / chol[i][i])
    return y


def _solve_upper_t(chol, y, nh):
    x = [None] * nh
    for i in reversed(range(nh)):
        s = y[i]
        for j in range(i + 1, nh):
            s = s - chol[j][i] * x[j]
        x[i] = s / chol[i][i]
    return x


def _step_kernel(
    scalars_ref,  # SMEM (1, 8): tau0, c0, beta, law_a, law_b, law_c, -, -
    delta_ref,  # (TB, P) VMEM
    error_ref,
    zabs_ref,
    mask_ref,
    psi_ref,  # (1, P)
    omega_row_ref,  # (1, P) omega at blue pixels, 0 elsewhere
    blue_ref,  # (1, P) 1.0 on blue pixels
    rhs_ref,  # (P, RC) = [G | F | ones | blue | 0-pad]
    rhs_t_ref,  # (RC, P) transpose of rhs
    # outputs (accumulated across sequential grid steps)
    small_ref,  # (1, 128): col 0 = nll sum, col 1 = scalar_count
    drhs_ref,  # (P, RC)
    rows_ref,  # (8, P): dpsi, domega, counts, dtau0_p, dc0_p, dbeta_p, -, -
    *,
    nh: int,
    tb: int,
):
    """All in-kernel reductions run along the sublane (batch) axis only;
    lane-direction sums happen outside the kernel (Mosaic cannot lower
    lane-wise multi_reductions to scalars on this toolchain)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        small_ref[...] = jnp.zeros_like(small_ref)
        drhs_ref[...] = jnp.zeros_like(drhs_ref)
        rows_ref[...] = jnp.zeros_like(rows_ref)

    tau0 = scalars_ref[0, 0]
    c0 = scalars_ref[0, 1]
    beta = scalars_ref[0, 2]
    law_a = scalars_ref[0, 3]
    law_b = scalars_ref[0, 4]
    law_c = scalars_ref[0, 5]

    delta = delta_ref[...]
    err = error_ref[...]
    z = zabs_ref[...]
    m = mask_ref[...]
    psi = psi_ref[...]  # (1, P) broadcasts
    omega_row = omega_row_ref[...]
    blue = blue_ref[...]

    # --- elementwise prep (VPU) ------------------------------------------
    zp1 = 1.0 + z
    tau_line = law_a * zp1**law_b + law_c
    amp = jnp.where(blue > 0, jnp.exp(-tau_line), 1.0)
    tau_hi = tau0 * zp1**beta
    exp_neg = jnp.exp(-tau_hi)
    root = 1.0 - c0 - exp_neg
    zdep = jnp.where(blue > 0, root * root, 0.0)
    d = amp * amp * psi + omega_row * zdep + err * err
    d_safe = jnp.where(m > 0, d, 1.0)
    dinv = m / d_safe
    delta_m = delta * m
    w_row = amp * amp * dinv  # contraction -> K
    u_row = amp * dinv * delta_m  # contraction -> w
    q_row = delta_m * delta_m * dinv  # contraction -> quad
    logd_row = m * jnp.log(d_safe)  # contraction -> logdet_d

    # --- forward contractions (MXU, full f32 precision) ------------------
    # Separate (TB, P) @ (P, RC) dots against the shared RHS instead of one
    # stacked GEMM: same MXU work, no (6*TB, P) staging buffer in VMEM.
    rhs = rhs_ref[...]

    def dot_rhs(x):
        return jax.lax.dot_general(
            x, rhs, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    ones_col = nh * nh + nh
    blue_col = ones_col + 1
    out_k = dot_rhs(w_row)
    out_w = dot_rhs(u_row)
    k_part = out_k[:, : nh * nh]  # (TB, nh*nh)
    w_part = out_w[:, nh * nh : nh * nh + nh]  # (TB, nh)
    # quad and logdet_d only ever appear SUMMED in the NLL, so they fold
    # into one reduction plane, and the mask dot reads both pixel counts
    # from the [ones | blue] RHS columns — 2 MXU passes where the naive
    # form spends 4 (reading one column still costs the full GEMM).
    quad_logd = dot_rhs(q_row + logd_row)[:, ones_col]  # (TB,)
    out_m = dot_rhs(m)
    n_obs = out_m[:, ones_col]
    n_blue = out_m[:, blue_col]

    # --- per-spectrum factorization (lists of (TB,) lanes) ---------------
    k_cols = [k_part[:, i] for i in range(nh * nh)]
    for i in range(nh):
        k_cols[i * nh + i] = k_cols[i * nh + i] + 1.0  # K = I + ...
    w_cols = [w_part[:, i] for i in range(nh)]
    chol = _chol_t(k_cols, nh)

    y = _solve_lower_t(chol, w_cols, nh)
    alpha = _solve_upper_t(chol, y, nh)
    # mahal + logdet_d = (quad + logdet_d) - |y|^2 — the folded plane
    logdet_k = 2.0 * sum(jnp.log(chol[i][i]) for i in range(nh))
    nll_b = 0.5 * (
        quad_logd - sum(yi * yi for yi in y) + n_obs * LOG_2PI + logdet_k
    )
    nll_tile = jnp.sum(nll_b.reshape(tb, 1), axis=0, keepdims=True)  # (1,1)
    small_ref[0:1, 0:1] += nll_tile

    # scalar_count: spectra with at least one observed blue pixel
    any_blue = (n_blue > 0.5).astype(jnp.float32)
    small_ref[0:1, 1:2] += jnp.sum(
        any_blue.reshape(tb, 1), axis=0, keepdims=True
    )

    # --- analytic backward ----------------------------------------------
    # M = K^-1 column by column; S = 1/2 (M + alpha alpha^T)
    s_cols = [None] * (nh * nh)
    for j in range(nh):
        e = [jnp.full_like(n_obs, 1.0 if i == j else 0.0) for i in range(nh)]
        mj = _solve_upper_t(chol, _solve_lower_t(chol, e, nh), nh)
        for i in range(nh):
            s_cols[i * nh + j] = 0.5 * (mj[i] + alpha[i] * alpha[j])

    s_mat = jnp.stack(s_cols, axis=1)  # (TB, nh*nh)
    alpha_mat = jnp.stack(alpha, axis=1)  # (TB, nh)

    # per-pixel cotangents of the contraction rows (MXU, skinny)
    def dot_hp(small, rows):
        return jax.lax.dot_general(
            small, rows, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    dw_pix = dot_hp(s_mat, rhs_t_ref[0 : nh * nh, :])  # (TB,P)=F_p^T S F_p
    du_pix = dot_hp(-alpha_mat, rhs_t_ref[nh * nh : nh * nh + nh, :])

    # d_rhs accumulation (Gram cols then F cols): two thin (P,TB)@(TB,C)
    pad_cols = drhs_ref.shape[1] - (nh * nh + nh)
    s_rows = jnp.concatenate(
        [s_mat, jnp.zeros((tb, nh + pad_cols), s_mat.dtype)], axis=1
    )  # (TB, RC)
    a_rows = jnp.concatenate(
        [
            jnp.zeros((tb, nh * nh), s_mat.dtype),
            -alpha_mat,
            jnp.zeros((tb, pad_cols), s_mat.dtype),
        ],
        axis=1,
    )  # (TB, RC)
    drhs_ref[...] += dot_hp(w_row.T, s_rows) + dot_hp(u_row.T, a_rows)

    # chain rule into the noise diagonal:
    # dD = (-(dW*W + dU*U + 1/2 Q) + 1/2 m) / D, masked pixels zero —
    # dinv = m / d_safe performs both at once
    dd = (-(dw_pix * w_row + du_pix * u_row + 0.5 * q_row) + 0.5 * m) * dinv

    dzdep = dd * omega_row
    droot2 = dzdep * 2.0 * root * blue
    dtau_hi = droot2 * exp_neg
    zp1b = zp1**beta

    rows_ref[0:1, :] += jnp.sum(dd * amp * amp, axis=0, keepdims=True)
    rows_ref[1:2, :] += jnp.sum(dd * zdep, axis=0, keepdims=True)
    rows_ref[2:3, :] += jnp.sum(m, axis=0, keepdims=True)
    rows_ref[3:4, :] += jnp.sum(dtau_hi * zp1b, axis=0, keepdims=True)
    rows_ref[4:5, :] += jnp.sum(-droot2, axis=0, keepdims=True)
    rows_ref[5:6, :] += jnp.sum(
        dtau_hi * tau0 * zp1b * jnp.log(zp1), axis=0, keepdims=True
    )


def _build_static(npix: int, nb: int, nh: int, tb: int):
    p = _round_up(npix, 128)
    rc = _round_up(nh * nh + nh + 2, 128)  # [G | F | ones | blue | pad]
    return p, rc


def _resolve_step_tile(tile_batch: int, b: int, interpret: bool) -> int:
    """Tile rows :func:`fused_loss_grads` actually uses for a ``b``-row
    batch: capped at the batch, and off interpret mode rounded UP to the
    8-row sublane granule Mosaic requires (the RESOLVED tile is rounded —
    capping at the raw ``tile_batch`` would leave a misaligned request
    like 5 misaligned and trip the validator on hardware only). Inert-row
    padding absorbs the difference."""
    tb = min(tile_batch, b)
    if not interpret and tb % 8:
        tb = min(_round_up(tb, 8), _round_up(b, 8))
    return tb


@functools.partial(
    jax.jit, static_argnames=("tau_which", "tile_batch", "interpret")
)
def fused_loss_grads(
    params: QFAParams,
    batch: SpectraBatch,
    tau_which: str = "becker",
    tile_batch: int = 256,
    interpret: bool = False,
) -> FusedStepOutputs:
    """Summed loss + summed analytic gradients + counts, one Pallas launch.

    Contract matches ``models.qfa.summed_stats`` (sans ``n_real``, which the
    caller derives from the batch weights). Batch rows that are fully masked
    contribute exactly zero to every output. Batches that are not a tile
    multiple are padded internally with fully-masked (inert) rows up to one
    — any batch size is accepted; off interpret mode the resolved tile is
    bumped to the 8-row sublane granule Mosaic requires
    (``ops.validate.validate_step_kernel``).
    """
    npix, nh = params.F.shape
    nb = params.omega.shape[0]
    b = batch.delta.shape[0]
    tb = _resolve_step_tile(tile_batch, b, interpret)
    p, rc = _build_static(npix, nb, nh, tb)
    from .validate import validate_step_kernel

    validate_step_kernel(tile_batch=tb, p_lanes=p, interpret=interpret)
    b_pad = _round_up(b, tb)

    f32 = jnp.float32

    def pad_px(x, value=0.0):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, p - x.shape[-1])],
                       constant_values=value)

    def pad_bp(x):
        # pixels to the lane width AND rows to a tile multiple: pad rows
        # carry mask == 0 and vanish from every accumulated output
        return jnp.pad(x, [(0, b_pad - b), (0, p - x.shape[-1])])

    # batch tensors, padded along pixels; zabs padded from Nb to P with 0
    delta = pad_bp(batch.delta.astype(f32) * batch.mask.astype(f32))
    error = pad_bp(batch.error.astype(f32))
    zabs = pad_bp(batch.zabs.astype(f32))
    # weight==0 rows must vanish: zero their masks (pad rows already are)
    mask = pad_bp(batch.mask.astype(f32) * batch.weight.astype(f32)[:, None])

    psi_row = pad_px(params.Psi.astype(f32))[None, :]
    omega_row = pad_px(
        jnp.concatenate([params.omega.astype(f32), jnp.zeros((npix - nb,), f32)])
    )[None, :]
    blue_row = pad_px(
        jnp.concatenate([jnp.ones((nb,), f32), jnp.zeros((npix - nb,), f32)])
    )[None, :]

    gram = (params.F[:, :, None] * params.F[:, None, :]).reshape(npix, nh * nh)
    rhs = jnp.concatenate(
        [
            gram.astype(f32),
            params.F.astype(f32),
            jnp.ones((npix, 1), f32),
            blue_row[0, :npix, None],  # blue count column
        ],
        axis=1,
    )
    rhs = jnp.pad(rhs, ((0, p - npix), (0, rc - rhs.shape[1])))
    rhs_t = rhs.T

    law_a, law_b, law_c = tau_law_abc(tau_which)
    scalars = jnp.array(
        [[params.tau0, params.c0, params.beta, law_a, law_b, law_c, 0.0, 0.0]],
        f32,
    )

    grid = (b_pad // tb,)
    kernel = functools.partial(_step_kernel, nh=nh, tb=tb)
    batch_spec = pl.BlockSpec((tb, p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, p), lambda i: (0, 0), memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                     memory_space=pltpu.VMEM)

    small, drhs, rows = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            batch_spec,  # delta
            batch_spec,  # error
            batch_spec,  # zabs
            batch_spec,  # mask
            row_spec,  # psi
            row_spec,  # omega
            row_spec,  # blue
            pl.BlockSpec((p, rc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            acc((1, 128)),
            acc((p, rc)),
            acc((8, p)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 128), f32),
            jax.ShapeDtypeStruct((p, rc), f32),
            jax.ShapeDtypeStruct((8, p), f32),
        ],
        # large tiles amortize per-grid-step overhead; the scoped default
        # (16 MB) is far below the physical VMEM and rejects TB >= 64
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(scalars, delta, error, zabs, mask, psi_row, omega_row, blue_row, rhs, rhs_t)

    # lane-direction final sums (tiny fused XLA ops)
    grads = QFAParams(
        F=finish_f_gradient(drhs, params.F, npix, nh),
        Psi=rows[0, :npix],
        omega=rows[1, :nb],
        tau0=jnp.sum(rows[3]),
        c0=jnp.sum(rows[4]),
        beta=jnp.sum(rows[5]),
    )
    counts_out = GradCounts(pix=rows[2, :npix], scalar=small[0, 1])
    return FusedStepOutputs(
        loss_sum=small[0, 0], grads=grads, counts=counts_out
    )


def finish_f_gradient(drhs: Array, f: Array, npix: int, nh: int) -> Array:
    """Combine Gram-space and direct cotangents into dF.

    ``dF[p,i] = sum_j (dG[p,ij] + dG[p,ji]) F[p,j] + dRHS_F[p,i]`` — one
    tiny elementwise contraction XLA fuses into the optimizer update.
    """
    dg = drhs[:npix, : nh * nh].reshape(npix, nh, nh)
    dg_sym = dg + jnp.swapaxes(dg, -1, -2)
    direct = drhs[:npix, nh * nh : nh * nh + nh]
    return jnp.einsum("pij,pj->pi", dg_sym, f) + direct
