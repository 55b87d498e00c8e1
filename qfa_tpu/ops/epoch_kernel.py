"""Whole-epoch fused Pallas trainer: ONE kernel launch per epoch.

Measured on the target v5e, throughput is kernel-launch-bound: every
dispatched kernel costs ~0.6-1.5 ms regardless of its size or precision
(a (4096,1920)@(1920,128) GEMM times identically at N=128 and N=512, and
identically across DEFAULT/HIGH/HIGHEST precisions). The XLA scan epoch
runs ~7-9 kernels per batch; the per-step fused kernel
(``ops.fused_step``) still pays gather + epilogue launches. This module
removes the launch axis entirely: the full training epoch — every batch's
forward likelihood, analytic backward, reference-normalized gradients,
Adam update, and parameter clipping — executes inside a single
``pallas_call`` whose grid walks (batch, tile):

* trainable parameters AND Adam moments live in VMEM/SMEM **scratch** for
  the whole launch; the updated state is written out once at the last
  grid step;
* batch tiles stream straight from HBM through the Pallas pipeline
  (double-buffered DMA overlapped with compute) — no gather, no staging
  copies;
* epoch shuffling is a **tile-level permutation** applied through a
  scalar-prefetch index map: each epoch regroups random tiles into
  batches (composition changes every epoch). Row-level mixing inside
  tiles is refreshed by an occasional physical reshuffle
  (``train.loop.reshuffle_dataset``) — see ``train.pallas_engine``;
* the per-batch Adam update runs **in-kernel**: gradients are finished
  (count-normalized per element, ``/root/reference/QFA/model.py:104``),
  moments updated with the reference's per-epoch bias-correction
  semantics (the correction factors are constants within an epoch,
  ``/root/reference/QFA/model.py:214-215``), parameters clipped
  (``/root/reference/QFA/model.py:233-241``), and the ``[tri(Gram) | F |
  ones]`` contraction matrix is rebuilt from the new F before the next
  batch's tiles arrive. The Gram block (and the backward S matrix) are
  symmetric, so only the nh(nh+1)/2 lower-triangle rows are materialized
  — every MXU contraction over that block shrinks ~45% (off-diagonal S
  rows are pre-doubled; accumulated dG rows land as dG[ab] + dG[ba]).

Everything is laid out **row-major along the pixel axis** — parameters,
gradients and the contraction matrix all live as (rows, P) with pixels on
the VPU lane dimension, and every matrix product is expressed through
``dot_general`` dimension numbers instead of explicit transposes. (A
column-major variant with per-column strided updates compiled ~50x
slower in Mosaic: each (P, 1) op fragments into hundreds of 1-lane
vector instructions.)

Likelihood/gradient math matches ``ops.fused_step`` (itself verified
against ``jax.grad`` through the XLA path); semantics of the whole epoch
are tested against ``train.loop.make_epoch_fn`` on identical batch
compositions (tests/test_epoch_kernel.py). Reference behavior covered:
the training hot loop ``/root/reference/QFA/model.py:98-158`` plus the
optimizer ``/root/reference/QFA/optimizer.py:37-69``.

Known, documented divergences from the XLA path: (1) per-step non-finite
update rejection (``guard_nonfinite``) is replaced by EPOCH-level
rollback in ``fit_pallas`` — parameter clipping bounds the trajectory
within the epoch; (2) in the production ``derive_zabs`` layout, ``n_real``
counts weight-1 rows via the zq column's weight lane — identical to the
XLA engine, including real-but-fully-masked rows. In the legacy PLANE
layout there is no weight channel, so ``n_real`` counts rows with >= 1
observed pixel: a real-but-fully-masked row is excluded (it is
indistinguishable from padding), shifting per-batch loss means when such
rows exist (pinned in tests/test_epoch_kernel.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import ParamBounds, QFAParams
from .fused_step import _round_up, tau_law_abc

Array = jnp.ndarray

LOG_2PI = 1.8378770664093453

__all__ = [
    "EpochOutputs",
    "SyncEpochOutputs",
    "fused_train_epoch",
    "zq_column",
    "loglam_row",
    "ZQ_LANES",
    "ABLATE_SECTIONS",
]

#: Instrumentation-only kernel sections that can be stubbed out for the
#: measured per-section VPU census (tools/vpu_census.py). Ablated kernels
#: produce WRONG numerics by design — never use outside timing studies.
#:   tau     — the blue-lane absorption chain (4 exps + ~12 simple ops)
#:   fwd     — the masked-variance d/w/u assembly (blue/red split + concats)
#:   qlog    — the quad+logdet fold's log(d) term
#:   bwd     — the dd cotangent chain + blue backward elementwise products
#:             (dd = m also lets the compiler delete the dw/du dots)
#:   bwddots — ONLY the dw_pix/du_pix backward contractions (stubbed to
#:             w_row/u_row): isolates the two MXU dots + any output
#:             relayout from the elementwise chain the plain bwd stub
#:             removes along with them
#:   dwdot   — ONLY the dw_pix (K=ntri) contraction: its in-kernel
#:             marginal cost (docs/KDEPTH_r05.json showed these dots pay
#:             a K-flat fixed pass cost standalone; this splits the
#:             in-kernel pair)
#:   dudot   — ONLY the du_pix (K=nh) contraction
#:   gsums   — the per-batch gradient-row accumulations (operand products
#:             + the 6 sublane jnp.sum reductions). CAVEAT: those sums
#:             are the ONLY consumers of the dd cotangent chain, so this
#:             removal arm lets the compiler delete the whole backward
#:             chain (incl. the dw/du dots) along with them — its delta
#:             is bwd + the true reduction cost, NOT the reduction cost
#:             alone. Use `xsums` for the DCE-proof direct measurement.
#:   xsums   — ADDITIVE arm: six EXTRA sublane reductions over alive,
#:             nowhere-else-summed planes; the arm's marginal SLOWDOWN
#:             vs the full kernel measures sublane-reduction cost with
#:             no DCE/CSE confound. Must be the only section ablated.
#:   small   — the per-spectrum Cholesky/solves/K^-1/S build (smallwork)
#:   epi     — the per-batch optimizer epilogue (_finish_and_update)
ABLATE_SECTIONS = (
    "tau", "fwd", "qlog", "bwd", "bwddots", "dwdot", "dudot", "gsums",
    "xsums", "small", "epi"
)

#: Fixed lane width of the ``derive_zabs`` zq-column ABI: lane 0 =
#: ``log1p(zqso)``, lane 1 = row weight (1 real / 0 padding), rest zero.
ZQ_LANES = 128


class EpochOutputs(NamedTuple):
    params: QFAParams  #: parameters after the whole epoch.
    m: QFAParams  #: first Adam moments.
    v: QFAParams  #: second Adam moments.
    #: (n_batches,) summed NLL per batch — (n_epochs, n_batches) when the
    #: launch runs several epochs.
    loss_sums: Array
    #: real rows per batch (same shape as ``loss_sums``): weight-1 rows (zq
    #: weight lane) with ``derive_zabs``, rows with >=1 observed pixel in
    #: plane mode.
    n_real: Array


class SyncEpochOutputs(NamedTuple):
    """Outputs of a ``sync_grads`` window launch (``parallel.sync_dp``).

    ``params/m/v`` reflect the applied pending update plus the window's
    LOCAL batch updates (none when ``n_batches == 1`` — the exact-DP
    cadence); the last batch's RAW gradient accumulators come back for the
    cross-device psum instead of being applied in-kernel.
    """

    params: QFAParams
    m: QFAParams
    v: QFAParams
    loss_sums: Array  #: (n_batches,) summed NLL per batch of the window.
    n_real: Array  #: real rows per batch.
    drhst: Array  #: (RC, P) raw [tri-Gram | F] gradient rows, LAST batch.
    grows: Array  #: (8, P) raw dPsi/domega/counts/scalar-grad rows.
    small: Array  #: (1, 128) raw [nll_sum, scal_cnt, n_real, ...] sums.


# ---------------------------------------------------------------------------
# small in-kernel linear algebra on lane-major layout (lists of (TB,) values)
# -- same factorization as ops.fused_step
# ---------------------------------------------------------------------------


def _tri_pairs(nh: int):
    """Lower-triangle index pairs [(a, b) with a >= b] — the Gram matrix is
    symmetric, so only these nh(nh+1)/2 rows are materialized (vs nh^2),
    shrinking every MXU contraction over the Gram block by ~45%."""
    return [(a, b) for a in range(nh) for b in range(a + 1)]


def _tri_idx(a: int, b: int) -> int:
    a, b = (a, b) if a >= b else (b, a)
    return a * (a + 1) // 2 + b


# The unrolled in-kernel Cholesky/triangular-solve helpers are shared
# with the per-step kernel — ONE implementation so a numeric change can
# never leave the two engines factorizing differently.
from .fused_step import _chol_t, _solve_lower_t, _solve_upper_t  # noqa: E402


def _kinv_column(chol, b, nh):
    """Column b of K^-1 = (L L^T)^-1, exploiting the unit RHS.

    The forward solve of ``L y = e_b`` has ``y_i = 0`` for ``i < b``
    exactly — XLA does not fold ``x * 0`` under default float semantics,
    so the generic solver would emit every dead op. Skipping them cuts
    the K^-1 build (the dominant per-spectrum smallwork) roughly in half.
    """
    y = [None] * nh
    y[b] = 1.0 / chol[b][b]
    for i in range(b + 1, nh):
        s = -chol[i][b] * y[b]
        for j in range(b + 1, i):
            s = s - chol[i][j] * y[j]
        y[i] = s / chol[i][i]
    x = [None] * nh
    for i in reversed(range(nh)):
        s = y[i] if i >= b else None  # y_i = 0 exactly for i < b
        for j in range(i + 1, nh):
            t = chol[j][i] * x[j]
            s = -t if s is None else s - t
        x[i] = s / chol[i][i]
    return x


# SMEM hyper-parameter slots (index into the (1, 24) hyper input)
H_LAW_A, H_LAW_B, H_LAW_C = 0, 1, 2
H_LR, H_BC1, H_BC2, H_EPS, H_WD, H_B1, H_B2 = 3, 4, 5, 6, 7, 8, 9
H_VMIN, H_VMAX, H_T0MIN, H_T0MAX, H_BMIN, H_BMAX, H_CMIN, H_CMAX = (
    10, 11, 12, 13, 14, 15, 16, 17,
)
H_REFNORM = 18  #: 1.0 -> per-element count normalization, 0.0 -> mean
H_APPLY = 19  #: sync_grads mode: 1.0 -> apply the pending (psum'd)
#: gradient accumulators at launch start (0 on an epoch's first launch)

# SMEM scalar-state slots: value, m, v for each of tau0, c0, beta
S_T0, S_C0, S_BETA = 0, 1, 2
S_MT0, S_MC0, S_MBETA = 3, 4, 5
S_VT0, S_VC0, S_VBETA = 6, 7, 8

# rows in the row-parameter scratch
R_PSI, R_OMEGA, R_MPSI, R_VPSI, R_MOMEGA, R_VOMEGA = 0, 1, 2, 3, 4, 5
# rows in the per-batch gradient accumulator scratch
G_DPSI, G_DOMEGA, G_CNT, G_DT0, G_DC0, G_DBETA = 0, 1, 2, 3, 4, 5

_HP = dict(
    precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
)


def _epoch_kernel(
    perm_ref,  # scalar prefetch: (n_tiles,) tile permutation
    # inputs ----------------------------------------------------------------
    hyper_ref,  # SMEM (1, 24)
    scal0_ref,  # SMEM (1, 16) initial scalar state
    delta_ref,  # (TB, P)
    error_ref,  # (TB, P); masked pixels carry error == 0 (data layer)
    zabs_ref,  # (TB, P) absorber redshifts (zeros on red/pad lanes), or
    # the (TB, 128k) zq column (lane 0 = log1p(zqso)) when derive_zabs
    *rest,  # [mask_ref unless derive_mask], then:
    # ft0_ref (NH, P) initial F; mft0_ref; vft0_ref;
    # rows0_ref (8, P): psi, omega, m_psi, v_psi, m_omega, v_omega;
    # blue_ref (1, P); [loglam_ref (1, P) when derive_zabs]
    # outputs:
    # loss_ref (n_batches, 128) per-batch [nll_sum, scalar_cnt, n_real];
    # ft_out_ref (NH, P); mft_out_ref; vft_out_ref; rows_out_ref (8, P);
    # scal_out_ref SMEM (1, 16)
    # scratch:
    # rhst_scr (RC, P) rows [gram | F | ones]; drhst_scr (RC, P);
    # mft_scr (NH, P); vft_scr; rows_scr (8, P); grows_scr (8, P);
    # small_scr (1, 128); sc_scr SMEM (1, 16)
    nh: int,
    tb: int,
    tpb: int,
    n_batches: int,
    n_epochs: int,
    derive_mask: bool,
    derive_zabs: bool,
    pb: int,  #: blue-padded lane count (round_up(nb, 128), <= p_lanes)
    p_lanes: int,  #: full padded pixel width P
    mxu_bf16: bool,  #: bf16 passes (f32 accumulate) on the heavy dots
    sync_grads: bool,  #: exact-DP window mode: apply an incoming (psum'd)
    #: gradient at launch start, output the LAST batch's raw gradient
    #: accumulators instead of applying them (parallel.sync_dp)
    bwd_wide: bool,  #: fuse the two backward cotangent dots into ONE
    #: K=(ntri+nh) contraction against a block-diag [[gram,0],[0,F]]
    #: (rc2, 2P) scratch whose (TB, 2P) output is [dw_pix | du_pix].
    #: Bitwise-identical, measured speed-NEUTRAL (the dots are
    #: output-pass-bound; docs/BWDWIDE_r05.json) — a tested alternate
    #: lowering, not a speed mode
    ablate: frozenset,  #: timing-census section stubs (ABLATE_SECTIONS);
    #: empty in every production path
):
    rhs2_scr = None
    if bwd_wide:
        *rest, rhs2_scr = rest
    mask_ref = None
    if not derive_mask:
        mask_ref, *rest = rest
    ft0_ref, mft0_ref, vft0_ref, rows0_ref, blue_ref, *rest = rest
    loglam_ref = None
    if derive_zabs:
        loglam_ref, *rest = rest
    pend_drhst_ref = pend_grows_ref = pend_small_ref = None
    gdrhst_out = ggrows_out = gsmall_out = None
    if sync_grads:
        pend_drhst_ref, pend_grows_ref, pend_small_ref, *rest = rest
        (
            loss_ref, ft_out_ref, mft_out_ref, vft_out_ref, rows_out_ref,
            scal_out_ref, gdrhst_out, ggrows_out, gsmall_out,
            rhst_scr, drhst_scr, mft_scr, vft_scr, rows_scr, grows_scr,
            small_scr, sc_scr,
        ) = rest
    else:
        (
            loss_ref, ft_out_ref, mft_out_ref, vft_out_ref, rows_out_ref,
            scal_out_ref,
            rhst_scr, drhst_scr, mft_scr, vft_scr, rows_scr, grows_scr,
            small_scr, sc_scr,
        ) = rest
    e = pl.program_id(0)  # epoch-within-launch index
    i = pl.program_id(1)  # batch index
    j = pl.program_id(2)  # tile-within-batch index
    f32 = jnp.float32
    pairs = _tri_pairs(nh)
    ntri = len(pairs)  # nh(nh+1)/2 lower-triangle Gram rows
    ones_row = ntri + nh

    def _sync_rhs2():
        # refresh the block-diag backward contraction matrix from the
        # (just rebuilt) gram/F rows; the zero blocks were cleared once
        # at launch init and are never touched again
        rhs2_scr[0:ntri, 0:p_lanes] = rhst_scr[0:ntri, :]
        rhs2_scr[ntri : ntri + nh, p_lanes:] = rhst_scr[ntri : ntri + nh, :]

    # -- one-time init (first grid step of the whole launch) -----------------
    @pl.when(jnp.logical_and(e == 0, jnp.logical_and(i == 0, j == 0)))
    def _init_epoch():
        rows_scr[...] = rows0_ref[...]
        mft_scr[...] = mft0_ref[...]
        vft_scr[...] = vft0_ref[...]
        for k in range(9):
            sc_scr[0, k] = scal0_ref[0, k]
        rhst_scr[...] = jnp.zeros_like(rhst_scr)
        ft0 = ft0_ref[...]  # (NH, P)
        for a in range(nh):
            rhst_scr[ntri + a : ntri + a + 1, :] = ft0[a : a + 1, :]
        for t, (a, b) in enumerate(pairs):
            rhst_scr[t : t + 1, :] = ft0[a : a + 1, :] * ft0[b : b + 1, :]
        rhst_scr[ones_row : ones_row + 1, :] = jnp.ones_like(
            rhst_scr[ones_row : ones_row + 1, :]
        )
        if bwd_wide:
            rhs2_scr[...] = jnp.zeros_like(rhs2_scr)
            _sync_rhs2()

    # -- per-batch reset ----------------------------------------------------
    @pl.when(j == 0)
    def _init_batch():
        drhst_scr[...] = jnp.zeros_like(drhst_scr)
        grows_scr[...] = jnp.zeros_like(grows_scr)
        small_scr[...] = jnp.zeros_like(small_scr)

    # -- gradient finish + Adam update + RHS rebuild --------------------------
    # A plain function (not a pl.when body): called at every batch end, and
    # additionally at launch START in sync_grads mode to apply the psum'd
    # pending gradient of the previous launch's last batch. It reads only
    # refs/scratch, so both call sites see identical semantics.
    def _finish_and_update():
        if "epi" in ablate:  # census stub: measure the epilogue's cost
            return
        # per-epoch scheduled LR and bias correction: row e of the hyper
        # table (the reference's Adam counter advances once per epoch,
        # /root/reference/QFA/optimizer.py:49-69)
        lr = hyper_ref[e, H_LR]
        bc1 = hyper_ref[e, H_BC1]
        bc2 = hyper_ref[e, H_BC2]
        eps = hyper_ref[0, H_EPS]
        wd = hyper_ref[0, H_WD]
        b1 = hyper_ref[0, H_B1]
        b2 = hyper_ref[0, H_B2]
        refnorm = hyper_ref[0, H_REFNORM]
        n_real = jnp.maximum(small_scr[0, 2], 1.0)
        scal_cnt = jnp.maximum(small_scr[0, 1], 1.0)

        cnt_row = grows_scr[G_CNT : G_CNT + 1, :]  # (1, P)
        denom_row = jnp.where(refnorm > 0, jnp.maximum(cnt_row, 1.0), n_real)
        zero_row = jnp.where(refnorm > 0, (cnt_row > 0).astype(f32), 1.0)

        def adam_row(p, g, mrow, vrow):
            g = g + wd * p
            mn = (1.0 - b1) * g + b1 * mrow
            vn = (1.0 - b2) * g * g + b2 * vrow
            pn = p - lr * (mn / bc1) / (jnp.sqrt(vn / bc2) + eps)
            return pn, mn, vn

        vmin = hyper_ref[0, H_VMIN]
        vmax = hyper_ref[0, H_VMAX]
        dpsi = grows_scr[G_DPSI : G_DPSI + 1, :] / denom_row * zero_row
        p_new, m_new, v_new = adam_row(
            rows_scr[R_PSI : R_PSI + 1, :], dpsi,
            rows_scr[R_MPSI : R_MPSI + 1, :],
            rows_scr[R_VPSI : R_VPSI + 1, :],
        )
        rows_scr[R_PSI : R_PSI + 1, :] = jnp.clip(p_new, vmin, vmax)
        rows_scr[R_MPSI : R_MPSI + 1, :] = m_new
        rows_scr[R_VPSI : R_VPSI + 1, :] = v_new

        blue_r = blue_ref[...]
        domega = grows_scr[G_DOMEGA : G_DOMEGA + 1, :] / denom_row * zero_row
        o_new, om_new, ov_new = adam_row(
            rows_scr[R_OMEGA : R_OMEGA + 1, :], domega,
            rows_scr[R_MOMEGA : R_MOMEGA + 1, :],
            rows_scr[R_VOMEGA : R_VOMEGA + 1, :],
        )
        # omega exists only on blue pixels; keep red/pad lanes at 0
        rows_scr[R_OMEGA : R_OMEGA + 1, :] = (
            jnp.clip(o_new, vmin, vmax) * blue_r
        )
        rows_scr[R_MOMEGA : R_MOMEGA + 1, :] = om_new * blue_r
        rows_scr[R_VOMEGA : R_VOMEGA + 1, :] = ov_new * blue_r

        # F rows: dF[a] = dRHS_F[a] + sum_b (dG[ab] + dG[ba]) F[b], all
        # (1,P). Off-diagonal tri rows already hold dG[ab]+dG[ba] (the S
        # rows were pre-doubled); the diagonal row holds dG[aa] once.
        f_rows = [rhst_scr[ntri + a : ntri + a + 1, :] for a in range(nh)]
        new_f_rows = []
        for a in range(nh):
            df = drhst_scr[ntri + a : ntri + a + 1, :]
            for b in range(nh):
                t = _tri_idx(a, b)
                dg = drhst_scr[t : t + 1, :]
                if a == b:
                    dg = dg + dg
                df = df + dg * f_rows[b]
            df = df / denom_row * zero_row
            g = df + wd * f_rows[a]
            mn = (1.0 - b1) * g + b1 * mft_scr[a : a + 1, :]
            vn = (1.0 - b2) * g * g + b2 * vft_scr[a : a + 1, :]
            fn = f_rows[a] - lr * (mn / bc1) / (jnp.sqrt(vn / bc2) + eps)
            mft_scr[a : a + 1, :] = mn
            vft_scr[a : a + 1, :] = vn
            new_f_rows.append(fn)

        # scalar gradients: lane sums via MXU against the ones row
        ones_r = rhst_scr[ones_row : ones_row + 1, :]  # (1, P)

        def lane_sum(row_idx):
            acc = jax.lax.dot_general(
                grows_scr[row_idx : row_idx + 1, :], ones_r,
                (((1,), (1,)), ((), ())), **_HP,
            )  # (1, 1)
            small_scr[0:1, 8 + row_idx : 9 + row_idx] = acc

        lane_sum(G_DT0)
        lane_sum(G_DC0)
        lane_sum(G_DBETA)
        sdenom = jnp.where(refnorm > 0, scal_cnt, n_real)

        def adam_scalar(slot_p, slot_m, slot_v, g, lo, hi):
            g = g / sdenom + wd * sc_scr[0, slot_p]
            mn = (1.0 - b1) * g + b1 * sc_scr[0, slot_m]
            vn = (1.0 - b2) * g * g + b2 * sc_scr[0, slot_v]
            pn = sc_scr[0, slot_p] - lr * (mn / bc1) / (
                jnp.sqrt(vn / bc2) + eps
            )
            sc_scr[0, slot_p] = jnp.clip(pn, lo, hi)
            sc_scr[0, slot_m] = mn
            sc_scr[0, slot_v] = vn

        adam_scalar(
            S_T0, S_MT0, S_VT0, small_scr[0, 8 + G_DT0],
            hyper_ref[0, H_T0MIN], hyper_ref[0, H_T0MAX],
        )
        adam_scalar(
            S_C0, S_MC0, S_VC0, small_scr[0, 8 + G_DC0],
            hyper_ref[0, H_CMIN], hyper_ref[0, H_CMAX],
        )
        adam_scalar(
            S_BETA, S_MBETA, S_VBETA, small_scr[0, 8 + G_DBETA],
            hyper_ref[0, H_BMIN], hyper_ref[0, H_BMAX],
        )

        # rebuild [tri(gram) | F] rows from the new F
        for a in range(nh):
            rhst_scr[ntri + a : ntri + a + 1, :] = new_f_rows[a]
        for t, (a, b) in enumerate(pairs):
            rhst_scr[t : t + 1, :] = new_f_rows[a] * new_f_rows[b]
        if bwd_wide:
            _sync_rhs2()

    if sync_grads:
        # -- launch start: apply the incoming (psum'd) gradient ---------------
        # The previous launch's LAST batch exported raw accumulators; the
        # engine psum'd them across the mesh; this launch applies the
        # GLOBAL update before any of its own tiles are processed. Gated
        # on the hyper table's apply flag (0 on the first launch of an
        # epoch). Accumulators are re-zeroed afterwards (the j == 0 reset
        # above already ran for this grid step).
        @pl.when(
            jnp.logical_and(
                hyper_ref[0, H_APPLY] > 0.0,
                jnp.logical_and(e == 0, jnp.logical_and(i == 0, j == 0)),
            )
        )
        def _apply_pending():
            drhst_scr[...] = pend_drhst_ref[...]
            grows_scr[...] = pend_grows_ref[...]
            small_scr[...] = pend_small_ref[...]
            _finish_and_update()
            drhst_scr[...] = jnp.zeros_like(drhst_scr)
            grows_scr[...] = jnp.zeros_like(grows_scr)
            small_scr[...] = jnp.zeros_like(small_scr)


    # -- forward + backward for this tile (cf. ops.fused_step) ---------------
    law_a = hyper_ref[0, H_LAW_A]
    law_b = hyper_ref[0, H_LAW_B]
    law_c = hyper_ref[0, H_LAW_C]
    tau0 = sc_scr[0, S_T0]
    c0 = sc_scr[0, S_C0]
    beta = sc_scr[0, S_BETA]

    # delta/error may stream as bfloat16 (HBM bytes and residency halve;
    # all arithmetic, accumulation and the Cholesky chain stay f32)
    delta = delta_ref[...].astype(f32)
    err = error_ref[...].astype(f32)
    if derive_mask:
        # masked pixels are sanitized to error == 0 by the data layer, so
        # the mask can skip HBM entirely (survey-scale memory saver; costs
        # ~10% step time vs streaming the mask)
        m = (err > 0.0).astype(f32)
    else:
        m = mask_ref[...].astype(f32)
    psi = rows_scr[R_PSI : R_PSI + 1, :]
    omega_row = rows_scr[R_OMEGA : R_OMEGA + 1, :]
    blue = blue_ref[...]

    # The absorption/tau chain only exists on BLUE pixels; restricting its
    # elementwise work (4 exps + ~15 VPU ops per pixel) to the first
    # pb = round_up(nb, 128) lanes cuts the dominant VPU cost on
    # production grids (SDSS: 768 of 1920 lanes; DESI: 2304 of 9344).
    # When pb == p (all-blue test grids) — or pb == 0 (a red-only grid,
    # where zero-width slices would not lower) — the unrestricted path is
    # used.
    split = 0 < pb < p_lanes
    if not split:
        pb = p_lanes  # downstream [:pb] slices become full-width
    blue_b = blue[:, :pb] if split else blue
    if "tau" in ablate:
        # census stub: the absorption chain's outputs replaced by cheap
        # constants of the same shapes (removes 4 exps + the blue simple
        # chain; numerics are garbage by design)
        ones_b = jnp.zeros((tb, pb), f32) + 1.0
        tau_line = ones_b
        zp1b = ones_b
        log_zp1 = ones_b
        amp_b = ones_b
        exp_neg = 0.5 * ones_b
        root = 0.5 * ones_b
        zdep_b = blue_b * ones_b
    elif derive_zabs:
        # zabs never touches HBM: the (TB, lanes) input carries only
        # log1p(zqso) in lane 0, and log(1 + zabs) = log1p(zqso) +
        # log(lam/lam_lya) is an outer ADD against a static row. All the
        # per-pixel pow/log transcendentals disappear (pow lowers to
        # exp(b*log x) on the VPU); only the param-dependent exps remain.
        zq = zabs_ref[:, 0:1]  # (TB, 1) log1p(zqso)
        loglam_b = loglam_ref[:, :pb] if split else loglam_ref[...]
        logzp1 = (zq + loglam_b) * blue_b  # (TB, PB); 0 on red/pad
        tau_line = law_a * jnp.exp(law_b * logzp1) + law_c
        zp1b = jnp.exp(beta * logzp1)
        log_zp1 = logzp1
    else:
        zfull = zabs_ref[...].astype(f32)
        zp1 = 1.0 + (zfull[:, :pb] if split else zfull)
        tau_line = law_a * zp1**law_b + law_c
        zp1b = zp1**beta
        log_zp1 = jnp.log(zp1)
    if "tau" not in ablate:
        amp_b = jnp.where(blue_b > 0, jnp.exp(-tau_line), 1.0)  # (TB, PB)
        tau_hi = tau0 * zp1b
        exp_neg = jnp.exp(-tau_hi)
        root = 1.0 - c0 - exp_neg
        zdep_b = jnp.where(blue_b > 0, root * root, 0.0)
    delta_m = delta * m
    if "fwd" in ablate:
        # census stub: the masked-variance assembly (blue/red split,
        # concats, amp/omega products) replaced by a flat plane
        d = err * err + 1.0
        d_safe = jnp.where(m > 0, d, 1.0)
        dinv = m / d_safe
        w_row = dinv
        u_row = dinv * delta_m
    elif split:
        err_b = err[:, :pb]
        # red side: amp = 1, zdep = 0 -> d = psi + err^2. Computed FULL
        # width and sliced: Mosaic cannot broadcast a (1, X) row slice at
        # a nonzero lane offset (psi[:, pb:]), while offset-0 broadcasts
        # and (TB, X) offset slices lower fine.
        base_r = psi + err * err
        d_b = (
            amp_b * amp_b * psi[:, :pb]
            + omega_row[:, :pb] * zdep_b
            + err_b * err_b
        )
        d = jnp.concatenate([d_b, base_r[:, pb:]], axis=1)
        d_safe = jnp.where(m > 0, d, 1.0)
        dinv = m / d_safe
        dinv_b, dinv_r = dinv[:, :pb], dinv[:, pb:]
        w_row = jnp.concatenate(
            [amp_b * amp_b * dinv_b, dinv_r], axis=1
        )
        u_row = jnp.concatenate(
            [amp_b * dinv_b * delta_m[:, :pb], dinv_r * delta_m[:, pb:]],
            axis=1,
        )
    else:
        d = amp_b * amp_b * psi + omega_row * zdep_b + err * err
        d_safe = jnp.where(m > 0, d, 1.0)
        dinv = m / d_safe
        w_row = amp_b * amp_b * dinv
        u_row = amp_b * dinv * delta_m
    q_row = delta_m * delta_m * dinv  # reused by the backward (dd)
    # quad and logdet enter the NLL only as a SUM — folding them into one
    # plane halves their lane reductions (each (1, P) x (TB, P) ones-dot
    # costs a full MXU block-pass regardless of its single output row)
    if "qlog" in ablate:
        ql_row = q_row  # census stub: drop the logdet-d term (the log)
    else:
        ql_row = q_row + m * jnp.log(d_safe)

    rhst = rhst_scr[...]

    # Per-spectrum small-matrix work happens in LANE-MAJOR layout: the MXU
    # emits (R, TB) directly, so every K entry / projection is a SUBLANE
    # row slice of full lanes — no strided lane gathers, no relayouts.
    def dot_lanes(rows, x):
        # (R, P) x (TB, P) -> (R, TB); outputs are lane-offset-0 so the
        # per-spectrum math below never mixes offsets (Mosaic requirement)
        return jax.lax.dot_general(rows, x, (((1,), (1,)), ((), ())), **_HP)

    # The HEAVY dots (Gram/F projections + the four backward contractions)
    # optionally run as true bf16 MXU passes with f32 accumulation
    # (``mxu_bf16``): ~2.5x the per-pass throughput on the v5e for a
    # ~5e-7 relative loss-trajectory drift over tens of epochs (measured;
    # SGD absorbs the rounding). Loss bookkeeping, counts and the scalar-
    # gradient lane sums stay f32-HIGHEST.
    def dot_big(a, b, dims):
        if mxu_bf16:
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
                preferred_element_type=f32,
            )
        return jax.lax.dot_general(a, b, dims, **_HP)

    lanes_dims = (((1,), (1,)), ((), ()))
    k_t = dot_big(rhst_scr[0:ntri, :], w_row, lanes_dims)  # (ntri, TB)
    w_t = dot_big(rhst_scr[ntri : ntri + nh, :], u_row, lanes_dims)
    ones_r = rhst_scr[ones_row : ones_row + 1, :]  # (1, P)
    sum_ql = dot_lanes(ones_r, ql_row)  # (1, TB) quad + logdet_d
    # both counts in ONE MXU pass: [ones; blue] x m -> [n_obs; n_blue]
    # (blue is a static row, so n_blue = sum_p blue[p] m[t,p] needs no
    # masked mblue plane)
    cnt2 = dot_lanes(jnp.concatenate([ones_r, blue_ref[...]], axis=0), m)
    n_obs = cnt2[0:1, :]
    n_blue = cnt2[1:2, :]

    # expand the triangle back to the flat (a*nh+b) list the factorization
    # indexes; the Cholesky only ever reads the lower triangle, so shared
    # slices are exact
    k_cols = [
        k_t[_tri_idx(a, b) : _tri_idx(a, b) + 1, :]
        for a in range(nh)
        for b in range(nh)
    ]
    for a in range(nh):
        k_cols[a * nh + a] = k_cols[a * nh + a] + 1.0
    w_cols = [w_t[a : a + 1, :] for a in range(nh)]
    if "small" in ablate:
        # census stub: skip the whole per-spectrum small-matrix chain
        # (Cholesky, two triangular solves, the sparse K^-1 columns and
        # the S build) — alpha/y/s reuse already-computed rows
        chol = None
        y = w_cols
        alpha = w_cols
        logdet_k = 0.0
    else:
        chol = _chol_t(k_cols, nh)
        y = _solve_lower_t(chol, w_cols, nh)
        alpha = _solve_upper_t(chol, y, nh)
        logdet_k = 2.0 * sum(jnp.log(chol[a][a]) for a in range(nh))
    nll_b = 0.5 * (
        sum_ql - sum(yi * yi for yi in y) + n_obs * LOG_2PI + logdet_k
    )  # (1, TB)
    # lane sums via one thin MXU dot: (3, TB) @ (TB, 1)
    ones_tb1 = jnp.ones((tb, 1), f32)
    sums3 = jax.lax.dot_general(
        jnp.concatenate(
            [nll_b, (n_blue > 0.5).astype(f32), (n_obs > 0.5).astype(f32)],
            axis=0,
        ),
        ones_tb1,
        (((1,), (0,)), ((), ())),
        **_HP,
    )  # (3, 1)
    small_scr[0:1, 0:1] += sums3[0:1, :]
    small_scr[0:1, 1:2] += sums3[1:2, :]
    if derive_zabs:
        # n_real from the zq column's weight lane: real-but-fully-masked
        # rows count toward the batch-mean divisor exactly as in the XLA
        # engine (weight-1 rows), while fit_pallas's zero padding rows
        # carry weight 0. One tiny (1, TB) @ (TB, 1) MXU dot.
        wsum = jax.lax.dot_general(
            zabs_ref[:, 1:2], ones_tb1, (((0,), (0,)), ((), ())), **_HP
        )  # (1, 1)
        small_scr[0:1, 2:3] += wsum
    else:
        # plane mode has no weight channel: rows with zero observed pixels
        # are indistinguishable from padding and are NOT counted (the
        # documented divergence from the XLA engine, pinned in
        # tests/test_epoch_kernel.py)
        small_scr[0:1, 2:3] += sums3[2:3, :]

    # analytic backward: S = 1/2 (K^-1 + alpha alpha^T), dW = -alpha.
    # S and the Gram block are both symmetric, so only the lower triangle
    # is materialized, with off-diagonal rows pre-doubled: every use below
    # is a symmetric contraction  sum_ab S[ab] G[ab]  =  sum_tri w S G
    # (w = 1 diag, 2 off-diag), and the accumulated dG rows land directly
    # as dG[ab] + dG[ba].
    s_tri = [None] * ntri
    if "small" in ablate:
        for t in range(ntri):  # census stub: reuse rows, no K^-1/S math
            s_tri[t] = k_t[t : t + 1, :]
    else:
        for b in range(nh):
            mj = _kinv_column(chol, b, nh)
            for a in range(b, nh):
                w_ab = 1.0 if a == b else 2.0
                s_tri[_tri_idx(a, b)] = w_ab * 0.5 * (
                    mj[a] + alpha[a] * alpha[b]
                )
    s_t = jnp.concatenate(s_tri, axis=0)  # (ntri, TB)
    alpha_t = jnp.concatenate(alpha, axis=0)  # (nh, TB)

    if "bwddots" in ablate:
        # census stub: reuse existing planes so ONLY the two backward
        # contractions (and any output relayout) disappear
        dw_pix = w_row
        du_pix = u_row
    elif bwd_wide:
        # ONE K=(ntri+nh) dot against the block-diag rhs2: the (TB, 2P)
        # output is [dw_pix | du_pix] side by side. The zero blocks
        # contribute exact +0.0 terms, so both halves are bitwise equal
        # to the two-dot path. Measured speed-neutral (the dots are
        # output-pass-bound, docs/BWDWIDE_r05.json) — kept as the tested
        # alternate lowering that proved the two-dot path saturated.
        lhs44 = jnp.concatenate([s_t, -alpha_t], axis=0)
        wide = dot_big(
            lhs44, rhs2_scr[0 : ntri + nh, :], (((0,), (0,)), ((), ()))
        )  # (TB, 2P)
        dw_pix = wide[:, :p_lanes]
        du_pix = wide[:, p_lanes:]
    else:
        if "dwdot" in ablate:  # census stub: the K=ntri dot alone
            dw_pix = w_row
        else:
            dw_pix = dot_big(
                s_t, rhst_scr[0:ntri, :], (((0,), (0,)), ((), ()))
            )  # (TB, P)
        if "dudot" in ablate:  # census stub: the K=nh dot alone
            du_pix = u_row
        else:
            du_pix = dot_big(
                -alpha_t, rhst_scr[ntri : ntri + nh, :],
                (((0,), (0,)), ((), ())),
            )

    # two accumulation dots, each contracting only TB: the old fused
    # [s|0; 0|-alpha] @ [w; u] form padded the contraction to 2TB and
    # spent 2.2x the MXU flops on structural zeros. The results land in
    # distinct row ranges; concat + zero-pad keeps the scratch update one
    # aligned full-block add.
    pad_rows = drhst_scr.shape[0] - (ntri + nh)
    dg_rows = dot_big(
        s_t, w_row, (((1,), (0,)), ((), ()))
    )  # (ntri, P)
    du_rows = dot_big(
        -alpha_t, u_row, (((1,), (0,)), ((), ()))
    )  # (nh, P)
    drhst_scr[...] += jnp.concatenate(
        [dg_rows, du_rows, jnp.zeros((pad_rows, dg_rows.shape[1]), f32)],
        axis=0,
    )

    if "bwd" in ablate:
        # census stub: the dd cotangent chain + blue backward elementwise
        dd = m
        dd_b = dd[:, :pb] if split else dd
        dzdep = dd_b
        droot2 = dd_b
        dtau_hi = dd_b
        dpsi_op = dd
    else:
        # dinv = m / d_safe, so multiplying by it both divides and masks —
        # one fewer per-pixel divide than (.../d_safe) * m
        dd = (
            -(dw_pix * w_row + du_pix * u_row + 0.5 * q_row) + 0.5 * m
        ) * dinv
        dd_b = dd[:, :pb] if split else dd
        dzdep = dd_b * (omega_row[:, :pb] if split else omega_row)
        droot2 = dzdep * 2.0 * root * blue_b
        dtau_hi = droot2 * exp_neg

        if split:
            dpsi_op = jnp.concatenate(
                [dd_b * amp_b * amp_b, dd[:, pb:]], axis=1  # red: amp = 1
            )
        else:
            dpsi_op = dd_b * amp_b * amp_b
    if "gsums" not in ablate:
        # Per-pixel gradient rows accumulate through Mosaic's native
        # sublane reduction — which is nearly FREE: the additive xsums
        # census arm priced six extra reductions at ~0.45 ns/spectrum
        # (docs/CENSUS_r05.json), fused into the elementwise pipeline.
        # Measured alternatives are no better or worse: ones-row MXU
        # dots are ~15 ns/spectrum SLOWER (fixed multi-pass issue cost
        # per small dot) and an explicit halving tree of block adds is
        # time-identical to jnp.sum.
        grows_scr[G_DPSI : G_DPSI + 1, :] += jnp.sum(
            dpsi_op, axis=0, keepdims=True
        )
        grows_scr[G_DOMEGA : G_DOMEGA + 1, :pb] += jnp.sum(
            dd_b * zdep_b, axis=0, keepdims=True
        )
        grows_scr[G_CNT : G_CNT + 1, :] += jnp.sum(m, axis=0, keepdims=True)
        # dtz is shared by the tau0 and beta rows; tau0 (a scalar) and the
        # dC0 negation are hoisted OUT of the plane products onto the
        # summed (1, PB) rows — three fewer (TB, PB) traversals
        dtz = dtau_hi * zp1b
        grows_scr[G_DT0 : G_DT0 + 1, :pb] += jnp.sum(
            dtz, axis=0, keepdims=True
        )
        grows_scr[G_DC0 : G_DC0 + 1, :pb] += -jnp.sum(
            droot2, axis=0, keepdims=True
        )
        grows_scr[G_DBETA : G_DBETA + 1, :pb] += tau0 * jnp.sum(
            dtz * log_zp1, axis=0, keepdims=True
        )
    if "xsums" in ablate:
        # census instrumentation (tools/vpu_census.py): SIX EXTRA sublane
        # reductions over planes that are all ALIVE and none of which is
        # summed anywhere else, so the compiler can neither DCE nor CSE
        # them away. This arm runs the FULL kernel plus these sums; its
        # marginal slowdown is a DCE-proof direct measurement of
        # sublane-reduction cost (the `gsums` removal arm above cannot
        # give that number — see the ABLATE_SECTIONS caveat).
        wb = dzdep.shape[1]
        grows_scr[G_DPSI : G_DPSI + 1, :] += jnp.sum(
            dd, axis=0, keepdims=True
        )
        grows_scr[G_CNT : G_CNT + 1, :] += jnp.sum(
            dw_pix, axis=0, keepdims=True
        )
        grows_scr[G_DOMEGA : G_DOMEGA + 1, :] += jnp.sum(
            du_pix, axis=0, keepdims=True
        )
        grows_scr[G_DT0 : G_DT0 + 1, :] += jnp.sum(
            q_row, axis=0, keepdims=True
        )
        grows_scr[G_DC0 : G_DC0 + 1, :wb] += jnp.sum(
            dzdep, axis=0, keepdims=True
        )
        grows_scr[G_DBETA : G_DBETA + 1, :wb] += jnp.sum(
            dtau_hi, axis=0, keepdims=True
        )


    # -- batch end: record the loss books, then update (or, in sync mode,
    # export the LAST batch's raw accumulators for the cross-device psum
    # instead of applying them locally) ---------------------------------------
    @pl.when(j == tpb - 1)
    def _batch_end():
        # per-batch loss output: [nll_sum, scalar_cnt, n_real, ...]
        # (pre-update sums; cols 8+ are scalar-gradient scratch)
        loss_ref[pl.ds(e * n_batches + i, 1), :] = small_scr[...]
        if not sync_grads:
            _finish_and_update()
        else:
            @pl.when(i < n_batches - 1)
            def _local_update():
                _finish_and_update()

            @pl.when(i == n_batches - 1)
            def _export_grads():
                gdrhst_out[...] = drhst_scr[...]
                ggrows_out[...] = grows_scr[...]
                gsmall_out[...] = small_scr[...]

    # -- launch end: write final state ---------------------------------------
    @pl.when(
        jnp.logical_and(
            e == n_epochs - 1,
            jnp.logical_and(i == n_batches - 1, j == tpb - 1),
        )
    )
    def _finalize():
        ft_out_ref[...] = rhst_scr[ntri : ntri + nh, :]
        mft_out_ref[...] = mft_scr[...]
        vft_out_ref[...] = vft_scr[...]
        rows_out_ref[...] = rows_scr[...]
        for k in range(9):
            scal_out_ref[0, k] = sc_scr[0, k]
        for k in range(9, 16):
            scal_out_ref[0, k] = 0.0


def zq_column(zqso: Array, weight: Array | None = None) -> Array:
    """Pack quasar redshifts into the kernel's ``derive_zabs`` column.

    Returns an ``(N, ZQ_LANES)`` float32 buffer whose lane 0 holds
    ``log1p(zqso)`` — everything the epoch kernel needs to rebuild the
    per-pixel absorber redshifts ``zabs = (1+zqso) lam/lam_lya - 1``
    (``/root/reference/QFA/dataloader.py:102``) in-kernel, in log form
    (512 B/spectrum instead of the 4*Npix-byte zabs plane: a ~15x cut in
    that array's HBM footprint and stream traffic at SDSS scale).

    Lane 1 carries the per-row weight (default 1 for every row): the
    epoch kernel's ``n_real`` counts weight-1 rows — matching the XLA
    engine even for real-but-fully-masked spectra — while zero padding
    rows (e.g. ``fit_pallas``'s batch-multiple padding) stay weight 0.
    """
    col = jnp.zeros((zqso.shape[0], ZQ_LANES), jnp.float32)
    col = col.at[:, 0].set(jnp.log1p(zqso.astype(jnp.float32)))
    w = (
        jnp.ones((zqso.shape[0],), jnp.float32)
        if weight is None
        else weight.astype(jnp.float32)
    )
    return col.at[:, 1].set(w)


def loglam_row(wav) -> Array:
    """Static ``log(lam / lam_lya)`` row for ``derive_zabs`` (float64 host
    math, cast once; red-side values are present but gated off in-kernel).
    With :func:`zq_column`, ``log(1 + zabs) = log1p(zqso) + loglam`` — the
    reference zabs relation ``/root/reference/QFA/dataloader.py:102`` as an
    outer add.
    """
    import numpy as np

    from ..data.grid import LYA_WAVELENGTH

    row = np.log(np.asarray(wav, np.float64) / LYA_WAVELENGTH)
    return jnp.asarray(row, jnp.float32)


def _validate_zq(zabs: Array, loglam, n: int) -> None:
    """Shared ABI guard for the ``derive_zabs`` mode of both kernels."""
    if loglam is None:
        raise ValueError("derive_zabs=True requires the loglam row")
    if zabs.ndim != 2 or zabs.shape[1] != ZQ_LANES:
        # exact lane match: a genuine zabs PLANE whose width happens to be
        # a 128-multiple must fail loudly here, not be misread as a column
        # (pixel-0 zabs silently treated as log1p(zqso))
        raise ValueError(
            f"derive_zabs=True expects the (N, {ZQ_LANES}) zq_column "
            f"buffer, got {zabs.shape}"
        )
    if zabs.shape[0] != n:
        # Pallas clamps out-of-range block indices, so a short column
        # would silently reuse the last tile's redshifts
        raise ValueError(
            f"zq column has {zabs.shape[0]} rows but the batch planes "
            f"have {n}"
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_batches", "n_epochs", "tile_batch", "tau_which", "reference_norm",
        "mxu_bf16", "interpret", "derive_zabs", "sync_grads",
        "tiles_per_batch", "ablate", "bwd_wide",
    ),
)
def fused_train_epoch(
    params: QFAParams,
    m: QFAParams,
    v: QFAParams,
    delta: Array,
    error: Array,
    zabs: Array,
    tile_perm: Array,
    mask: Array | None = None,
    *,
    epoch: Array,
    n_batches: int,
    n_epochs: int = 1,
    loglam: Array | None = None,
    derive_zabs: bool = False,
    tile_batch: int = 256,
    learning_rate: float = 1e-3,
    weight_decay: float = 0.1,
    decay_alpha: float = 0.9,
    decay_step: int = 10,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    bounds: ParamBounds = ParamBounds(),
    tau_which: str = "becker",
    reference_norm: bool = True,
    mxu_bf16: bool = False,
    bwd_wide: bool = False,
    interpret: bool = False,
    sync_grads: bool = False,
    tiles_per_batch: int | None = None,
    pending: tuple[Array, Array, Array] | None = None,
    apply_pending: Array | None = None,
    ablate: tuple = (),
) -> EpochOutputs:
    """Run one (or several) full training epochs in a single Pallas launch.

    With ``n_epochs > 1`` the grid gains a leading epoch axis: parameters
    and Adam moments stay resident in VMEM/SMEM scratch across ALL the
    epochs of the launch, amortizing the device's fixed per-dispatch cost
    (~0.6 ms on the target v5e — material against a ~9 ms SDSS epoch) and
    every per-epoch host-side packing kernel over the chunk. Per-epoch
    scheduled learning rate and Adam bias correction come from row ``e``
    of the hyper table (the reference's per-epoch counter semantics,
    ``/root/reference/QFA/optimizer.py:49-69``, hold exactly: epoch ``k``
    of the chunk uses counter ``epoch + k``). Epoch-BOUNDARY actions
    (smoothing, checkpointing, early stop, NaN rollback) cannot run inside
    a launch — callers chunk accordingly (``fit_pallas`` aligns chunks to
    those intervals).

    Args:
        params, m, v: current parameters and Adam moments.
        delta/error/zabs: resident dataset, (N, ...) with N divisible by
            ``tile_batch``; zabs is the (N, Nb) plane — or, with
            ``derive_zabs=True``, the (N, ZQ_LANES) :func:`zq_column`
            buffer. In plane mode fully-masked rows act as padding (they
            contribute nothing, including to ``n_real``); with
            ``derive_zabs`` the zq weight lane decides ``n_real``.
        mask: optional (N, Npix). When omitted, the kernel derives ``mask
            = error > 0`` on the fly (valid because the data layer
            sanitizes masked pixels to ``error == 0`` and ``delta == 0``)
            — saves a quarter of the resident footprint at survey scale
            for ~10% step time.
        loglam, derive_zabs: with ``derive_zabs=True`` the ``zabs``
            argument is instead the ``(N, lanes)`` :func:`zq_column`
            buffer (lane 0 = ``log1p(zqso)``) and ``loglam`` the static
            per-pixel ``log(lam/lam_lya)`` row (:func:`loglam_row`); the
            kernel rebuilds ``log(1 + zabs)`` as an outer add, eliminating
            the (N, Npix) zabs plane from HBM and every per-pixel
            pow/log transcendental.
        tile_perm: (N // tile_batch,) int32 permutation assigning data
            tiles to (batch, slot) positions — the epoch shuffle. With
            ``n_epochs > 1``: ``(n_epochs, N // tile_batch)`` (or the
            flattened concatenation), one permutation per epoch.
        epoch: int32 scalar — the reference's per-epoch Adam counter ``i``
            for the FIRST epoch of the launch (bias correction + LR
            schedule use ``epoch + 1``,
            ``/root/reference/QFA/optimizer.py:49-69``).
        n_batches: number of optimizer updates per epoch; batch size is
            ``(N // n_batches)`` rows = ``tpb`` tiles of ``tile_batch``.
        n_epochs: epochs executed inside this single launch.
        mxu_bf16: run the heavy in-kernel contractions (Gram/F projections
            and the four backward dots) as true bfloat16 MXU passes with
            f32 accumulation — ~2.5x their per-pass throughput on the v5e
            (~20% epoch time at the 65k SDSS headline) for a measured
            ~5e-7 relative loss-trajectory drift over tens of epochs.
            Loss bookkeeping, counts, the Cholesky/solve chain and the
            scalar-gradient lane sums stay f32. Off by default (the
            default engine is loss-curve-parity with the XLA path).
        bwd_wide: fuse the two backward cotangent contractions (dw_pix:
            K=ntri against the Gram rows; du_pix: K=nh against F) into
            ONE K=(ntri+nh) dot whose rhs is a block-diag
            ``[[gram, 0], [0, F]]`` scratch and whose (TB, 2P) output is
            ``[dw_pix | du_pix]``. Bitwise-identical results (the zero
            blocks contribute exact +0.0 terms) but measured
            speed-NEUTRAL in-kernel (1.005x f32 / 1.007x bf16,
            docs/BWDWIDE_r05.json): the dots' ~3.7-3.9 us cost is
            output-pass-bound, so the fused (TB, 2P) output pays the
            same as two (TB, P) outputs. Kept as a tested alternate
            lowering — the experiment that PROVED the two-dot path
            saturated (docs/CENSUS_r05.json dwdot/dudot,
            docs/KDEPTH_r05.json).
        ablate: timing-census instrumentation ONLY (tools/vpu_census.py):
            kernel sections from :data:`ABLATE_SECTIONS` to stub out with
            shape-preserving constants. Ablated kernels return garbage
            numerics by design; every production path passes ``()``.

    ``sync_grads`` (the exact-DP window mode, ``parallel.sync_dp``): the
    launch covers only the WINDOW of batches named by ``tile_perm``
    (``tiles_per_batch`` tiles each; perm values are absolute tile indices
    into the full resident arrays). The psum'd ``pending`` accumulators of
    the previous window's last batch are applied at launch start when
    ``apply_pending > 0`` — via the very same in-kernel epilogue a plain
    epoch uses — and the LAST batch of this window exports its raw
    accumulators (``SyncEpochOutputs.drhst/grows/small``) for the next
    cross-device psum instead of updating locally. With ``n_batches == 1``
    no local update ever happens: every optimizer step consumes globally
    summed gradients — trajectory-exact data parallelism at one kernel
    launch + one collective per batch.

    Returns:
        ``loss_sums``/``n_real`` are ``(n_batches,)`` when ``n_epochs ==
        1`` (the historical shape) and ``(n_epochs, n_batches)`` otherwise.
        ``SyncEpochOutputs`` when ``sync_grads``.
    """
    npix, nh = params.F.shape
    nb = params.omega.shape[0]
    n = delta.shape[0]
    tb = tile_batch
    if n % tb:
        raise ValueError(f"dataset rows {n} not divisible by tile {tb}")
    n_tiles = n // tb
    if tiles_per_batch is not None:
        tpb = tiles_per_batch
    else:
        if n_tiles % n_batches:
            raise ValueError(
                f"{n_tiles} tiles not divisible by {n_batches} batches"
            )
        tpb = n_tiles // n_batches
    if n_epochs < 1:
        raise ValueError(f"n_epochs must be >= 1, got {n_epochs}")
    if sync_grads:
        if n_epochs != 1:
            raise ValueError("sync_grads windows are single-epoch")
        if pending is None or apply_pending is None:
            raise ValueError(
                "sync_grads=True requires pending=(drhst, grows, small) "
                "and apply_pending (pass zeros + 0.0 on the first window)"
            )
    tile_perm = tile_perm.reshape(-1)
    if tile_perm.shape[0] != n_epochs * n_batches * tpb:
        raise ValueError(
            f"tile_perm has {tile_perm.shape[0]} entries; expected "
            f"n_epochs*n_batches*tiles_per_batch = "
            f"{n_epochs}*{n_batches}*{tpb}"
        )
    # rc is the SUBLANE dim of the contraction matrix (8-multiple suffices;
    # 128 would pad the rows to 128 of wasted MXU work per dot). The Gram
    # block stores only its lower triangle (symmetric): nh(nh+1)/2 rows.
    ntri = nh * (nh + 1) // 2
    p, rc = _round_up(npix, 128), _round_up(ntri + nh + 1, 8)
    f32 = jnp.float32

    # Alignment/VMEM guard BEFORE tracing the kernel: interpret-mode CI
    # cannot see Mosaic lowering failures, so the constraints are encoded
    # explicitly here (ops.validate) and raised as actionable errors.
    from .validate import validate_epoch_kernel

    rc2 = _round_up(ntri + nh, 8)  # bwd_wide block-diag rhs sublanes
    _streamed_planes = [delta, error]
    if not derive_zabs:
        _streamed_planes.append(zabs)
    if mask is not None:
        _streamed_planes.append(mask)
    validate_epoch_kernel(
        nh=nh, tile_batch=tb, p_lanes=p, rc=rc, n_batches=n_batches,
        n_epochs=n_epochs, streams=len(_streamed_planes),
        zq_lanes=ZQ_LANES if derive_zabs else None,
        bf16_streams=sum(
            1 for x in _streamed_planes if x.dtype == jnp.bfloat16
        ),
        wide_rows=rc2 if bwd_wide else 0,
        interpret=interpret,
    )

    def pad_px(x, width):
        # bfloat16 planes stream as-is (the kernel casts tiles to f32);
        # everything else is canonicalized to f32
        dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else f32
        if x.shape[-1] == width and x.dtype == dt:
            return x  # already padded by the caller: no copy at survey scale
        return jnp.pad(
            x.astype(dt), [(0, 0)] * (x.ndim - 1) + [(0, width - x.shape[-1])]
        )

    delta = pad_px(delta, p)
    error = pad_px(error, p)
    if derive_zabs:
        _validate_zq(zabs, loglam, n)
        zabs_p = zabs.astype(f32)
        loglam_p = jnp.zeros((1, p), f32).at[0, :npix].set(
            loglam.astype(f32)
        )
    else:
        if zabs.shape[-1] not in (nb, npix, p):
            raise ValueError(
                f"zabs plane width {zabs.shape[-1]} matches neither Nb="
                f"{nb} nor Npix={npix}; if this is a zq_column buffer, "
                "pass derive_zabs=True (and loglam)"
            )
        zabs_p = pad_px(zabs, p)
        loglam_p = None
    mask_p = pad_px(mask, p) if mask is not None else None

    ft0 = jnp.pad(params.F.astype(f32), ((0, p - npix), (0, 0))).T
    mft0 = jnp.pad(m.F.astype(f32), ((0, p - npix), (0, 0))).T
    vft0 = jnp.pad(v.F.astype(f32), ((0, p - npix), (0, 0))).T

    def row(x, width=None):
        width = npix if width is None else width
        return jnp.zeros((p,), f32).at[:width].set(x.astype(f32))

    rows0 = jnp.stack(
        [
            row(params.Psi),
            row(params.omega, nb),
            row(m.Psi),
            row(v.Psi),
            row(m.omega, nb),
            row(v.omega, nb),
            jnp.zeros((p,), f32),
            jnp.zeros((p,), f32),
        ]
    )
    blue0 = jnp.zeros((p,), f32).at[:nb].set(1.0)[None, :]

    # per-epoch scheduled LR + bias correction (reference per-epoch step):
    # one hyper-table row per epoch of the launch, counter epoch+k for row k
    ep = jnp.asarray(epoch, jnp.int32) + jnp.arange(n_epochs, dtype=jnp.int32)
    t = (ep + 1).astype(f32)
    lr = learning_rate * decay_alpha ** ((ep + 1) // decay_step)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    law_a, law_b, law_c = tau_law_abc(tau_which)
    hyper_list = [0.0] * 24
    hyper_list[H_LAW_A], hyper_list[H_LAW_B], hyper_list[H_LAW_C] = (
        law_a, law_b, law_c,
    )
    hyper_list[H_EPS], hyper_list[H_WD] = eps, weight_decay
    hyper_list[H_B1], hyper_list[H_B2] = b1, b2
    hyper_list[H_VMIN], hyper_list[H_VMAX] = bounds.var_min, bounds.var_max
    hyper_list[H_T0MIN], hyper_list[H_T0MAX] = bounds.tau0_min, bounds.tau0_max
    hyper_list[H_BMIN], hyper_list[H_BMAX] = bounds.beta_min, bounds.beta_max
    hyper_list[H_CMIN], hyper_list[H_CMAX] = bounds.c0_min, bounds.c0_max
    hyper_list[H_REFNORM] = 1.0 if reference_norm else 0.0
    hyper = jnp.tile(jnp.asarray([hyper_list], f32), (n_epochs, 1))
    hyper = hyper.at[:, H_LR].set(lr.astype(f32))
    hyper = hyper.at[:, H_BC1].set(bc1)
    hyper = hyper.at[:, H_BC2].set(bc2)

    scal0 = jnp.zeros((1, 16), f32)
    for slot, val in (
        (S_T0, params.tau0), (S_C0, params.c0), (S_BETA, params.beta),
        (S_MT0, m.tau0), (S_MC0, m.c0), (S_MBETA, m.beta),
        (S_VT0, v.tau0), (S_VC0, v.c0), (S_VBETA, v.beta),
    ):
        scal0 = scal0.at[0, slot].set(jnp.asarray(val, f32))

    bad = set(ablate) - set(ABLATE_SECTIONS)
    if bad:
        raise ValueError(
            f"unknown ablate sections {sorted(bad)}; valid: "
            f"{ABLATE_SECTIONS} (timing-census instrumentation only)"
        )
    if bwd_wide and ({"dwdot", "dudot"} & set(ablate)):
        raise ValueError(
            "the dwdot/dudot census splits measure the TWO-dot backward "
            "path; with bwd_wide there is a single fused contraction — "
            "ablate 'bwddots' instead"
        )
    if "xsums" in ablate and len(ablate) > 1:
        raise ValueError(
            "'xsums' is an ADDITIVE census arm (full kernel + six extra "
            "reductions over the live backward planes); combining it "
            "with removal sections would measure against a kernel whose "
            "operand planes are stubbed or dead — run it alone"
        )
    kernel = functools.partial(
        _epoch_kernel, nh=nh, tb=tb, tpb=tpb, n_batches=n_batches,
        n_epochs=n_epochs, derive_mask=mask is None, derive_zabs=derive_zabs,
        pb=min(_round_up(nb, 128), p), p_lanes=p, mxu_bf16=mxu_bf16,
        sync_grads=sync_grads, bwd_wide=bwd_wide, ablate=frozenset(ablate),
    )
    # per-epoch stride through the (flattened) perm; == n_tiles for whole
    # epochs, n_batches*tpb for sync windows (perm VALUES stay absolute
    # tile indices into the full resident arrays either way)
    stride = n_batches * tpb
    tile_spec = pl.BlockSpec(
        (tb, p), lambda e, i, j, perm: (perm[e * stride + i * tpb + j], 0),
        memory_space=pltpu.VMEM,
    )
    z_spec = tile_spec if not derive_zabs else pl.BlockSpec(
        (tb, zabs_p.shape[1]),
        lambda e, i, j, perm: (perm[e * stride + i * tpb + j], 0),
        memory_space=pltpu.VMEM,
    )

    whole = lambda shape: pl.BlockSpec(
        shape, lambda e, i, j, perm: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_epochs, n_batches, tpb),
        in_specs=[
            pl.BlockSpec((n_epochs, 24), lambda e, i, j, perm: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), lambda e, i, j, perm: (0, 0),
                         memory_space=pltpu.SMEM),
            tile_spec,  # delta
            tile_spec,  # error
            z_spec,  # zabs plane, or the zq column when derive_zabs
            *([] if mask_p is None else [tile_spec]),  # mask
            whole((nh, p)),  # ft0
            whole((nh, p)),  # mft0
            whole((nh, p)),  # vft0
            whole((8, p)),  # rows0
            whole((1, p)),  # blue
            *([] if loglam_p is None else [whole((1, p))]),  # loglam
            *([] if not sync_grads else [
                whole((rc, p)),  # pending drhst
                whole((8, p)),  # pending grows
                whole((1, 128)),  # pending small
            ]),
        ],
        out_specs=[
            # whole-array block: rows written at dynamic offsets per batch
            pl.BlockSpec(
                (n_epochs * n_batches, 128), lambda e, i, j, perm: (0, 0),
                memory_space=pltpu.VMEM,
            ),  # per-(epoch, batch) loss
            whole((nh, p)),  # ft_out
            whole((nh, p)),  # mft_out
            whole((nh, p)),  # vft_out
            whole((8, p)),  # rows_out
            pl.BlockSpec((1, 16), lambda e, i, j, perm: (0, 0),
                         memory_space=pltpu.SMEM),  # scal_out
            *([] if not sync_grads else [
                whole((rc, p)),  # raw drhst of the last batch
                whole((8, p)),  # raw grows
                whole((1, 128)),  # raw small
            ]),
        ],
        scratch_shapes=[
            pltpu.VMEM((rc, p), f32),  # rhs_t
            pltpu.VMEM((rc, p), f32),  # drhs_t
            pltpu.VMEM((nh, p), f32),  # m_F
            pltpu.VMEM((nh, p), f32),  # v_F
            pltpu.VMEM((8, p), f32),  # rows
            pltpu.VMEM((8, p), f32),  # grows
            pltpu.VMEM((1, 128), f32),  # small
            pltpu.SMEM((1, 16), f32),  # scalar state
            # block-diag [[gram, 0], [0, F]] backward rhs (bwd_wide)
            *([pltpu.VMEM((rc2, 2 * p), f32)] if bwd_wide else []),
        ],
    )

    out_shape = [
        jax.ShapeDtypeStruct((n_epochs * n_batches, 128), f32),
        jax.ShapeDtypeStruct((nh, p), f32),
        jax.ShapeDtypeStruct((nh, p), f32),
        jax.ShapeDtypeStruct((nh, p), f32),
        jax.ShapeDtypeStruct((8, p), f32),
        jax.ShapeDtypeStruct((1, 16), f32),
    ]
    pend_args: list = []
    if sync_grads:
        hyper = hyper.at[0, H_APPLY].set(
            jnp.asarray(apply_pending, f32).reshape(())
        )
        pd, pg, ps = pending
        for buf, shape, name in (
            (pd, (rc, p), "drhst"), (pg, (8, p), "grows"),
            (ps, (1, 128), "small"),
        ):
            if buf.shape != shape:
                raise ValueError(
                    f"pending {name} has shape {buf.shape}, expected "
                    f"{shape}"
                )
        pend_args = [pd.astype(f32), pg.astype(f32), ps.astype(f32)]
        out_shape += [
            jax.ShapeDtypeStruct((rc, p), f32),
            jax.ShapeDtypeStruct((8, p), f32),
            jax.ShapeDtypeStruct((1, 128), f32),
        ]
    losses, ft_out, mft_out, vft_out, rows_out, scal_out, *gout = (
        pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
            interpret=interpret,
        )(
            tile_perm.astype(jnp.int32),
            hyper, scal0, delta, error, zabs_p,
            *([] if mask_p is None else [mask_p]),
            ft0, mft0, vft0, rows0, blue0,
            *([] if loglam_p is None else [loglam_p]),
            *pend_args,
        )
    )

    def unrow(arr, r, width=None):
        return arr[r, : (npix if width is None else width)]

    params_out = QFAParams(
        F=ft_out[:, :npix].T,
        Psi=unrow(rows_out, R_PSI),
        omega=unrow(rows_out, R_OMEGA, nb),
        tau0=scal_out[0, S_T0],
        c0=scal_out[0, S_C0],
        beta=scal_out[0, S_BETA],
    )
    m_out = QFAParams(
        F=mft_out[:, :npix].T,
        Psi=unrow(rows_out, R_MPSI),
        omega=unrow(rows_out, R_MOMEGA, nb),
        tau0=scal_out[0, S_MT0],
        c0=scal_out[0, S_MC0],
        beta=scal_out[0, S_MBETA],
    )
    v_out = QFAParams(
        F=vft_out[:, :npix].T,
        Psi=unrow(rows_out, R_VPSI),
        omega=unrow(rows_out, R_VOMEGA, nb),
        tau0=scal_out[0, S_VT0],
        c0=scal_out[0, S_VC0],
        beta=scal_out[0, S_VBETA],
    )
    loss_sums, n_real_out = losses[:, 0], losses[:, 2]
    if n_epochs > 1:
        loss_sums = loss_sums.reshape(n_epochs, n_batches)
        n_real_out = n_real_out.reshape(n_epochs, n_batches)
    if sync_grads:
        return SyncEpochOutputs(
            params=params_out,
            m=m_out,
            v=v_out,
            loss_sums=loss_sums,
            n_real=n_real_out,
            drhst=gout[0],
            grows=gout[1],
            small=gout[2],
        )
    return EpochOutputs(
        params=params_out,
        m=m_out,
        v=v_out,
        loss_sums=loss_sums,
        n_real=n_real_out,
    )
