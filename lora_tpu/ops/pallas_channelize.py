"""Fused polyphase-filterbank Pallas TPU kernel (the config-3 front-end).

The XLA channelizer (ops/channelizer.py) is already one block-Toeplitz
contraction, but its operand pipeline costs three HBM materializations per
block: the flipped commutator Xrev (a lane-reversed reshape), the grouped
matmul operand Z (a pad + multi-piece lane concat), and the [.., M, K] ->
[.., K, M] output transpose.  Round-2/3 roofline runs measured the whole
stage at ~0.5-1 Gsamp/s — bound by those data movements, not the matmul
(the MXU ran at <1 TFLOP/s).

This kernel removes the operand pipeline entirely with one observation:
fold the commutator's per-block lane flip INTO the constant filterbank
matrix.  With

    WB'[r*K + p, j*K + k] = WB[r*K + (K-1-p), j*K + k]

(WB = ops/channelizer._fir_idft_matrix), the matmul operand becomes

    Z'[q, :] = xp[q*G*K : q*G*K + R*K]          (R = L + G - 1)

— a CONTIGUOUS window of the raw input stream with stride G*K.  Windows
at stride G*K overlapping by (L-1)*K <= G*K are two sublane-adjacent rows
of the contiguous (nseg, G*K) reshape, so each grid cell:

  1. loads a (TQ, SEG) block of the reshaped input plus one lookahead row
     (SEG = G*K),
  2. forms the shifted view z1 = rows 1..TQ through a VMEM scratch
     (static sublane slices, the proven pattern of ops/pallas_demod),
  3. computes y = z0 @ W1 + z1 @ W2 as complex MXU matmuls, where
     W1 = WB'[:SEG] and W2 is WB'[SEG:R*K] zero-padded to SEG rows —
     no lane concat, no gather, no flip,
  4. writes the (TQ, SEG) output block, which reshapes (outside, for
     free) to [.., M, K] channel-minor samples.

Per block the kernel reads the input once and writes the output once; the
only remaining HBM pass outside it is the [.., M, K] -> [.., K, M] corner
turn into the demod bank's channel-major layout.

Numerics: identical contraction graph to cplx.matmul up to f32 summation
order (the zero rows of W2 contribute exact zeros); parity with the XLA
path is asserted to ~1e-5 relative in tests/test_pallas_channelize.py and
on hardware in tools/tpu_smoke.py.  bf16=True casts the MXU operands to
bfloat16 with f32 accumulation (same contract as channelize(bf16=True)).

Reference scope: the reference is single-channel (SURVEY.md §2.2); the
channelizer is the TPU build's wideband front-end (BASELINE.json config 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cplx
from .cplx import IQ
from .channelizer import _fir_idft_matrix
from .pallas_detect import _mxu_dot

# widest matmul block: SEG = G*K lanes; 1024 keeps the four (SEG, SEG)
# filter constants at <= 16 MB of VMEM
_MAX_SEG = 1024


@functools.lru_cache(maxsize=None)
def kernel_geometry(K: int, taps_per_phase: int) -> tuple[int, int] | None:
    """(G, SEG) for the fused filterbank kernel, or None when the geometry
    doesn't fit: the two-row window trick needs (L-1)*K <= SEG (one
    lookahead row covers the overlap) and SEG % 128 == 0 (lane-aligned
    MXU blocks) with SEG <= _MAX_SEG."""
    L = taps_per_phase
    G = max(512 // K, L - 1, 1)
    seg = G * K
    if seg % 128 or seg > _MAX_SEG or (L - 1) * K > seg:
        return None
    return G, seg


@functools.lru_cache(maxsize=None)
def _wb_flipped(K: int, taps_per_phase: int, G: int):
    """(W1re, W1im, W2re, W2im) numpy [SEG, SEG]: the flip-folded
    filterbank matrix split into the z0/z1 row blocks (W2 zero-padded)."""
    wbr, wbi = _fir_idft_matrix(K, taps_per_phase, G)
    R = taps_per_phase + G - 1
    seg = G * K
    idx = np.arange(R * K).reshape(R, K)[:, ::-1].reshape(-1)
    wbr, wbi = wbr[idx], wbi[idx]
    w2r = np.zeros((seg, seg), np.float32)
    w2i = np.zeros((seg, seg), np.float32)
    w2r[: R * K - seg] = wbr[seg:]
    w2i[: R * K - seg] = wbi[seg:]
    return wbr[:seg].copy(), wbi[:seg].copy(), w2r, w2i


def _fb_kernel_factory(TQ, SEG, bf16):
    if bf16:
        dot = _mxu_dot(True)
    else:
        # explicit HIGHEST: the MXU's DEFAULT f32 matmul is a single bf16
        # pass (~1e-3 relative), but f32 mode must match the XLA path's
        # cplx.matmul(precision=HIGHEST) — channel outputs feed the demod's
        # dB-domain squelch, where a silent precision drop is a behavioral
        # change, not just noise
        dot = lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def kernel(ar, ai, nr, ni, w1r, w1i, w2r, w2i, outr, outi, sr, si):
        sr[0:TQ, :] = ar[:]
        si[0:TQ, :] = ai[:]
        sr[TQ : TQ + 8, :] = nr[:]
        si[TQ : TQ + 8, :] = ni[:]
        z0r, z0i = ar[:], ai[:]
        z1r = sr[1 : TQ + 1, :]
        z1i = si[1 : TQ + 1, :]
        yr = (
            dot(z0r, w1r[:]) - dot(z0i, w1i[:])
            + dot(z1r, w2r[:]) - dot(z1i, w2i[:])
        )
        yi = (
            dot(z0r, w1i[:]) + dot(z0i, w1r[:])
            + dot(z1r, w2i[:]) + dot(z1i, w2r[:])
        )
        outr[:] = yr
        outi[:] = yi

    return kernel


@functools.partial(
    jax.jit, static_argnames=("K", "taps_per_phase", "M", "interpret", "bf16")
)
def _filterbank(xp: IQ, K: int, taps_per_phase: int, M: int,
                interpret: bool, bf16: bool):
    """xp: IQ [S, P] state-prepended wideband blocks (P >= (M+L-1)*K) ->
    y IQ [S, M, K] channelized samples, channel-minor.

    Layout note: blocks are strictly 2-D — the per-stream segment rows are
    flattened to (S * nsegp, SEG) with nsegp a multiple of TQ, so every
    stream starts on a block boundary and the index maps stay integral.
    (3-D blocks with a leading singleton work on Mosaic but run the Pallas
    interpreter orders of magnitude slower, which the CPU test tier pays.)"""
    S, P = xp.shape
    L = taps_per_phase
    G, SEG = kernel_geometry(K, taps_per_phase)
    Q = -(-M // G)
    TQ = next(t for t in (256, 128, 64, 32, 16, 8) if t <= max(Q, 8))
    Qp = -(-Q // TQ) * TQ
    nsegp = Qp + TQ  # >= Qp + 8 lookahead rows; stream stride stays
    # TQ-aligned so each (s, i) block is whole-block addressable
    need = nsegp * SEG
    if P < need:
        xp = cplx.pad(xp, ((0, 0), (0, need - P)))
    x2 = xp[:, :need].reshape(S * nsegp, SEG)
    w1r, w1i, w2r, w2i = _wb_flipped(K, taps_per_phase, G)
    nb = nsegp // TQ
    blk = lambda s, i: (s * nb + i, 0)
    nxt = lambda s, i: ((s * nsegp + (i + 1) * TQ) // 8, 0)
    ob = Qp // TQ
    out_blk = lambda s, i: (s * ob + i, 0)
    const = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((TQ, SEG), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((TQ, SEG), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, SEG), nxt, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, SEG), nxt, memory_space=pltpu.VMEM),
        const((SEG, SEG)),
        const((SEG, SEG)),
        const((SEG, SEG)),
        const((SEG, SEG)),
    ]
    out_spec = pl.BlockSpec((TQ, SEG), out_blk, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S, Qp // TQ),
        in_specs=in_specs,
        out_specs=[out_spec] * 2,
        scratch_shapes=[pltpu.VMEM((TQ + 8, SEG), jnp.float32)] * 2,
    )
    yr, yi = pl.pallas_call(
        _fb_kernel_factory(TQ, SEG, bf16),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((S * Qp, SEG), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * 2 * S * Qp * SEG * SEG,
            bytes_accessed=S * nsegp * SEG * 8 + S * Qp * SEG * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2.re, x2.im, x2.re, x2.im, jnp.asarray(w1r), jnp.asarray(w1i),
      jnp.asarray(w2r), jnp.asarray(w2i))
    cut = lambda a: a.reshape(S, Qp * G, K)[:, :M]
    return IQ(cut(yr), cut(yi))


def filterbank(xp, K: int, taps_per_phase: int, M: int,
               interpret: bool = False, bf16: bool = False) -> IQ:
    """Fused filterbank: state-prepended wideband xp (IQ [..., P],
    P >= (M + taps_per_phase - 1) * K) -> IQ [..., M, K] channelized
    samples (channel-MINOR; the caller corner-turns to [..., K, M]).
    Value-equal (f32 summation order aside) to the XLA pipeline in
    ops/channelizer.channelize; use when kernel_geometry(K, L) is not
    None."""
    xp = cplx.as_iq(xp)
    *lead, P = xp.shape
    S = int(np.prod(lead)) if lead else 1
    y = _filterbank(xp.reshape(S, P), K, taps_per_phase, M, interpret, bf16)
    return y.reshape(*lead, M, K)


# --------------------------------------------------------------------------
# factorized FIR + IDFT filterbank (round-5): the banded replacement for
# the dense block-Toeplitz form above
# --------------------------------------------------------------------------
#
# The two-matmul kernel above contracts 2*SEG = 2*G*K rows per G*K output
# lanes — 8*2*G*K / G ~ 8192 flops per wide sample at K=64, of which half
# land on structural zero blocks (the band occupies L of 2G block rows)
# and the rest recompute the IDFT under every tap.  The filterbank is
# separable, and the factorized form pays the true cost:
#
#   u[m, q] = sum_l H'[l, q] * x2[m + L-1 - l, q]     (per-lane FIR, VPU,
#                                                      2*2*L = 32 flops)
#   y[k, m] = sum_q W'[q, k] * u[m, q]                (K-point IDFT, MXU,
#                                                      4*2*K = 512 flops)
#
# with x2 the CONTIGUOUS (rows, K) reshape of the state-prepended stream,
# H'[l, q] = H[l, K-1-q] and W'[q, k] = W[K-1-q, k] (the commutator's
# lane flip folded into the constants, exactly as the dense kernel folds
# it into WB).  The IDFT runs TRANSPOSED — dot_general contracting both
# operands' lane axes, (K, K) x (TM, K) -> (K, TM) — so each grid cell
# writes a CHANNEL-MAJOR (K, TM) block: the [.., M, K] -> [.., K, M]
# corner-turn the dense kernel leaves to XLA (a full HBM pass) never
# happens.  ~15x fewer flops and one less memory pass than the dense
# form; algebraically identical up to f32 summation order.
#
# Reference scope: as above — the reference is single-channel
# (SURVEY.md §2.2); this is the TPU build's wideband front-end.

_FIR_MAX_K = 256


@functools.lru_cache(maxsize=None)
def fir_geometry(K: int, taps_per_phase: int) -> bool:
    """True when the factorized FIR+IDFT kernel handles (K, L): lanes wide
    enough for the VPU/MXU (K >= 64), constants within VMEM sanity
    (K <= 256), and the FIR taps within the 8-row constant block /
    lookahead (L <= 8; longer prototypes fall back to the dense kernel
    or the XLA pipeline)."""
    return 64 <= K <= _FIR_MAX_K and K % 64 == 0 and taps_per_phase <= 8


@functools.lru_cache(maxsize=None)
def _fir_idft_consts(K: int, taps_per_phase: int):
    """(H' [8, K], W_big [2K, 2K]) numpy: flip-folded FIR taps
    (zero-padded to 8 rows) and the complex IDFT as ONE stacked real
    matrix in the TRANSPOSED dot's layout.

    With Wt[k, q] = W[K-1-q, k] = W[k, K-1-q] (IDFT symmetry) and the
    kernel's concatenated operand u_cat[m] = [ur[m,:], ui[m,:]]:

        W_big = [[ Wt_re, -Wt_im ],     dotT(W_big, u_cat) -> [2K, TM]:
                 [ Wt_im,  Wt_re ]]     rows :K = Re(y)^T, K: = Im(y)^T

    One dot with a 2K-deep contraction (128 at K=64 — exactly the MXU's
    native depth) replaces four K-deep dots: measured 1.45 -> multi
    TFLOP/s on the v5e (the four narrow transposed dots were the
    kernel's bound, bf16 didn't move them)."""
    from .channelizer import prototype, _idft_k

    L = taps_per_phase
    H = prototype(K, taps_per_phase).reshape(L, K)
    hp = np.zeros((8, K), np.float32)
    hp[:L] = H[:, ::-1]
    wre, wim = _idft_k(K)
    wtr = wre[:, ::-1]
    wti = wim[:, ::-1]
    wb = np.zeros((2 * K, 2 * K), np.float32)
    wb[:K, :K] = wtr
    wb[:K, K:] = -wti
    wb[K:, :K] = wti
    wb[K:, K:] = wtr
    return hp, wb


def _fir_kernel_factory(TM, K, L, bf16):
    if bf16:
        cast = lambda a: a.astype(jnp.bfloat16)
    else:
        cast = lambda a: a
    dotT = lambda a, b: jax.lax.dot_general(
        cast(a), cast(b), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=None if bf16 else jax.lax.Precision.HIGHEST,
    )

    def kernel(ar, ai, nr, ni, hc, wb, outr, outi, sr, si):
        sr[0:TM, :] = ar[:]
        si[0:TM, :] = ai[:]
        sr[TM : TM + 8, :] = nr[:]
        si[TM : TM + 8, :] = ni[:]
        # per-lane FIR: u[m] = sum_l H'[l] * rows[m + L-1-l] — L static
        # sublane slices of the scratch, VPU multiply-accumulate
        h0 = hc[L - 1, :][None, :]
        ur = h0 * sr[0:TM, :]
        ui = h0 * si[0:TM, :]
        for l in range(L - 2, -1, -1):
            d = L - 1 - l
            hl = hc[l, :][None, :]
            ur = ur + hl * sr[d : d + TM, :]
            ui = ui + hl * si[d : d + TM, :]
        # transposed K-point IDFT as ONE stacked real dot (2K-deep
        # contraction, _fir_idft_consts): [2K, 2K] x [TM, 2K]^T ->
        # [2K, TM]; rows :K are Re(y)^T, K: are Im(y)^T — channel-major
        # output blocks (no corner-turn downstream)
        res = dotT(wb[:], jnp.concatenate([ur, ui], 1))
        outr[:] = res[:K]
        outi[:] = res[K:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("K", "taps_per_phase", "M", "interpret", "bf16")
)
def _filterbank_fir(xp: IQ, K: int, taps_per_phase: int, M: int,
                    interpret: bool, bf16: bool):
    """xp: IQ [S, P] state-prepended wideband blocks (P >= (M+L-1)*K) ->
    y IQ [S, K, M] channelized samples, CHANNEL-MAJOR."""
    S, P = xp.shape
    L = taps_per_phase
    TM = next(t for t in (512, 256, 128, 64, 32, 16, 8) if t <= max(M, 8))
    Mp = -(-M // TM) * TM
    rows_p = Mp + TM  # per-stream row stride: TM-aligned, covers the
    # Mp + L - 1 FIR rows (L - 1 <= 8 <= TM lookahead)
    need = rows_p * K
    if P < need:
        xp = cplx.pad(xp, ((0, 0), (0, need - P)))
    x2 = xp[:, :need].reshape(S * rows_p, K)
    hp, wb = _fir_idft_consts(K, taps_per_phase)
    nb = rows_p // TM
    blk = lambda s, i: (s * nb + i, 0)
    nxt = lambda s, i: ((s * rows_p + (i + 1) * TM) // 8, 0)
    ob = Mp // TM
    const = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((TM, K), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((TM, K), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, K), nxt, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, K), nxt, memory_space=pltpu.VMEM),
        const((8, K)),
        const((2 * K, 2 * K)),
    ]
    out_spec = pl.BlockSpec(
        (K, TM), lambda s, i: (s, i), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S, ob),
        in_specs=in_specs,
        out_specs=[out_spec] * 2,
        scratch_shapes=[pltpu.VMEM((TM + 8, K), jnp.float32)] * 2,
    )
    yr, yi = pl.pallas_call(
        _fir_kernel_factory(TM, K, L, bf16),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((S * K, Mp), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=S * Mp * K * (8 * K + 4 * L),
            bytes_accessed=S * rows_p * K * 8 + S * K * Mp * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2.re, x2.im, x2.re, x2.im, jnp.asarray(hp), jnp.asarray(wb))
    cut = lambda a: a.reshape(S, K, Mp)[:, :, :M]
    return IQ(cut(yr), cut(yi))


def filterbank_fir(xp, K: int, taps_per_phase: int, M: int,
                   interpret: bool = False, bf16: bool = False) -> IQ:
    """Factorized FIR+IDFT filterbank: state-prepended wideband xp
    (IQ [..., P], P >= (M + taps_per_phase - 1) * K) -> IQ [..., K, M]
    channelized samples, CHANNEL-MAJOR (ready for the demod bank; no
    corner-turn).  Value-equal (f32 summation order aside) to the XLA
    pipeline / dense kernel; use when fir_geometry(K, L) holds."""
    xp = cplx.as_iq(xp)
    *lead, P = xp.shape
    S = int(np.prod(lead)) if lead else 1
    y = _filterbank_fir(
        xp.reshape(S, P), K, taps_per_phase, M, interpret, bf16
    )
    return y.reshape(*lead, K, M)
