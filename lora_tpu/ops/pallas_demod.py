"""Fused demodulator-stage Pallas TPU kernels.

Round-1 profiling (docs/SCALING.md) showed the demodulator spending most of
its non-dispatch time between kernels, not inside them: the payload path
materialized gathered rows, a shifted copy, and the detector input through
HBM three times, and the 13-step sync scan ran as ~26 sequential XLA
launches.  This module fuses both stages:

  * :func:`payload_detect` — one kernel turns aligned N-sample rows into
    detected payload symbols: per-channel sub-window roll (the
    ``data_start % N`` alignment), dechirp + fine-CFO derotation, DFT (MXU
    matmuls), and peak search, all in VMEM.  Replaces the
    ops/shift.py -> ops/pallas_detect.py pair with a single pass: HBM
    traffic drops from ~5 row-array movements to 1 read.
  * :func:`track` — one kernel runs the whole FRAMESYNC-equivalent
    tracking stage per channel: sub-window roll of the 17 aligned scan
    windows, the MAX_SYNC_SEARCH-step sync-word scan with two-symbol
    lookahead and fine-CFO integration (LoRaDemod.cpp:183-237), the
    downchirp pair -> coarse CFO (:246-265), entirely in VMEM with
    per-channel state carried in vector registers.  Replaces ~26
    dependent XLA dispatches with one launch.

Both stages also have DIRECT (gather-free) variants —
:func:`payload_detect_direct` and :func:`track_direct` — that read the
whole [B, W, N] row view of the channel buffer (CSE'd with the coarse
detector's operand) and select each channel's rows in VMEM via a
scalar-prefetched dynamic sublane slice, so the gathered intermediates
never exist in HBM at all.  They route automatically for single-frame
banks whose geometry fits (payload_direct_pc / track_direct_tc).

All kernels reuse the in-kernel DFT/peak helpers from ops/pallas_detect
(direct matrix for N <= 256, four-step 128 x n2 factorization above), so
detector arithmetic is identical to the batched detector's.

Reference behavior preserved: LoRaDemod.cpp:145-327 (FSM states), quirks
documented in models/demodulator.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cplx
from .chirp import _dechirp_table_np
from .cplx import IQ
from .fft import _dft_matrix_np, _twiddle_np
from .pallas_detect import (
    MAX_DENSE_BF16_N,
    MAX_DIRECT_N,
    direct_vals,
    four_step_vals,
    supported,
)

N_SCAN = 13          # MAX_SYNC_SEARCH in models/demodulator.py
N_TRACK_WIN = N_SCAN + 4   # scan + 2 downchirps + quarter margin
TRACK_ROWS = N_TRACK_WIN + 1  # aligned rows needed (one extra for the roll)


# --------------------------------------------------------------------------
# geometry helpers (static; shared by both jit backends so clipping bounds
# and golden outputs stay bit-identical across CPU/TPU paths)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def payload_geometry(N: int, mtu: int) -> tuple[int, int, int]:
    """(windows_per_tile, tiles, gathered_rows) for the TILED payload
    kernel (one channel per grid cell, TWM windows per tile).

    The kernel processes TWM windows per grid cell; window w needs aligned
    rows w and w+1, so each channel gathers Rp >= mtu+1 rows.  TWM divides
    the 8-padded window count exactly so output blocks stay 8-row aligned;
    when that needs multiple tiles, an extra 8 gathered rows provide the
    next-tile roll context.
    """
    cap = max(8, min(128, (1 << 19) // (N * 4)))
    m = mtu // 8 + 1  # 8*m rows strictly > mtu: row mtu is always gathered
    best = max(d for d in range(1, m + 1) if m % d == 0 and 8 * d <= cap)
    twm = 8 * best
    tiles = m // best
    rp = 8 * m if tiles == 1 else 8 * m + 8
    return twm, tiles, rp


# flat-kernel block budget: M*N <= _FLAT_MAX keeps each (M, N) f32 block
# at <= 1 MB (<= 8 MB of double-buffered IQ input + roll temps in VMEM)
_FLAT_MAX = 1 << 18


@functools.lru_cache(maxsize=None)
def payload_flat_geometry(N: int, mtu: int) -> tuple[int, int] | None:
    """(rows_per_channel Rp, channels_per_cell PC) for the FLAT payload
    kernel, or None when one channel's rows alone blow the block budget
    (large mtu x large N -> fall back to the tiled kernel).

    The flat kernel stacks PC whole channels' aligned rows into one
    (PC*Rp, N) block: per-row barrel roll handles per-channel shifts, and
    the row-(w, w+1) window pairing is a single static sublane roll, so a
    grid cell is one MXU-sized detect over every window of PC channels.
    Channel-boundary wrap rows land on window indices >= mtu (Rp > mtu)
    and are discarded by the [:, :mtu] output slice.
    """
    rp = 8 * (mtu // 8 + 1)  # rows strictly > mtu, 8-aligned
    if rp * N > _FLAT_MAX:
        return None
    pc = max(1, min(1024 // rp, _FLAT_MAX // (rp * N)))
    return rp, pc


@functools.lru_cache(maxsize=None)
def payload_direct_pc(N: int, mtu: int, W: int, B: int) -> int | None:
    """Channels per cell for the DIRECT (gather-free) payload kernel, or
    None when the geometry doesn't fit.

    The direct kernel reads the [B, W, N] row view of the channel buffer
    itself (the same array the coarse detector consumes, so XLA CSEs the
    slice) and selects each channel's Rp aligned rows in VMEM — the
    [B, Rp, N] gathered intermediate of the flat kernel never exists in
    HBM (saves one full write + read of it, ~2.4 GB at SF10/B=2048).

    Mosaic legality (the round-2 hardware regression): a dynamic sublane
    slice must start at a provably 8-aligned offset, so the kernel slices
    Rpp = Rp + 8 rows at 8*(q // 8) and absorbs the 0..8-row remainder
    with a gated static sublane barrel roll.  Reaching the last rows that
    a clamped q = W - Rp can address therefore requires the buffer's row
    count to satisfy (W - Rp) % 8 == 0 (required_samples pads to this
    grid); other W fall back to the gather path.

    Constraints: whole-channel rows must fit the flat block budget
    (payload_flat_geometry), each channel needs Rpp rows inside W, the
    double-buffered (PC, W, N) input blocks must fit VMEM, and PC must
    divide B exactly (padding the [B, W, N] operand would copy it).
    Traffic gate: the direct kernel reads all W rows per channel where
    the gather path moves 3*Rp (gather read + write + kernel read), so
    the direct route only wins when W <= 3*Rp — long buffers with short
    payloads keep the gather."""
    rp = 8 * (mtu // 8 + 1)
    rpp = rp + 8
    if rp * N > _FLAT_MAX or W < rpp or W > 3 * rp or (W - rp) % 8 != 0:
        return None
    # per-channel VMEM: input (W, N) f32 x2 (re/im) x2 (double-buffered)
    pc_cap = min(
        1024 // rpp, _FLAT_MAX // (rpp * N), (8 << 20) // (W * N * 16)
    )
    if N <= 256:
        # measured on the v5e at the config-3 geometry (SF7, B=8192,
        # mtu=50, tools/tune_kernels.py --config3): PC=8 runs the kernel
        # in 11.4 ms where the PC=16 production stage took ~15 ms —
        # smaller cells pipeline the per-cell scalar-prefetch + dynamic
        # slice path better at small N (same shape as the round-3 track
        # TC sweep, _track_tc).
        pc_cap = min(pc_cap, 8)
    if pc_cap < 1:
        return None
    pc = max(d for d in range(1, pc_cap + 1) if B % d == 0)
    return pc


def payload_rows(N: int, mtu: int) -> int:
    """Aligned rows each channel must gather for payload_detect."""
    flat = payload_flat_geometry(N, mtu)
    if flat is not None:
        return flat[0]
    return payload_geometry(N, mtu)[2]


def _track_tc(N: int) -> int:
    """Channels per track-kernel grid cell.  Multiples of 8 only: Mosaic
    requires output blocks of (TC, 1) to have TC % 8 == 0.  The floor of 8
    is safe VMEM-wise even at N=4096 (inputs 2x8x18xNx4 double-buffered +
    34 (TC,N) window scratches ~= 19 MB < the 40 MB limit below)."""
    tc = (1 << 21) // (TRACK_ROWS * N * 4)
    # cap 32 re-measured on-chip round 3 (chained-dispatch sweep, N=128,
    # B=4096, bf16): TC=32 7.5 ms, 64 9.2, 128 10.1, 256 32.5 — wider
    # cells lose; the 13-step scan serializes regardless and bigger
    # blocks only add VMEM pressure (tools/tune_kernels.sweep_track).
    # Round-5 --bigN re-sweep after the roll-free + stacked-pair reworks
    # (N=2048/4096, TC in {8,16,24,32}, both modes): spreads of ~±20%
    # with no consistent winner across modes (e.g. N=4096 f32 favors
    # TC=32, bf16 favors TC=8) — within the dev tunnel's measured
    # variance, so the floor stands.
    return max(8, min(32, (tc // 8) * 8))


def _track_direct_rpp(W: int) -> int:
    """Rows the direct track kernel slices per channel: Rpp must cover
    TRACK_ROWS plus the worst-case 8-alignment remainder (<= 14 rows when
    W % 8 == 0 and Rpp = 32; <= 6 when W == 24)."""
    return min(32, W)


def track_direct_tc(N: int, W: int, B: int) -> int | None:
    """Channels per cell for the DIRECT (gather-free) track kernel, or
    None when the geometry doesn't fit.

    Like payload_direct_pc, the direct track kernel reads the [B, W, N]
    row view of the channel buffer itself and selects each channel's
    TRACK_ROWS scan rows in VMEM — the [B, TRACK_ROWS, N] gathered
    intermediate never exists in HBM, and the XLA gather dispatch
    disappears.  Mosaic legality: the in-VMEM slice starts at the
    8-aligned offset 8*(q // 8) and a gated static sublane barrel roll
    absorbs the remainder, which bounds W to multiples of 8 (see
    payload_direct_pc).

    Constraints: each channel needs _track_direct_rpp(W) rows inside W,
    the double-buffered (TC, W, N) input blocks must fit VMEM, TC must be
    a multiple of 8 (Mosaic needs the (TC, 1) output blocks
    sublane-aligned) and must divide B exactly (padding the [B, W, N]
    operand would copy it).  Traffic gate: the direct kernel reads all W
    rows per channel where the gather path moves 3*TRACK_ROWS (gather
    read + write + kernel read), so the direct route only wins for short
    buffers (W <= 3*TRACK_ROWS = 54 rows) — streaming-chunk shapes, not
    the long payload-sized banks of the headline bench."""
    if W < 24 or W > 3 * TRACK_ROWS or W % 8 != 0:
        return None
    for tc in (32, 24, 16, 8):
        # per-cell VMEM: input (TC, W, N) f32 x2 (re/im) x2 (double-
        # buffered) <= 12 MB, leaving room for the 2*TRACK_ROWS (TC, N)
        # window scratches under the 40 MB limit
        if B % tc == 0 and tc * W * N * 16 <= 12 * (1 << 20):
            return tc
    return None


# --------------------------------------------------------------------------
# shared in-kernel pieces
# --------------------------------------------------------------------------

def _detect_args(N: int, bf16: bool = False):
    """Static (specs, arrays, kernel-side detect closure factory) for the
    direct / four-step DFT variants.  bf16 casts the MXU contraction
    operands (see ops/pallas_detect._mxu_dot).

    In bf16 mode the DENSE DFT can extend to N <= MAX_DENSE_BF16_N
    (LORA_MAX_DENSE_BF16_N env knob; default off): one wide [M, N] x
    [N, N] bf16 contraction replaces the four-step's stage-1 VPU
    accumulation + narrow stage-2 matmul.  Measured on the v5e with the
    roll-free kernels (SF10/B=2048) the dense path hits ~43 real TFLOP/s
    but pays N/(n1+n2) ~ 7.5x the FLOPs and LOSES (payload 6.5 vs 8.4
    Gsamp/s four-step f32), so the knob defaults to four-step everywhere
    above MAX_DIRECT_N; dense stays available for re-tuning on parts
    with a different MXU/VPU balance."""
    const = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    if N <= MAX_DIRECT_N or (bf16 and N <= MAX_DENSE_BF16_N):
        fre, fim = _dft_matrix_np(N)
        dt = jnp.bfloat16 if (bf16 and N > MAX_DIRECT_N) else jnp.float32
        specs = [const((N, N)), const((N, N))]
        arrays = [jnp.asarray(fre, dt), jnp.asarray(fim, dt)]

        def make(refs):
            fr, fi = (r[:] for r in refs)

            def det(zr, zi, want_findex, want_mag2=False):
                return direct_vals(zr, zi, fr, fi, want_findex, bf16,
                                   want_mag2)

            return det

        return specs, arrays, make
    n1 = 128
    n2 = N // n1
    f1re, f1im = _dft_matrix_np(n1)
    twre, twim = _twiddle_np(n2, n1)
    w2 = _dft_matrix_np(n2)
    specs = [const((n1, n1)), const((n1, n1)), const((n2, n1)),
             const((n2, n1))]
    arrays = [jnp.asarray(f1re), jnp.asarray(f1im), jnp.asarray(twre),
              jnp.asarray(twim)]

    def make(refs):
        f1r, f1i, twr, twi = (r[:] for r in refs)

        def det(zr, zi, want_findex, want_mag2=False):
            return four_step_vals(
                zr, zi, f1r, f1i, twr, twi, w2, want_findex, bf16, want_mag2
            )

        return det

    return specs, arrays, make


# Sub-window alignment WITHOUT rolls (round-4 rework).  The detector only
# consumes |DFT|^2, and a time shift of the dechirped window is a pure
# output phase.  Concretely, with the quadratic-phase dechirp table
# c[n] = exp(-+2*pi*i*g(n)/N), g(n) = (n+1)(n+2)/2 - (n+1)N/2 (chirp.py
# _dechirp_turns_np; the N*w wrap term is 0 mod N), the true window
# y[n] = rows[w][r+n] (n < N-r) / rows[w+1][r+n-N] satisfies
#
#   S[k] = sum_n y[n] c[n] W^{nk}
#        = const_r * W^{-rk} * sum_m u'[m] c[m] e^{+-2*pi*i(r*m mod N)/N} W^{mk}
#
# where u'[m] = rows[w][m] for m >= r and -rows[w+1][m] for m < r (the
# -1 is the half-turn of g across the N boundary: g(x+N)-g(x) = N/2 mod
# N), because g(m-r) = g(m) - rm - r(3-r)/2 + rN/2 makes the shifted
# table a LINEAR phase times the unshifted one.  const_r and W^{-rk}
# drop under |.|^2, so the peak/power/noise/f_index outputs are those of
# the true window while the kernel never rolls anything: the alignment
# is one lane select (with negation) plus folding (r*m mod N)/N turns
# into the fine-CFO derotator — computed in exact int32 (N is a power of
# two) so no large-angle float loss.  Replaces the round-1..3 barrel
# shifter (log2(N) gated pltpu.roll+where passes over every row, the
# dominant VPU cost of both kernels at ~20 full-block passes).
#
# Sign convention: the UP dechirp table is conj(base chirp) (turns
# negated) giving e^{+2*pi*i(rm mod N)/N}, i.e. derotator turns
# -(fe*m - (r*m mod N))/N; the DOWN table keeps base turns, flipping the
# factor sign: -(fe*m + (r*m mod N))/N.


def _blend_shift(row_w_r, row_w_i, row_w1_r, row_w1_i, rv):
    """u'[m]: lane m >= r from row w, lane m < r from MINUS row w+1.
    rv: (TC, 1) int32 per-channel r = data_start % N."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, row_w_r.shape[-1]), 1)
    take_w = lane >= rv
    return (
        jnp.where(take_w, row_w_r, -row_w1_r),
        jnp.where(take_w, row_w_i, -row_w1_i),
    )


def _shift_rotation_turns(rv, fe, N, TW, down):
    """Combined derotator turns: (-+(r*m mod N) - fe*(m + N*[m<r]))/N as
    [TW, N] f32.  The fine-CFO factor is a function of the TIME index
    n = m - r + N*[m<r], so fe multiplies the unwrapped index (the
    constant e^{2*pi*i*fe*r/N} drops under |.|^2).  The r*m product and
    mod-N reduction stay in int32 (exact; N pow2) — evaluating
    2*pi*r*m/N directly in f32 would hit ~0.5 rad ulp at r*m ~ N^2."""
    m = jax.lax.broadcasted_iota(jnp.int32, (TW, N), 1)
    rm = (rv * m) & (N - 1)
    m_eff = jnp.where(m < rv, m + N, m).astype(jnp.float32)
    sgn = -1.0 if down else 1.0
    return (sgn * rm.astype(jnp.float32) - fe * m_eff) * (1.0 / N)


def _dechirp_shift_vals(xr, xi, cr, ci, fe, rv, down):
    """Dechirp multiply + combined shift/fine-CFO rotation on values:
    xr/xi [TW, N] BLENDED window samples (_blend_shift), cr/ci [1, N]
    chirp table rows, fe [TW, 1] fine CFO in bins, rv [TW, 1] int32
    sub-window shift.  |DFT|^2-equivalent to rolling the window by rv and
    calling dechirp_derotate_vals (see module comment)."""
    TW, N = xr.shape
    yr = xr * cr - xi * ci
    yi = xr * ci + xi * cr
    turns = _shift_rotation_turns(rv, fe, N, TW, down)
    ang = (2.0 * np.pi) * turns
    rr = jnp.cos(ang)
    ri = jnp.sin(ang)
    return yr * rr - yi * ri, yr * ri + yi * rr


def _trunc_half_i32(x):
    """C-style integer division by 2 (truncates toward zero)."""
    return jnp.sign(x) * (jnp.abs(x) // 2)


# --------------------------------------------------------------------------
# flat payload kernel: PC whole channels per cell, no scratch, one detect
# --------------------------------------------------------------------------

def _payload_flat_kernel_factory(N, M, make_det, want_mag2=False):
    def kernel(rv, fev, gr, gi, cr, ci, *rest):
        n_out = 4 if want_mag2 else 3
        det_refs = rest[: len(rest) - n_out]
        outs = rest[len(rest) - n_out:]
        value, power, noise = outs[:3]
        det = make_det(det_refs)
        r = rv[:]                                      # (M, 1) int32
        fe = fev[:]                                    # (M, 1) f32
        vr, vi = gr[:], gi[:]
        # roll-free alignment (module comment): window w = row w lanes
        # >= r, minus row w+1 lanes < r; "row w+1" for every row at once
        # is one static sublane roll (wrap rows pair across channels/
        # cells -> windows >= mtu, cut by the XLA-side [:, :mtu] slice)
        win_r, win_i = _blend_shift(
            vr, vi, pltpu.roll(vr, M - 1, 0), pltpu.roll(vi, M - 1, 0), r
        )
        zr, zi = _dechirp_shift_vals(win_r, win_i, cr[:], ci[:], fe, r, False)
        if want_mag2:
            val, pwr, nse, _, m2 = det(zr, zi, False, True)
            outs[3][:] = m2
        else:
            val, pwr, nse, _ = det(zr, zi, False)
        value[:] = val
        power[:] = pwr
        noise[:] = nse

    return kernel


@functools.partial(
    jax.jit, static_argnames=("mtu", "interpret", "bf16", "want_mag2")
)
def _payload_flat_pc(g: IQ, rs: jax.Array, fe: jax.Array, mtu: int,
                     interpret: bool, bf16: bool = False,
                     want_mag2: bool = False):
    """Flat multi-channel payload kernel.  g: IQ [B, Rp, N] aligned rows
    (Rp = payload_flat_geometry rows); rs: int32 [B]; fe: f32 [B] ->
    (value i32, power f32, noise f32) [B, mtu] (+ mag2 f32 [B, mtu, N]
    in the detect's lane order when want_mag2 — the soft-RX evidence)."""
    B, Rp, N = g.shape
    rp_need, pc = payload_flat_geometry(N, mtu)
    assert Rp == rp_need, (Rp, rp_need)
    M = pc * Rp
    pad = (-B) % pc
    if pad:
        g = cplx.pad(g, ((0, pad), (0, 0), (0, 0)))
        rs = jnp.pad(rs, (0, pad))
        fe = jnp.pad(fe, (0, pad))
    Bp = B + pad
    det_specs, det_arrays, make_det = _detect_args(N, bf16)
    const = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    cre, cim = _dechirp_table_np(N, False)
    rv_rows = jnp.repeat(rs.astype(jnp.int32) % N, Rp).reshape(-1, 1)
    fe_rows = jnp.repeat(fe.astype(jnp.float32), Rp).reshape(-1, 1)
    row2 = lambda i: (i, 0)
    in_specs = [
        pl.BlockSpec((M, 1), row2, memory_space=pltpu.VMEM),
        pl.BlockSpec((M, 1), row2, memory_space=pltpu.VMEM),
        pl.BlockSpec((M, N), row2, memory_space=pltpu.VMEM),
        pl.BlockSpec((M, N), row2, memory_space=pltpu.VMEM),
        const((1, N)),
        const((1, N)),
    ] + det_specs
    out_spec = pl.BlockSpec((M, 1), row2, memory_space=pltpu.VMEM)
    out_specs = [out_spec] * 3
    out_shape = [
        jax.ShapeDtypeStruct((Bp * Rp, 1), jnp.int32),
        jax.ShapeDtypeStruct((Bp * Rp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Bp * Rp, 1), jnp.float32),
    ]
    if want_mag2:
        out_specs = out_specs + [
            pl.BlockSpec((M, N), row2, memory_space=pltpu.VMEM)
        ]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((Bp * Rp, N), jnp.float32)
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Bp // pc,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kernel = _payload_flat_kernel_factory(N, M, make_det, want_mag2)
    # the dense bf16 DFT matrices add 2*N^2*2 bytes (4 MB at N=1024);
    # the mag2 output adds a double-buffered (M, N) f32 block; at
    # N >= 2048 the four-step's per-group temps approach the 14 MB scoped
    # budget at the full-block M near _FLAT_MAX (the SF12 mtu=60 shape
    # failed to compile in the round-5 ladder) — give large N headroom
    # (v5e VMEM is 128 MB)
    dense_bf16 = bf16 and MAX_DIRECT_N < N <= MAX_DENSE_BF16_N
    vmem_mb = (24 if dense_bf16 else 14) + (8 if want_mag2 else 0) \
        + (18 if N >= 2048 else 0)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * Bp * Rp * N * (min(N, 128) + max(1, N // 128)),
            bytes_accessed=Bp * Rp * N * 8 + Bp * Rp * 12
            + (Bp * Rp * N * 4 if want_mag2 else 0),
            transcendentals=2 * Bp * Rp * N,
        ),
        interpret=interpret,
    )(rv_rows,
      fe_rows,
      g.re.reshape(Bp * Rp, N), g.im.reshape(Bp * Rp, N),
      jnp.asarray(cre)[None], jnp.asarray(cim)[None],
      *det_arrays)
    value, power, noise = outs[:3]
    cut = lambda a: a.reshape(Bp, Rp)[:B, :mtu]
    if want_mag2:
        m2 = outs[3].reshape(Bp, Rp, N)[:B, :mtu]
        return cut(value), cut(power), cut(noise), m2
    return cut(value), cut(power), cut(noise)


# --------------------------------------------------------------------------
# direct payload kernel: row selection happens in VMEM — no gathered
# intermediate in HBM (see payload_direct_pc)
# --------------------------------------------------------------------------

def _remainder_roll(vr, vi, rem, rpp):
    """Roll the (rpp, N) sliced rows up by rem in [0, 14] so row 0 holds
    original row rem: Mosaic cannot statically prove an arbitrary
    scalar-prefetched sublane offset is 8-aligned (the round-2 hardware
    regression), so the slice starts at the aligned 8*(q // 8) and this
    gated static barrel roll absorbs the remainder."""
    for b in (1, 2, 4, 8):
        mb = ((rem & b) != 0).reshape(1, 1)
        vr = jnp.where(mb, pltpu.roll(vr, rpp - b, 0), vr)
        vi = jnp.where(mb, pltpu.roll(vi, rpp - b, 0), vi)
    return vr, vi


def _payload_direct_kernel_factory(N, W, Rpp, PC, make_det, want_mag2=False):
    M = PC * Rpp

    def kernel(q8v, remv, rv, fev, xr, xi, cr, ci, *rest):
        n_out = 4 if want_mag2 else 3
        det_refs = rest[: len(rest) - n_out]
        outs = rest[len(rest) - n_out:]
        value, power, noise = outs[:3]
        det = make_det(det_refs)
        i = pl.program_id(0)
        # per-channel aligned-row selection: a dynamic sublane slice of
        # the (W, N) channel rows at the 8-aligned scalar-prefetched
        # offset, remainder absorbed by the barrel roll — this load IS
        # the gather (never materialized in HBM)
        rs_, ri_ = [], []
        for c in range(PC):
            d8 = q8v[i * PC + c]
            rem = remv[i * PC + c]
            vr_c = xr[c, pl.ds(d8 * 8, Rpp), :]
            vi_c = xi[c, pl.ds(d8 * 8, Rpp), :]
            vr_c, vi_c = _remainder_roll(vr_c, vi_c, rem, Rpp)
            rs_.append(vr_c)
            ri_.append(vi_c)
        vr = jnp.concatenate(rs_, 0) if PC > 1 else rs_[0]
        vi = jnp.concatenate(ri_, 0) if PC > 1 else ri_[0]
        # from here identical to the flat kernel: roll-free window blend,
        # dechirp + combined shift/CFO rotation, detect
        r = rv[:]                                      # (M, 1) int32
        win_r, win_i = _blend_shift(
            vr, vi, pltpu.roll(vr, M - 1, 0), pltpu.roll(vi, M - 1, 0), r
        )
        zr, zi = _dechirp_shift_vals(
            win_r, win_i, cr[:], ci[:], fev[:], r, False
        )
        if want_mag2:
            val, pwr, nse, _, m2 = det(zr, zi, False, True)
            outs[3][:] = m2
        else:
            val, pwr, nse, _ = det(zr, zi, False)
        value[:] = val
        power[:] = pwr
        noise[:] = nse

    return kernel


@functools.partial(
    jax.jit, static_argnames=("mtu", "interpret", "bf16", "want_mag2")
)
def _payload_direct(x3: IQ, q: jax.Array, rs: jax.Array, fe: jax.Array,
                    mtu: int, interpret: bool, bf16: bool = False,
                    want_mag2: bool = False):
    """Direct payload kernel.  x3: IQ [B, W, N] whole-buffer row view;
    q: int32 [B] aligned-row offsets (data_start // N); rs: int32 [B]
    sub-window shifts; fe: f32 [B] -> (value i32, power f32, noise f32)
    [B, mtu] (+ mag2 f32 [B, mtu, N], detect lane order, when
    want_mag2).  Output-identical to
    payload_detect(gather_rows(x, q, Rp, N), rs, fe, mtu)."""
    B, W, N = x3.shape
    pc = payload_direct_pc(N, mtu, W, B)
    assert pc is not None, (N, mtu, W, B)
    rp = 8 * (mtu // 8 + 1)
    rpp = rp + 8
    M = pc * rpp
    det_specs, det_arrays, make_det = _detect_args(N, bf16)
    const = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    cre, cim = _dechirp_table_np(N, False)
    qc = jnp.clip(q.astype(jnp.int32), 0, W - rp)  # == gather_rows's clamp
    # 8-aligned slice start (pre-divided so the kernel's d8 * 8 is
    # provably 8-aligned to Mosaic) + the 0..8-row remainder; the clamp
    # to (W - rpp) // 8 is exact because (W - rp) % 8 == 0 (route gate)
    q8 = jnp.minimum(qc // 8, (W - rpp) // 8)
    rem = qc - q8 * 8
    rv_rows = jnp.repeat(rs.astype(jnp.int32) % N, rpp).reshape(-1, 1)
    fe_rows = jnp.repeat(fe.astype(jnp.float32), rpp).reshape(-1, 1)
    in_specs = [
        pl.BlockSpec((M, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((M, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (pc, W, N), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (pc, W, N), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        const((1, N)),
        const((1, N)),
    ] + det_specs
    out_spec = pl.BlockSpec(
        (M, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [out_spec] * 3
    out_shape = [
        jax.ShapeDtypeStruct((B * rpp, 1), jnp.int32),
        jax.ShapeDtypeStruct((B * rpp, 1), jnp.float32),
        jax.ShapeDtypeStruct((B * rpp, 1), jnp.float32),
    ]
    if want_mag2:
        out_specs = out_specs + [pl.BlockSpec(
            (M, N), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((B * rpp, N), jnp.float32)
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // pc,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kernel = _payload_direct_kernel_factory(
        N, W, rpp, pc, make_det, want_mag2
    )
    vmem_mb = (28 if (
        bf16 and MAX_DIRECT_N < N <= MAX_DENSE_BF16_N
    ) else 24) + (8 if want_mag2 else 0)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * rpp * N * (min(N, 128) + max(1, N // 128)),
            bytes_accessed=B * W * N * 8 + B * rpp * 12
            + (B * rpp * N * 4 if want_mag2 else 0),
            transcendentals=2 * B * rpp * N,
        ),
        interpret=interpret,
    )(q8,
      rem,
      rv_rows,
      fe_rows,
      x3.re, x3.im,
      jnp.asarray(cre)[None], jnp.asarray(cim)[None],
      *det_arrays)
    value, power, noise = outs[:3]
    cut = lambda a: a.reshape(B, rpp)[:, :mtu]
    if want_mag2:
        m2 = outs[3].reshape(B, rpp, N)[:, :mtu]
        return cut(value), cut(power), cut(noise), m2
    return cut(value), cut(power), cut(noise)


def payload_detect_direct(x3, q, rs, fe, mtu: int, interpret: bool = False,
                          bf16: bool = False, want_mag2: bool = False):
    """Gather-free fused payload stage: whole-buffer row view x3
    (IQ [B, W, N]), per-channel aligned-row offset q = data_start // N,
    sub-window shift rs = data_start % N and fine CFO fe ->
    (value, power, noise) [B, mtu].  Bit-identical to
    payload_detect(shift.gather_rows(x, q, payload_rows, N), rs, fe, mtu)
    but the gathered rows never exist in HBM; use when
    payload_direct_pc(N, mtu, W, B) is not None.

    want_mag2=True appends the payload |FFT|^2 windows [B, mtu, N] in
    NATURAL bin order (the kernel's group-major lane layout is restored
    with one static gather) — the soft-RX evidence (models/softdec)."""
    x3 = cplx.as_iq(x3)
    B, W, N = x3.shape
    out = _payload_direct(
        x3, jnp.asarray(q), jnp.asarray(rs), jnp.asarray(fe), mtu,
        interpret, bf16, want_mag2,
    )
    if want_mag2:
        value, power, noise, m2 = out
        return value, power, noise, _natural_mag2(m2, N, bf16)
    return out


def _natural_mag2(m2: jax.Array, N: int, bf16: bool) -> jax.Array:
    """Restore natural bin order on a kernel-emitted spectrum [..., N]
    (four-step detects emit group-major lanes; see
    pallas_detect.detect_bin_order)."""
    from .pallas_detect import detect_bin_order

    perm = detect_bin_order(N, bf16)
    if perm is None:
        return m2
    return jnp.take(m2, jnp.asarray(perm), axis=-1)


# --------------------------------------------------------------------------
# tiled payload kernel: roll + dechirp + derotate + DFT + peak in one pass
# (fallback for mtu x N too large for a whole-channel flat block)
# --------------------------------------------------------------------------

def _payload_kernel_factory(N, TWM, tiles, make_det, want_mag2=False):
    n_out = 4 if want_mag2 else 3

    def kernel(rs, fes, ar, ai, br, bi, cr, ci, *rest):
        det_refs = rest[: len(rest) - n_out - 2]
        outs = rest[len(rest) - n_out - 2: len(rest) - 2]
        value, power, noise = outs[:3]
        s_r, s_i = rest[len(rest) - 2:]
        b = pl.program_id(0)
        r = rs[b]
        fe = fes[b]
        det = make_det(det_refs)
        # stage RAW rows (this tile + the next tile's first 8) so window
        # w's (row w, row w+1) pair is two static sublane slices; the
        # alignment itself is the roll-free blend (module comment)
        s_r[0:TWM, :] = ar[0]
        s_i[0:TWM, :] = ai[0]
        s_r[TWM : TWM + 8, :] = br[0]
        s_i[TWM : TWM + 8, :] = bi[0]
        rv = jnp.full((1, 1), r, jnp.int32)
        win_r, win_i = _blend_shift(
            s_r[0:TWM, :], s_i[0:TWM, :],
            s_r[1 : TWM + 1, :], s_i[1 : TWM + 1, :], rv,
        )
        zr, zi = _dechirp_shift_vals(win_r, win_i, cr[:], ci[:], fe, rv, False)
        if want_mag2:
            val, pwr, nse, _, m2 = det(zr, zi, False, True)
            outs[3][0] = m2
        else:
            val, pwr, nse, _ = det(zr, zi, False)
        value[0] = val
        power[0] = pwr
        noise[0] = nse

    return kernel


@functools.partial(
    jax.jit, static_argnames=("mtu", "interpret", "bf16", "want_mag2")
)
def _payload_tiled(g: IQ, rs: jax.Array, fe: jax.Array, mtu: int,
                   interpret: bool, bf16: bool = False,
                   want_mag2: bool = False):
    """g: IQ [B, Rp, N] aligned rows; rs: int32 [B] sub-window shifts;
    fe: float32 [B] fine CFO -> (value i32, power f32, noise f32) [B, mtu]
    (+ mag2 f32 [B, mtu, N], detect lane order, when want_mag2)."""
    B, Rp, N = g.shape
    TWM, tiles, rp_need = payload_geometry(N, mtu)
    assert Rp == rp_need, (Rp, rp_need)
    M8 = TWM * tiles
    det_specs, det_arrays, make_det = _detect_args(N, bf16)
    row3 = lambda b, t, *_: (b, t, 0)
    if tiles == 1:
        nxt3 = lambda b, t, *_: (b, 0, 0)  # wrap rows discarded
    else:
        # next-tile roll context: first 8 rows after this tile's block
        nxt3 = lambda b, t, *_: (b, jnp.minimum((t + 1) * TWM, M8) // 8, 0)
    const = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    cre, cim = _dechirp_table_np(N, False)
    in_specs = [
        pl.BlockSpec((1, TWM, N), row3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TWM, N), row3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, N), nxt3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, N), nxt3, memory_space=pltpu.VMEM),
        const((1, N)),
        const((1, N)),
    ] + det_specs
    out_spec = pl.BlockSpec(
        (1, TWM, 1), lambda b, t, *_: (b, t, 0), memory_space=pltpu.VMEM
    )
    out_specs = [out_spec] * 3
    out_shape = [
        jax.ShapeDtypeStruct((B, M8, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, M8, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, M8, 1), jnp.float32),
    ]
    if want_mag2:
        out_specs = out_specs + [pl.BlockSpec(
            (1, TWM, N), lambda b, t, *_: (b, t, 0),
            memory_space=pltpu.VMEM,
        )]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((B, M8, N), jnp.float32)
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((TWM + 8, N), jnp.float32)] * 2,
    )
    kernel = _payload_kernel_factory(N, TWM, tiles, make_det, want_mag2)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(14 + (8 if want_mag2 else 0)) * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * M8 * N * (min(N, 128) + max(1, N // 128)),
            bytes_accessed=B * Rp * N * 8 + B * M8 * 12
            + (B * M8 * N * 4 if want_mag2 else 0),
            transcendentals=2 * B * M8 * N,
        ),
        interpret=interpret,
    )(rs.astype(jnp.int32) % N,
      fe.astype(jnp.float32),
      g.re, g.im, g.re, g.im,
      jnp.asarray(cre)[None], jnp.asarray(cim)[None],
      *det_arrays)
    value, power, noise = outs[:3]
    if want_mag2:
        return (
            value[:, :mtu, 0],
            power[:, :mtu, 0],
            noise[:, :mtu, 0],
            outs[3][:, :mtu],
        )
    return (
        value[:, :mtu, 0],
        power[:, :mtu, 0],
        noise[:, :mtu, 0],
    )


def payload_detect(g, rs, fe, mtu: int, interpret: bool = False,
                   bf16: bool = False, want_mag2: bool = False):
    """Fused payload stage: aligned rows g (IQ [..., Rp, N], Rp =
    payload_rows(N, mtu)), per-channel shift rs = data_start % N and fine
    CFO fe -> (value, power, noise) with shape [..., mtu].

    Window w of channel c is g[c, w, rs[c]:] ++ g[c, w+1, :rs[c]]
    dechirp-detected with derotation exp(-2j pi fe n / N) — exactly
    shift.shift_windows + detect.dechirp_detect(want_f_index=False), in one
    HBM pass.  Routes to the flat multi-channel kernel when a whole
    channel's rows fit the block budget (payload_flat_geometry), else the
    per-channel tiled kernel.

    want_mag2=True appends the payload |FFT|^2 windows [..., mtu, N] in
    NATURAL bin order (the soft-RX evidence, models/softdec); magnitudes
    equal the XLA path's spectra — the roll-free alignment's phase factors
    drop under |.|^2 (module comment)."""
    g = cplx.as_iq(g)
    *lead, Rp, N = g.shape
    B = int(np.prod(lead)) if lead else 1
    gf = g.reshape(B, Rp, N)
    rsf = jnp.broadcast_to(jnp.asarray(rs), tuple(lead)).reshape(B)
    fef = jnp.broadcast_to(jnp.asarray(fe), tuple(lead)).reshape(B)
    impl = (
        _payload_flat_pc if payload_flat_geometry(N, mtu) is not None
        else _payload_tiled
    )
    out = impl(gf, rsf, fef, mtu, interpret, bf16, want_mag2)
    shp = lambda a: a.reshape(*lead, mtu)
    if want_mag2:
        value, power, noise, m2 = out
        m2 = _natural_mag2(m2, N, bf16).reshape(*lead, mtu, N)
        return shp(value), shp(power), shp(noise), m2
    value, power, noise = out
    return shp(value), shp(power), shp(noise)


# --------------------------------------------------------------------------
# track kernel: sync scan + lookahead + downchirp CFO in one launch
# --------------------------------------------------------------------------

def _track_kernel_factory(N, TC, sync0, sync1, thresh, make_det, W=None):
    """W=None: xr/xi blocks are the pre-gathered (TC, R, N) scan rows.
    W=int: DIRECT variant — the kernel takes scalar-prefetched 8-aligned
    row offsets (pre-divided by 8) + remainders first and xr/xi blocks
    are whole-channel (TC, W, N) row views; each channel's R rows are
    selected in VMEM (the gather never exists in HBM)."""
    NW = N_TRACK_WIN
    R = TRACK_ROWS

    def kernel(*a):
        if W is None:
            rv_ref, xr, xi, cur, cui, cdr, cdi, *rest = a
        else:
            q8v, remv, rv_ref, xr, xi, cur, cui, cdr, cdi, *rest = a
        n_scratch = 2 * NW
        det_refs = rest[: len(rest) - 6 - n_scratch]
        outs = rest[len(rest) - 6 - n_scratch: len(rest) - n_scratch]
        o_state, o_ksync, o_fqerr, o_ferr, o_pwr, o_snr = outs
        ror = rest[len(rest) - n_scratch: len(rest) - NW]
        roi = rest[len(rest) - NW:]
        det = make_det(det_refs)
        cu_r, cu_i = cur[:], cui[:]
        cd_r, cd_i = cdr[:], cdi[:]
        if W is None:
            row = lambda k: (xr[:, k, :], xi[:, k, :])
        else:
            # per-channel aligned-row selection: a dynamic sublane slice
            # of the (W, N) channel rows at the 8-aligned scalar-
            # prefetched offset, remainder absorbed by the barrel roll
            # (same load pattern as _payload_direct_kernel_factory)
            rpp = _track_direct_rpp(W)
            i = pl.program_id(0)
            rs_, ri_ = [], []
            for c in range(TC):
                d8 = q8v[i * TC + c]
                rem = remv[i * TC + c]
                vr_c = xr[c, pl.ds(d8 * 8, rpp), :]
                vi_c = xi[c, pl.ds(d8 * 8, rpp), :]
                vr_c, vi_c = _remainder_roll(vr_c, vi_c, rem, rpp)
                rs_.append(vr_c[None])
                ri_.append(vi_c[None])
            xrv = jnp.concatenate(rs_, 0) if TC > 1 else rs_[0]
            xiv = jnp.concatenate(ri_, 0) if TC > 1 else ri_[0]
            row = lambda k: (xrv[:, k, :], xiv[:, k, :])

        # 1. per-channel sub-window alignment, roll-free (module comment):
        #    window k of channel c = row k lanes >= r[c], minus row k+1
        #    lanes < r[c]; the sub-sample shift itself folds into the
        #    detects' rotation term.  Replaces the round-1..3 barrel
        #    shifter (log2(N) gated rolls per row — the kernel's dominant
        #    VPU cost).  xr/xi arrive channel-major ([TC, R, N], the
        #    gather's native layout — no XLA transpose pass); window
        #    block k is the static row-k slice of every channel.
        rv = rv_ref[:]                                 # (TC, 1) int32 r
        for k in range(NW):
            r0r, r0i = row(k)
            r1r, r1i = row(k + 1)
            wr_, wi_ = _blend_shift(r0r, r0i, r1r, r1i, rv)
            ror[k][:, :] = wr_
            roi[k][:, :] = wi_

        def swr(k):
            return ror[k][:]

        def swi(k):
            return roi[k][:]

        # 2. sync scan with two-symbol lookahead and fine-CFO integration
        #    (models/demodulator._scan_track, LoRaDemod.cpp:183-237).
        #    The step's window and its lookahead are INDEPENDENT given the
        #    carried ferr, so they stack into ONE (2*TC, N) detect — half
        #    the detect launches and twice the matmul rows per launch
        #    (round-5; the per-row arithmetic is unchanged, outputs are
        #    bit-identical to the two-detect form)
        state = jnp.zeros((TC, 1), jnp.int32)
        ferr = jnp.zeros((TC, 1), jnp.float32)
        prev_q = jnp.full((TC, 1), 999, jnp.int32)
        k_sync = jnp.zeros((TC, 1), jnp.int32)
        thr = jnp.float32(thresh)
        rv2 = jnp.concatenate([rv, rv], 0)
        for k in range(N_SCAN):
            ferr2 = jnp.concatenate([ferr, ferr], 0)
            zr, zi = _dechirp_shift_vals(
                jnp.concatenate([swr(k), swr(k + 1)], 0),
                jnp.concatenate([swi(k), swi(k + 1)], 0),
                cu_r, cu_i, ferr2, rv2, False,
            )
            val2, pwr2, nse2, fidx2 = det(zr, zi, True)
            val, pwr, nse, fidx = (
                val2[:TC], pwr2[:TC], nse2[:TC], fidx2[:TC]
            )
            squelched = (pwr - nse) < thr
            q = (val + 4) // 8
            q1 = (val2[TC:] + 4) // 8
            searching = state == 0
            is_sync = (
                searching
                & ~squelched
                & (prev_q == 0)
                & (q == sync0)
                & (q1 == sync1)
            )
            state = jnp.where(is_sync, 1, state)
            k_sync = jnp.where(is_sync, k, k_sync)
            ferr = jnp.where(
                searching & ~is_sync & ~squelched,
                ferr + fidx,
                jnp.where(searching & squelched, 0.0, ferr),
            )
            prev_q = jnp.where(searching, q, prev_q)

        # 3. downchirp pair at k_sync+2 / k_sync+3 (masked row select),
        #    stacked into one (2*TC, N) down-chirp detect like the scan
        dc0r = jnp.zeros((TC, N), jnp.float32)
        dc0i = jnp.zeros((TC, N), jnp.float32)
        dc1r = jnp.zeros((TC, N), jnp.float32)
        dc1i = jnp.zeros((TC, N), jnp.float32)
        for k in range(2, NW):
            m0 = (k_sync + 2 == k).astype(jnp.float32)
            m1 = (k_sync + 3 == k).astype(jnp.float32)
            wr, wi = swr(k), swi(k)
            dc0r = dc0r + m0 * wr
            dc0i = dc0i + m0 * wi
            dc1r = dc1r + m1 * wr
            dc1i = dc1i + m1 * wi
        zdr, zdi = _dechirp_shift_vals(
            jnp.concatenate([dc0r, dc1r], 0),
            jnp.concatenate([dc0i, dc1i], 0),
            cd_r, cd_i, jnp.concatenate([ferr, ferr], 0), rv2, True,
        )
        vd, pd, nd, _ = det(zdr, zdi, False)
        v0 = vd[:TC]
        v1, p1, n1 = vd[TC:], pd[TC:], nd[TC:]
        signed = lambda v: jnp.where(v > N // 2, v - N, v).astype(jnp.int32)
        freq_error = _trunc_half_i32(signed(v0) + signed(v1))
        fine_total = ferr + _trunc_half_i32(freq_error).astype(jnp.float32)
        o_state[:] = state
        o_ksync[:] = k_sync
        o_fqerr[:] = freq_error
        o_ferr[:] = fine_total
        o_pwr[:] = p1
        o_snr[:] = p1 - n1

    return kernel


@functools.partial(
    jax.jit, static_argnames=("sync0", "sync1", "thresh", "interpret", "bf16")
)
def _track_flat(xs: IQ, rs: jax.Array, sync0: int, sync1: int,
                thresh: float, interpret: bool, bf16: bool = False):
    """xs: IQ [B, TRACK_ROWS, N] aligned rows at t0//N; rs = t0 % N."""
    B, R, N = xs.shape
    assert R == TRACK_ROWS, (R, TRACK_ROWS)
    TC = _track_tc(N)
    pad = (-B) % TC
    if pad:
        xs = cplx.pad(xs, ((0, pad), (0, 0), (0, 0)))
        rs = jnp.pad(rs, (0, pad))
    Bp = B + pad
    det_specs, det_arrays, make_det = _detect_args(N, bf16)
    cre, cim = _dechirp_table_np(N, False)
    dre, dim = _dechirp_table_np(N, True)
    const = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    rv = (rs.astype(jnp.int32) % N).reshape(Bp, 1)
    in_specs = [
        pl.BlockSpec((TC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (TC, R, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (TC, R, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        const((1, N)),
        const((1, N)),
        const((1, N)),
        const((1, N)),
    ] + det_specs
    out_spec = pl.BlockSpec(
        (TC, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Bp // TC,),
        in_specs=in_specs,
        out_specs=[out_spec] * 6,
        scratch_shapes=[pltpu.VMEM((TC, N), jnp.float32)] * (2 * N_TRACK_WIN),
    )
    kernel = _track_kernel_factory(N, TC, sync0, sync1, thresh, make_det)
    n_det = 2 * N_SCAN + 2
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the window scratch + double-buffered row blocks exceed the
            # default scoped-VMEM budget at TC=24; v5e has 128 MB VMEM
            vmem_limit_bytes=40 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * Bp * n_det * N * (min(N, 128) + max(1, N // 128)),
            bytes_accessed=Bp * R * N * 8 + Bp * 24,
            transcendentals=2 * Bp * n_det * N,
        ),
        interpret=interpret,
    )(rv, xs.re, xs.im,
      jnp.asarray(cre)[None], jnp.asarray(cim)[None],
      jnp.asarray(dre)[None], jnp.asarray(dim)[None],
      *det_arrays)
    state, k_sync, freq_error, fine_total, power, snr = outs
    cut = lambda a: a[:B, 0]
    return {
        "synced": cut(state) == 1,
        "k_sync": cut(k_sync),
        "freq_error": cut(freq_error),
        "fine_total": cut(fine_total),
        "power": cut(power),
        "snr": cut(snr),
    }


def track(xs, rs, sync: int, thresh: float, interpret: bool = False,
          bf16: bool = False):
    """Fused tracking stage over aligned scan rows.

    xs: IQ [..., TRACK_ROWS, N] rows gathered at t0 // N; rs = t0 % N.
    Returns a dict of [...]-shaped outputs: synced (sync word matched),
    k_sync (aligned window index of the sync symbol), freq_error (coarse
    CFO, bins), fine_total (fine CFO for the payload derotator), power /
    snr (dB, from the second downchirp) — the exact outputs of the XLA
    scan path in models/demodulator._scan_track."""
    xs = cplx.as_iq(xs)
    *lead, R, N = xs.shape
    B = int(np.prod(lead)) if lead else 1
    xsf = xs.reshape(B, R, N)
    rsf = jnp.broadcast_to(jnp.asarray(rs), tuple(lead)).reshape(B)
    out = _track_flat(
        xsf, rsf, sync >> 4, sync & 0xF, float(thresh), interpret, bf16
    )
    return {k: v.reshape(*lead) for k, v in out.items()}


@functools.partial(
    jax.jit, static_argnames=("sync0", "sync1", "thresh", "interpret", "bf16")
)
def _track_direct(x3: IQ, q: jax.Array, rs: jax.Array, sync0: int,
                  sync1: int, thresh: float, interpret: bool,
                  bf16: bool = False):
    """Direct track kernel.  x3: IQ [B, W, N] whole-buffer row view;
    q: int32 [B] aligned-row offsets (t0 // N); rs = t0 % N.
    Output-identical to _track_flat(gather_rows(x, q, TRACK_ROWS, N), rs)."""
    B, W, N = x3.shape
    R = TRACK_ROWS
    TC = track_direct_tc(N, W, B)
    assert TC is not None, (N, W, B)
    rpp = _track_direct_rpp(W)
    det_specs, det_arrays, make_det = _detect_args(N, bf16)
    cre, cim = _dechirp_table_np(N, False)
    dre, dim = _dechirp_table_np(N, True)
    const = lambda shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    qc = jnp.clip(q.astype(jnp.int32), 0, W - R)  # == gather_rows's clamp
    # 8-aligned slice start + remainder (see _payload_direct); the clamp
    # bound (W - rpp) // 8 is exact because W % 8 == 0 (route gate)
    q8 = jnp.minimum(qc // 8, (W - rpp) // 8)
    rem = qc - q8 * 8
    rv = (rs.astype(jnp.int32) % N).reshape(B, 1)
    in_specs = [
        pl.BlockSpec((TC, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (TC, W, N), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (TC, W, N), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        const((1, N)),
        const((1, N)),
        const((1, N)),
        const((1, N)),
    ] + det_specs
    out_spec = pl.BlockSpec(
        (TC, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // TC,),
        in_specs=in_specs,
        out_specs=[out_spec] * 6,
        scratch_shapes=[pltpu.VMEM((TC, N), jnp.float32)] * (2 * N_TRACK_WIN),
    )
    kernel = _track_kernel_factory(N, TC, sync0, sync1, thresh, make_det, W)
    n_det = 2 * N_SCAN + 2
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * n_det * N * (min(N, 128) + max(1, N // 128)),
            bytes_accessed=B * W * N * 8 + B * 28,
            transcendentals=2 * B * n_det * N,
        ),
        interpret=interpret,
    )(q8, rem, rv, x3.re, x3.im,
      jnp.asarray(cre)[None], jnp.asarray(cim)[None],
      jnp.asarray(dre)[None], jnp.asarray(dim)[None],
      *det_arrays)
    state, k_sync, freq_error, fine_total, power, snr = outs
    cut = lambda a: a[:, 0]
    return {
        "synced": cut(state) == 1,
        "k_sync": cut(k_sync),
        "freq_error": cut(freq_error),
        "fine_total": cut(fine_total),
        "power": cut(power),
        "snr": cut(snr),
    }


def track_direct(x3, q, rs, sync: int, thresh: float,
                 interpret: bool = False, bf16: bool = False):
    """Gather-free fused tracking stage: whole-buffer row view x3
    (IQ [B, W, N]), per-channel aligned-row offset q = t0 // N and
    sub-window shift rs = t0 % N.  Bit-identical to
    track(gather_rows(x, q, TRACK_ROWS, N), rs, sync, thresh) but the
    gathered scan rows never exist in HBM; use when
    track_direct_tc(N, W, B) is not None."""
    x3 = cplx.as_iq(x3)
    B, W, N = x3.shape
    rsb = jnp.broadcast_to(jnp.asarray(rs), (B,))
    return _track_direct(
        x3, jnp.asarray(q), rsb, sync >> 4, sync & 0xF, float(thresh),
        interpret, bf16,
    )
