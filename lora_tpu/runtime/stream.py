"""Host streaming runtime: long captures -> all frames, one device step at a
time.

The reference pulls samples through its demod FSM with data-dependent
consume() strides, one symbol per scheduler callback (LoRaDemod.cpp:320).
The TPU runtime instead slides a fixed demod window over each channel's
stream: every device step demodulates one window per channel (finding at
most one frame), then each channel's read pointer advances by that frame's
`consumed` count, or by the safe no-frame stride.  Windows are gathered
host-side per channel (pointers diverge across channels) and dispatched
asynchronously, so the host prepares step k+1 while the device runs step k
— the double-buffering role of the reference's custom buffer managers
(LoRaMod.cpp:241-251, LoRaDemod.cpp:330-358).

This is the carried per-channel state of SURVEY.md §5 "checkpoint/resume":
`StreamDemodulator.offsets` (+ the ring contents) fully describe progress
and can be serialized between runs.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import LoRaConfig
from ..models.demodulator import demodulate, required_samples
from ..models.decoder import decode, OK
from ..ops import cplx
from ..ops.cplx import IQ


@dataclasses.dataclass
class Frame:
    """One recovered frame."""

    channel: int
    t_start: int          # global sample index of the preamble start
    symbols: np.ndarray   # int16 demodulated data symbols (count entries)
    snr: float
    power: float
    freq_error: int
    payload: Optional[bytes] = None  # set by decode_frames
    status: Optional[int] = None
    data_start: int = 0   # global sample index of the first payload symbol


class StreamDemodulator:
    """Multi-frame demodulation over a bank of unbounded channel streams.

    feed() planar sample blocks [B, n] (any n), then drain frames().
    """

    def __init__(
        self,
        cfg: LoRaConfig,
        channels: int,
        max_frames: int = 1,
        exact_advance: bool = False,
    ):
        self.cfg = cfg
        self.B = channels
        self.max_frames = max_frames  # frames recovered per device step
        # exact_advance decodes found frames inside step() and advances by
        # the header-announced frame length instead of the mtu-padded
        # symbol count.  The reference FSM always consumes mtu symbols
        # (LoRaDemod.cpp:286-301) and so eats the next preamble when frames
        # are back-to-back; this option recovers dense traffic exactly.
        self.exact_advance = exact_advance
        self.window = required_samples(cfg)
        # no-frame stride keeps enough tail to re-see a preamble that starts
        # near the window's end
        self.stride = self.window - (cfg.preamble_symbols + 4) * cfg.N
        assert self.stride > 0
        self.offsets = np.zeros(channels, np.int64)  # global read pointers
        self._base = 0  # global index of buf[:, 0]
        self._re = np.zeros((channels, 0), np.float32)
        self._im = np.zeros((channels, 0), np.float32)

    # -- input ---------------------------------------------------------------
    def feed(self, block) -> None:
        """Append samples: IQ/complex [B, n] (host arrays)."""
        if isinstance(block, IQ):
            re, im = np.asarray(block.re), np.asarray(block.im)
        else:
            arr = np.asarray(block)
            re, im = arr.real.astype(np.float32), arr.imag.astype(np.float32)
        assert re.shape[0] == self.B
        self._re = np.concatenate([self._re, re], axis=1)
        self._im = np.concatenate([self._im, im], axis=1)

    def _trim(self) -> None:
        cut = int(self.offsets.min() - self._base)
        if cut > 0:
            self._re = self._re[:, cut:]
            self._im = self._im[:, cut:]
            self._base += cut

    @property
    def _end(self) -> int:
        return self._base + self._re.shape[1]

    def ready(self) -> bool:
        """True if every channel has a full window buffered."""
        return bool(np.all(self.offsets + self.window <= self._end))

    # -- processing ----------------------------------------------------------
    def step(self) -> list[Frame]:
        """One device step: demodulate the current window of every channel."""
        if not self.ready():
            return []
        W = self.window
        idx = (self.offsets - self._base).astype(np.int64)
        rows = np.arange(self.B)[:, None]
        cols = idx[:, None] + np.arange(W)[None, :]
        win = IQ(
            jnp.asarray(self._re[rows, cols]), jnp.asarray(self._im[rows, cols])
        )
        dem = demodulate(win, self.cfg, max_frames=self.max_frames)
        K = self.max_frames

        def arr(a):  # normalize to [B, K, ...]
            a = np.asarray(a)
            return a[:, None] if K == 1 else a

        found = arr(dem.found)
        t_sync = arr(dem.t_sync)
        consumed = arr(dem.consumed)
        counts = arr(dem.count)
        symbols = np.asarray(dem.symbols).reshape(self.B, K, -1)
        snr = arr(dem.snr)
        power = arr(dem.power)
        ferr = arr(dem.freq_error)
        found_pre = arr(dem.found_pre)
        t_cand = arr(dem.t_candidate)

        N = self.cfg.N
        search = W - (self.cfg.preamble_symbols + 2 + 2 + 1 + self.cfg.mtu + 1) * N - N // 4
        frames: list[Frame] = []
        for b in range(self.B):
            advance = None
            accepted_end = 0
            emitted = 0
            for k in range(K):  # candidates are time-ordered
                if not found[b, k]:
                    continue
                t_pre = int(t_sync[b, k]) - self.cfg.preamble_symbols * N
                # a previous frame's mtu overshoot may consume a few
                # preamble symbols, putting the nominal start before the
                # window: clamp for the ordering/room checks
                if max(t_pre, 0) < accepted_end:
                    continue  # overlaps an already-accepted frame
                if t_pre > search:
                    # frame starts too late for its payload to fit: re-aim
                    advance = max(t_pre, 1)
                    break
                frames.append(
                    Frame(
                        channel=b,
                        t_start=int(self.offsets[b]) + t_pre,
                        symbols=symbols[b, k, : counts[b, k]].copy(),
                        snr=float(snr[b, k]),
                        power=float(power[b, k]),
                        freq_error=int(ferr[b, k]),
                        data_start=int(self.offsets[b])
                        + int(consumed[b, k])
                        - int(counts[b, k]) * N,
                    )
                )
                accepted_end = max(int(consumed[b, k]), accepted_end + 1, 1)
                emitted += 1
            if advance is None:
                if emitted:
                    advance = accepted_end
                elif found_pre[b, 0]:
                    # coarse preamble hit but the sync scan ran off the
                    # window's end (frame tail not buffered yet).  The
                    # candidate marks the *run end* (preamble tail), so
                    # re-aim a full preamble before it; advance at least N
                    # so a noise candidate cannot stall the stream
                    advance = max(
                        int(t_cand[b, 0])
                        - (self.cfg.preamble_symbols + 2) * N,
                        N,
                    )
                else:
                    advance = self.stride
            self.offsets[b] += advance
        if self.exact_advance and frames:
            decode_frames(frames, self.cfg)
            for f in frames:
                if f.status == OK:
                    exact_end = f.data_start + self.cfg.num_symbols(
                        len(f.payload)
                    ) * N
                    # pull the pointer back from the mtu-padded advance,
                    # never past what was already consumed earlier
                    if exact_end < self.offsets[f.channel]:
                        self.offsets[f.channel] = max(
                            exact_end, f.data_start
                        )
        self._trim()
        return frames

    def run(self) -> Iterator[Frame]:
        """Drain every ready window."""
        while self.ready():
            yield from self.step()

    # -- checkpoint / resume (SURVEY.md §5) ------------------------------------
    def save_state(self, path: str) -> None:
        """Serialize progress: read pointers + buffered samples.  Together
        with the (static) config this fully describes the stream position —
        the reference has no equivalent (its demod state dies with the
        process, LoRaDemod.cpp:139-143)."""
        np.savez(
            path,
            offsets=self.offsets,
            base=np.int64(self._base),
            re=self._re,
            im=self._im,
        )

    def load_state(self, path: str) -> None:
        z = np.load(path)
        if z["re"].shape[0] != self.B:
            raise ValueError("checkpoint channel count mismatch")
        self.offsets = z["offsets"].copy()
        self._base = int(z["base"])
        self._re = z["re"].copy()
        self._im = z["im"].copy()

    def flush(self) -> list[Frame]:
        """End of capture: zero-pad so trailing complete frames demodulate,
        then drain.  (A frame whose payload extends past the real samples is
        genuinely unrecoverable and is not reported.)"""
        self.feed(
            IQ(
                np.zeros((self.B, self.window), np.float32),
                np.zeros((self.B, self.window), np.float32),
            )
        )
        return list(self.run())


def decode_frames(frames: list[Frame], cfg: LoRaConfig) -> list[Frame]:
    """Batch-decode recovered frames (pads symbol vectors to one length)."""
    if not frames:
        return frames
    n = max(cfg.num_symbols(1), max(len(f.symbols) for f in frames))
    sym = np.zeros((len(frames), n), np.int32)
    for i, f in enumerate(frames):
        sym[i, : len(f.symbols)] = f.symbols
    res = decode(jnp.asarray(sym), cfg)
    data = np.asarray(res.data)
    off = np.asarray(res.offset)
    length = np.asarray(res.length)
    status = np.asarray(res.status)
    for i, f in enumerate(frames):
        f.status = int(status[i])
        if f.status == OK:
            o, l = int(off[i]), int(length[i])
            f.payload = bytes(data[i, o : o + l].tolist())
    return frames
