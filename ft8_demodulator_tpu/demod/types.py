"""Decode result structures.

The jitted core returns a fixed-shape pytree (SlotDecodeResult); the host
API converts valid rows into FT8Decode records mirroring the reference's
(FT8Message, FT8DecodeStatus, time, freq, score) tuples
(src/ft8_tools/ft8_demodulator/ftx_types.py:50-60, ft8_decode.py:384-391).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp


class SlotDecodeResult(NamedTuple):
    """Fixed-shape (K candidates) decode output of one slot; device-side."""

    success: jnp.ndarray        # (K,) bool — ldpc ok, crc ok, candidate valid
    payload: jnp.ndarray        # (K, 10) uint8 payload bytes
    crc: jnp.ndarray            # (K,) int32 — calculated CRC (message hash)
    crc_extracted: jnp.ndarray  # (K,) int32 — CRC bits carried in the frame
    ldpc_errors: jnp.ndarray    # (K,) int32 — best syndrome weight seen
    abs_time: jnp.ndarray       # (K,) int32 waterfall time index (may be <0)
    abs_freq: jnp.ndarray       # (K,) int32 waterfall frequency index
    score: jnp.ndarray          # (K,) float32 sync score
    candidate_valid: jnp.ndarray  # (K,) bool — candidate passed min_score


@dataclass(frozen=True)
class FT8Message:
    """Decoded message payload (API parity with the reference)."""

    payload: bytes              # 10 bytes, 77-bit message MSB-first
    hash: int                   # CRC-14 reused as message hash


@dataclass(frozen=True)
class FT8DecodeStatus:
    """Per-candidate decode status (API parity with the reference)."""

    ldpc_errors: int = 0
    crc_extracted: int = 0
    crc_calculated: int = 0


@dataclass(frozen=True)
class FT8Decode:
    """One decoded message with its sync position."""

    message: FT8Message
    status: FT8DecodeStatus
    time_sec: float             # signal time of the frame start (seconds)
    freq_hz: float              # base tone frequency (Hz)
    score: float                # sync score
    snr_db: float | None = None  # est. SNR re 2500 Hz noise bandwidth
                                 # (WSJT-X convention); None if not computed

    def astuple(self):
        """(message, status, time, freq, score) — the reference's row shape."""
        return (self.message, self.status, self.time_sec, self.freq_hz,
                self.score)
