"""Drop-in compatibility layer for users of the reference package.

Mirrors the reference `ft8_tools` API names, signatures and return shapes
(src/ft8_tools/ft8_generator/__init__.py:7, ft8_demodulator/ft8_decode.py,
ldpc_decoder.py, spectrogram_analyse.py) on top of the TPU-native
implementation, so existing scripts can switch with an import change:

    from ft8_demodulator_tpu import compat as ft8_tools

Numpy in, numpy out; no device types leak through this layer.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .demod.decode import decode_ft8_message as _decode
from .demod.types import FT8Decode, FT8DecodeStatus, FT8Message
from .ops.gfsk import ft8_baseband as _baseband, ft8_passband as _passband
from .ops.ldpc_decode import bp_decode as _bp_decode, ldpc_check as _ldpc_check
from .ops.waterfall import calculate_spectrogram
from .protocol import constants as C
from .protocol.encode import check_crc, crc_generator, encode_tones

__all__ = [
    "crc_generator", "check_crc", "ldpc_generator", "ft8_encode",
    "ft8_baseband_generator", "ft8_generator", "calculate_spectrogram",
    "select_frequency_band", "decode_ft8_message", "bp_decode", "ldpc_check",
    "FT8Message", "FT8DecodeStatus",
]


def ldpc_generator(a91_12bytes: np.ndarray) -> np.ndarray:
    """a91 (12 bytes) -> 174-bit codeword packed into 22 bytes.

    (reference: src/ft8_tools/ft8_generator/ldpc.py:104)
    """
    bits91 = C.bytes_to_bits(np.asarray(a91_12bytes, np.uint8), C.LDPC_K)
    parity = (C.LDPC_GENERATOR @ bits91) % 2
    bits = np.concatenate([bits91, parity]).astype(np.uint8)
    return C.bits_to_bytes(bits)


def ft8_encode(payload: np.ndarray) -> np.ndarray:
    """payload (10 bytes) -> 79 tone ids
    (reference: src/ft8_tools/ft8_generator/encoder.py:64)."""
    return np.asarray(encode_tones(jnp.asarray(np.asarray(payload, np.uint8))))


def ft8_baseband_generator(payload: np.ndarray, fs: float,
                           f0: float) -> np.ndarray:
    """Complex baseband FT8 transmission
    (reference: src/ft8_tools/ft8_generator/modulator.py:77)."""
    return _baseband(np.asarray(payload, np.uint8), fs, f0)


def ft8_generator(payload: np.ndarray, fs: float, f0: float,
                  fc: float) -> np.ndarray:
    """Real passband FT8 transmission
    (reference: src/ft8_tools/ft8_generator/modulator.py:85)."""
    return _passband(np.asarray(payload, np.uint8), fs, f0, fc)


def select_frequency_band(spectrogram: np.ndarray, f: np.ndarray,
                          f_min: float, f_max: float):
    """(reference: src/ft8_tools/ft8_demodulator/spectrogram_analyse.py:68)"""
    mask = (f >= f_min) & (f <= f_max)
    return spectrogram[mask], f[mask]


def bp_decode(codeword_llrs: np.ndarray, max_iterations: int):
    """(174,) LLRs -> (plain bits ndarray, errors int)
    (reference: src/ft8_tools/ft8_demodulator/ldpc_decoder.py:54)."""
    plain, errors = _bp_decode(
        jnp.asarray(np.asarray(codeword_llrs, np.float32)), max_iterations)
    return np.asarray(plain).astype(np.uint8), int(errors)


def ldpc_check(codeword: np.ndarray) -> int:
    """(174,) hard bits -> failed-parity count
    (reference: src/ft8_tools/ft8_demodulator/ldpc_decoder.py:33)."""
    return int(_ldpc_check(jnp.asarray(np.asarray(codeword, np.int32))))


def decode_ft8_message(wave_data, sample_rate, bins_per_tone: int = 2,
                       steps_per_symbol: int = 2, max_candidates: int = 20,
                       min_score: float = 10, max_iterations: int = 20,
                       freq_min=None, freq_max=None, time_min=None,
                       time_max=None):
    """Reference-shaped results: list of (FT8Message, FT8DecodeStatus,
    time_sec, freq_hz, score) tuples, one row per surviving candidate
    (duplicates preserved, like ft8_decode.py:384-391).  Message payloads
    are mutable bytearrays as in the reference."""
    rows = _decode(wave_data, sample_rate, bins_per_tone=bins_per_tone,
                   steps_per_symbol=steps_per_symbol,
                   max_candidates=max_candidates, min_score=min_score,
                   max_iterations=max_iterations, freq_min=freq_min,
                   freq_max=freq_max, time_min=time_min, time_max=time_max,
                   deduplicate=False)
    out = []
    for r in rows:
        msg = FT8Message(payload=bytearray(r.message.payload),
                         hash=r.message.hash)
        out.append((msg, r.status, r.time_sec, r.freq_hz, r.score))
    return out
