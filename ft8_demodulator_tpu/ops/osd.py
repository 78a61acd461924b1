"""Ordered-statistics decoding (OSD) of the FT8 LDPC(174,91) code.

A sensitivity extension beyond the reference decoder: when belief
propagation fails to converge, OSD re-derives the codeword algebraically
from the 91 most-reliable linearly-independent bit positions — Gaussian
elimination over GF(2) on a reliability-sorted basis of the code — and
(order 1) also tries flipping each single basis bit, keeping the candidate
closest to the received soft values.  This is the classic decoder WSJT-X
layers over BP for its deepest decodes.

TPU shape: everything is fixed-shape and vmapped over candidates.  The
elimination runs BIT-PACKED — each basis row is 6 uint32 words, so one of
the 174 pivot steps is a handful of bitwise ops on a (batch, 91, 6) tensor
instead of float ops on (batch, 91, 174) (measured ~30x less HBM traffic).

Acceptance is CRC-14 plus a soft-distance gate: every OSD output is a
valid codeword by construction, so unlike BP there is no syndrome check.
The gate compares the reliability-weighted disagreement with the hard
decision against the non-pivot reliability mass (any OSD candidate agrees
with the hard decision at every pivot): genuine decodes measure <= 0.32,
CRC-coincidence false accepts >= 0.35 (see tests/test_osd.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..protocol import constants as C

__all__ = ["osd_decode_batch", "DEFAULT_LAMBDA"]

_N, _K = C.LDPC_N, C.LDPC_K
_W = (_N + 31) // 32          # 6 uint32 words per 174-bit row

DEFAULT_LAMBDA = 0.33


def _basis() -> np.ndarray:
    """(91, 174) GF(2) basis of the code: rows [e_i | column i of parity]."""
    b = np.zeros((_K, _N), np.uint8)
    b[:, :_K] = np.eye(_K, dtype=np.uint8)
    b[:, _K:] = C.LDPC_GENERATOR.T          # (91, 83)
    return b


_BASIS_BITS = jnp.asarray(_basis())        # (91, 174) uint8


def _pack(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 174) {0,1} -> (..., 6) uint32, bit j in word j//32 at bit j%32."""
    pad = _W * 32 - _N
    b = jnp.pad(bits.astype(jnp.uint32), [(0, 0)] * (bits.ndim - 1)
                + [(0, pad)])
    b = b.reshape(*bits.shape[:-1], _W, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def _unpack(words: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) uint32 -> (..., 174) {0,1} float32."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*words.shape[:-1], _W * 32)[..., :_N] \
        .astype(jnp.float32)


def _xor_reduce_rows(a: jnp.ndarray) -> jnp.ndarray:
    """XOR-fold (91, W) -> (W,) via a padded binary tree."""
    rows = a
    n = 128
    rows = jnp.concatenate(
        [rows, jnp.zeros((n - rows.shape[0], rows.shape[1]), rows.dtype)])
    while n > 1:
        n //= 2
        rows = rows[:n] ^ rows[n: 2 * n]
    return rows[0]


def _reduce_basis_packed(a: jnp.ndarray):
    """Row-reduce the column-permuted packed basis a (91, W uint32).

    Returns (reduced packed basis, pivot column index per row).  The basis
    has rank 91, so exactly 91 of the 174 steps place a pivot.
    """
    rows_idx = jnp.arange(_K)

    def step(j, state):
        a, used, pcol = state
        word = j >> 5
        bit = (j & 31).astype(jnp.uint32)
        col = (jax.lax.dynamic_index_in_dim(a, word, axis=1,
                                            keepdims=False) >> bit) \
            & jnp.uint32(1)                              # (91,)
        avail = col * (1 - used)
        i = jnp.argmax(avail)
        found = avail[i] > 0
        row = a[i]                                       # (W,)
        elim = (col * jnp.where(found, 1, 0)).at[i].set(0)  # rows to clear
        a = a ^ (elim[:, None].astype(jnp.uint32) * row[None, :])
        used = used.at[i].add(jnp.where(found, 1, 0))
        pcol = jnp.where((rows_idx == i) & found, j, pcol)
        return a, used, pcol

    used0 = jnp.zeros((_K,), jnp.uint32)
    pcol0 = jnp.zeros((_K,), jnp.int32)
    # (a scan with unroll=8 measured slightly SLOWER on v5e — the 174 pivot
    # steps are genuinely sequential vector work, not dispatch overhead)
    a, _, pcol = jax.lax.fori_loop(0, _N, step, (a, used0, pcol0))
    return a, pcol


def _osd_one(llr: jnp.ndarray, lam: float):
    """OSD(1) for one candidate's (174,) LLR vector.

    Returns (plain (174,) int32, ok bool).
    """
    w = jnp.abs(llr)
    r = (llr > 0).astype(jnp.float32)
    order = jnp.argsort(-w)                              # most reliable first

    a_bits = _BASIS_BITS[:, order]                       # (91, 174)
    a, pcol = _reduce_basis_packed(_pack(a_bits))

    r_sorted = r[order]
    w_sorted = w[order]

    # order-0 codeword: XOR of basis rows whose pivot bit is set in r
    sel = r_sorted[pcol].astype(jnp.uint32)              # (91,)
    base = _xor_reduce_rows(a * sel[:, None])            # (W,)

    # order-1: flip each of the 91 basis bits; row 0 is the unflipped base
    cands_packed = jnp.concatenate([base[None, :], base[None, :] ^ a],
                                   axis=0)               # (92, W)
    cands = _unpack(cands_packed)                        # (92, 174) sorted

    dist = jnp.sum(w_sorted[None, :] * jnp.abs(cands - r_sorted[None, :]),
                   axis=-1)                              # (92,)

    # un-permute each candidate back to natural bit order
    inv = jnp.argsort(order)
    cands_nat = cands[:, inv]                            # (92, 174)

    bits77 = cands_nat[:, : C.PAYLOAD_BITS]
    crc_bits = jnp.mod(bits77 @ _CRC_MATRIX_77_T, 2.0).astype(jnp.int32)
    crc_calc = jnp.sum(crc_bits * _CRC_WEIGHTS, axis=-1)
    crc_extracted = jnp.sum(
        cands_nat[:, C.PAYLOAD_BITS: _K].astype(jnp.int32) * _CRC_WEIGHTS,
        axis=-1)
    nonzero = jnp.sum(cands_nat, axis=-1) > 0
    crc_ok = (crc_calc == crc_extracted) & nonzero

    nonpivot_mass = jnp.sum(w) - jnp.sum(w_sorted[pcol])
    gate = dist <= lam * nonpivot_mass
    ok_each = crc_ok & gate
    # pick the smallest-distance accepted candidate
    masked = jnp.where(ok_each, dist, jnp.inf)
    best = jnp.argmin(masked)
    ok = jnp.isfinite(masked[best])
    return cands_nat[best].astype(jnp.int32), ok


_CRC_MATRIX_77_T = jnp.asarray(C.CRC_MATRIX_77.T, dtype=jnp.float32)
_CRC_WEIGHTS = jnp.asarray(2 ** np.arange(C.CRC_BITS - 1, -1, -1),
                           dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("lam",))
def osd_decode_batch(llrs: jnp.ndarray, lam: float = DEFAULT_LAMBDA):
    """(..., 174) LLRs -> (plain (..., 174) int32, accepted (...,) bool)."""
    flat = llrs.reshape(-1, _N)
    plain, ok = jax.vmap(lambda l: _osd_one(l, lam))(flat)
    return (plain.reshape(*llrs.shape[:-1], _N),
            ok.reshape(llrs.shape[:-1]))
