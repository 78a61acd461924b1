"""LDPC(174,91) sum-product belief propagation as a fixed-iteration kernel.

The reference decoder (src/ft8_tools/ft8_demodulator/ldpc_decoder.py:54) runs
a Python triple loop per iteration with data-dependent early exit.  Here one
iteration is a handful of gathers over constant adjacency tables plus
elementwise tanh algebra, a jax.lax.scan runs a static number of iterations,
and the early-exit semantics are reproduced with a "halted" mask so the
whole thing vmaps over candidates:

* hard-decision converging to the (forbidden) all-zero codeword freezes the
  state without improving min_errors (ldpc_decoder.py:76-78),
* reaching zero parity errors freezes the state with that codeword,
* otherwise min_errors tracks the best syndrome seen.

tanh/atanh use the same rational (Pade) approximations as the reference —
they are division+multiply only, ideal for the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..protocol import constants as C

__all__ = ["fast_tanh", "fast_atanh", "ldpc_check", "bp_decode",
           "bp_decode_batch"]

_CHECK_ADJ = jnp.asarray(C.CHECK_ADJ)                  # (83, 7) 0-based, -1 pad
_CHECK_MASK = jnp.asarray(C.CHECK_MASK)                # (83, 7)
_CHECK_ADJ_SAFE = jnp.asarray(C.CHECK_ADJ.clip(min=0))
_CHECK_SLOT_IN_VAR = jnp.asarray(C.CHECK_SLOT_IN_VAR)  # (83, 7)
_VAR_ADJ = jnp.asarray(C.VAR_ADJ)                      # (174, 3)
_VAR_SLOT_IN_CHECK = jnp.asarray(C.VAR_SLOT_IN_CHECK)  # (174, 3)
_PARITY = jnp.asarray(C.PARITY_CHECK.astype(jnp.float32))  # (83, 174)


def fast_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """Rational tanh approximation, input clipped to +-4.97 (ft8_lib form)."""
    x = jnp.clip(x, -4.97, 4.97)
    x2 = x * x
    a = x * (945.0 + x2 * (105.0 + x2))
    b = 945.0 + x2 * (420.0 + x2 * 15.0)
    return a / b


def fast_atanh(x: jnp.ndarray) -> jnp.ndarray:
    """Rational atanh approximation (ft8_lib form)."""
    x2 = x * x
    a = x * (945.0 + x2 * (-735.0 + x2 * 64.0))
    b = 945.0 + x2 * (-1050.0 + x2 * 225.0)
    return a / b


def ldpc_check(plain: jnp.ndarray) -> jnp.ndarray:
    """(..., 174) hard bits -> number of failed parity checks."""
    syndrome = jnp.mod(
        jnp.matmul(plain.astype(jnp.float32), _PARITY.T,
                   precision=jax.lax.Precision.HIGHEST), 2.0)
    return jnp.sum(syndrome, axis=-1).astype(jnp.int32)


def _bp_iteration(llr, tov, toc):
    """One sum-product iteration; returns updated (tov, toc)."""
    # variable -> check: for check m slot i with variable n,
    # Tnm = llr[n] + sum_j tov[n, j] - tov[n, slot_of_m]
    tov_sum = llr + jnp.sum(tov, axis=-1)                     # (174,)
    n_of = _CHECK_ADJ_SAFE                                    # (83, 7)
    tnm = tov_sum[n_of] - jnp.take_along_axis(
        tov[n_of], _CHECK_SLOT_IN_VAR[..., None], axis=-1
    )[..., 0]
    toc = jnp.where(_CHECK_MASK, fast_tanh(-tnm / 2.0), 1.0)  # (83, 7)

    # check -> variable: for variable n slot j with check m,
    # Tmn = prod over check m's slots except n's own slot
    rows = toc[_VAR_ADJ]                                      # (174, 3, 7)
    excl = jnp.arange(C.CHECK_MAX_DEG)[None, None, :] == \
        _VAR_SLOT_IN_CHECK[..., None]
    tmn = jnp.prod(jnp.where(excl, 1.0, rows), axis=-1)       # (174, 3)
    tov = -2.0 * fast_atanh(tmn)
    return tov, toc


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def bp_decode(llr: jnp.ndarray, max_iterations: int = 20):
    """(174,) LLRs -> (plain (174,) int32, min_errors int32).

    Fixed-shape equivalent of the reference bp_decode (ldpc_decoder.py:54):
    the scan always runs max_iterations steps; a halted mask freezes the
    state once the reference would have broken out.
    """
    # derive the zero inits from llr so they inherit its sharding/varying
    # axes — plain jnp.zeros constants break lax.scan's carry-type check
    # when this kernel runs inside shard_map
    zero = llr[0] * 0.0
    tov0 = jnp.zeros((C.LDPC_N, C.VAR_MAX_DEG), jnp.float32) + zero
    toc0 = jnp.zeros((C.LDPC_M, C.CHECK_MAX_DEG), jnp.float32) + zero
    plain0 = jnp.zeros((C.LDPC_N,), jnp.int32) + zero.astype(jnp.int32)
    min0 = jnp.int32(C.LDPC_M) + zero.astype(jnp.int32)
    halted0 = zero != 0.0
    state0 = (tov0, toc0, plain0, min0, halted0)

    def step(state, _):
        tov, toc, plain_out, min_err, halted = state
        messages = llr + jnp.sum(tov, axis=-1)
        plain = (messages > 0).astype(jnp.int32)
        zero_cw = jnp.sum(plain) == 0
        errors = ldpc_check(plain)

        live = ~halted
        # reference order: zero-codeword break happens before the error
        # check, so min_errors must not absorb the zero codeword's syndrome
        new_min = jnp.where(live & ~zero_cw, jnp.minimum(min_err, errors),
                            min_err)
        new_plain = jnp.where(live, plain, plain_out)
        new_halted = halted | (live & (zero_cw | (errors == 0)))

        tov_next, toc_next = _bp_iteration(llr, tov, toc)
        keep = new_halted
        tov = jnp.where(keep, tov, tov_next)
        toc = jnp.where(keep, toc, toc_next)
        return (tov, toc, new_plain, new_min, new_halted), None

    state, _ = jax.lax.scan(step, state0, None, length=max_iterations)
    _, _, plain, min_err, _ = state
    return plain, min_err


def bp_decode_batch(llrs: jnp.ndarray, max_iterations: int = 20):
    """(K, 174) LLRs -> (plain (K, 174), min_errors (K,)) via vmap."""
    return jax.vmap(lambda l: bp_decode(l, max_iterations))(llrs)
