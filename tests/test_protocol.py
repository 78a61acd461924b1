"""Protocol-core parity tests against reference-generated goldens."""

import jax
import jax.numpy as jnp
import numpy as np

from ft8_demodulator_tpu.protocol import constants as C
from ft8_demodulator_tpu.protocol import (
    bits_to_payload,
    check_crc,
    crc14,
    crc_generator,
    encode_codeword,
    encode_tones,
    payload_to_bits,
)


def _golden_cases(goldens):
    for name in ["p1", "p2", "p3", "p4"]:
        yield (
            goldens[f"{name}_payload"],
            goldens[f"{name}_a91"],
            goldens[f"{name}_codeword"],
            goldens[f"{name}_tones"],
        )


def test_crc_generator_matches_reference(goldens):
    for payload, a91, _, _ in _golden_cases(goldens):
        got = crc_generator(payload)
        np.testing.assert_array_equal(got, a91)
        assert check_crc(got)


def test_crc_detects_corruption(goldens):
    a91 = crc_generator(goldens["p1_payload"])
    a91 = a91.copy()
    a91[0] ^= 0x40  # flip a payload bit
    assert not check_crc(a91)


def test_codeword_matches_reference(goldens):
    for payload, _, codeword, _ in _golden_cases(goldens):
        bits77 = payload_to_bits(jnp.asarray(payload))
        cw_bits = np.asarray(encode_codeword(bits77))
        golden_bits = C.bytes_to_bits(codeword, C.LDPC_N)
        np.testing.assert_array_equal(cw_bits, golden_bits)


def test_codeword_satisfies_parity_checks(goldens):
    for payload, _, _, _ in _golden_cases(goldens):
        bits77 = payload_to_bits(jnp.asarray(payload))
        cw = np.asarray(encode_codeword(bits77))
        syndrome = (C.PARITY_CHECK @ cw) % 2
        assert syndrome.sum() == 0


def test_tones_match_reference(goldens):
    for payload, _, _, tones in _golden_cases(goldens):
        got = np.asarray(encode_tones(jnp.asarray(payload)))
        np.testing.assert_array_equal(got, tones)


def test_encode_is_batchable(goldens):
    payloads = np.stack([goldens["p1_payload"], goldens["p2_payload"]])
    batched = jax.jit(jax.vmap(encode_tones))(jnp.asarray(payloads))
    np.testing.assert_array_equal(np.asarray(batched[0]), goldens["p1_tones"])
    np.testing.assert_array_equal(np.asarray(batched[1]), goldens["p2_tones"])


def test_payload_bits_roundtrip(rng):
    payloads = rng.integers(0, 256, size=(16, 10), dtype=np.uint8)
    payloads[:, 9] &= 0xF8
    bits = payload_to_bits(jnp.asarray(payloads))
    back = np.asarray(bits_to_payload(bits))
    np.testing.assert_array_equal(back, payloads)


def test_crc14_scalar_matches_matrix(goldens):
    # crc14() must agree with the checksum embedded by crc_generator()
    for payload, a91, _, _ in _golden_cases(goldens):
        bits = C.bytes_to_bits(a91, C.LDPC_K)
        embedded = int("".join(map(str, bits[77:91])), 2)
        got = int(crc14(payload_to_bits(jnp.asarray(payload))))
        assert got == embedded


def test_ldpc_tables_consistent():
    # every variable participates in exactly 3 checks; degrees are 6 or 7
    assert C.VAR_ADJ.min() >= 0
    assert set(np.unique(C.CHECK_DEG)) <= {6, 7}
    # cross-position tables invert each other
    for m in range(C.LDPC_M):
        for i in range(C.CHECK_DEG[m]):
            n = C.CHECK_ADJ[m, i]
            assert C.VAR_ADJ[n, C.CHECK_SLOT_IN_VAR[m, i]] == m
    for n in range(C.LDPC_N):
        for j in range(C.VAR_MAX_DEG):
            m = C.VAR_ADJ[n, j]
            assert C.CHECK_ADJ[m, C.VAR_SLOT_IN_CHECK[n, j]] == n
