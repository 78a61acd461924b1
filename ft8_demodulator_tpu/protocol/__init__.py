"""FT8 protocol layer: constants, GF(2) CRC/LDPC algebra, tone framing."""

from . import constants
from .encode import (
    bits_to_payload,
    check_crc,
    codeword_to_tones,
    crc14,
    crc_generator,
    encode_codeword,
    encode_tones,
    frame_tones,
    payload_to_bits,
)

__all__ = [
    "constants",
    "bits_to_payload",
    "check_crc",
    "codeword_to_tones",
    "crc14",
    "crc_generator",
    "encode_codeword",
    "encode_tones",
    "frame_tones",
    "payload_to_bits",
]
