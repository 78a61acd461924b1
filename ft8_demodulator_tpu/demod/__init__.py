"""RX demodulation: slot decoder and result types."""

from .beacon_session import BeaconSession
from .decode import decode_ft8_message, decode_slot, decode_slots, \
    decode_waterfall, estimate_snr
from .stack import decode_ft8_stacked, decode_slot_stacked
from .types import FT8Decode, FT8DecodeStatus, FT8Message, SlotDecodeResult

__all__ = [
    "BeaconSession",
    "decode_ft8_message",
    "estimate_snr",
    "decode_ft8_stacked",
    "decode_slot",
    "decode_slots",
    "decode_slot_stacked",
    "decode_waterfall",
    "FT8Decode",
    "FT8DecodeStatus",
    "FT8Message",
    "SlotDecodeResult",
]
