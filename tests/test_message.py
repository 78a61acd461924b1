"""FT8 message text codec tests (protocol/message.py, beyond-reference).

The reference handles only raw 10-byte payloads (from_wave.py prints hex);
the codec adds WSJT-X packjt77-style text pack/unpack.  No external
encoder is available in-image, so coverage is: canonical-form roundtrips,
random-payload unpack->pack bit-exactness (exercises every field codec on
arbitrary bit patterns), field-level golden values, and an end-to-end
text -> TX -> RX -> text decode through the real pipeline.
"""

import numpy as np
import pytest

from ft8_demodulator_tpu.protocol import (
    UnsupportedMessageError,
    hash_callsign,
    is_standard_callsign,
    pack_free_text,
    pack_message,
    pack_telemetry,
    remember_callsign,
    unpack_message,
)
from ft8_demodulator_tpu.protocol.message import clear_hash_table

CANONICAL = [
    "CQ K1ABC FN42",
    "K1ABC K9XYZ EN37",
    "K9XYZ K1ABC R-08",
    "K1ABC K9XYZ RRR",
    "K9XYZ K1ABC 73",
    "K1ABC K9XYZ RR73",
    "CQ DX W9XYZ EN37",
    "CQ TEST KA1ABC JO22",
    "CQ 001 K1ABC",
    "DE K1ABC FN42",
    "QRZ K1ABC",
    "K1ABC/R K9XYZ/R FN42",
    "K1ABC/P K9XYZ JO22",
    "K1ABC K9XYZ R FN42",
    "K1ABC K9XYZ +05",
    "K1ABC K9XYZ",
    "CQ PJ4/K1ABC",
    "PJ4/K1ABC <W9XYZ> RRR",
    "<W9XYZ> PJ4/K1ABC 73",
    "TNX BOB 73 GL",
    "HELLO?",
]


@pytest.mark.parametrize("msg", CANONICAL)
def test_canonical_roundtrip(msg):
    p = pack_message(msg)
    assert p.shape == (10,) and p.dtype == np.uint8
    assert unpack_message(p) == msg


def test_payload_input_forms():
    p = pack_message("CQ K1ABC FN42")
    assert unpack_message(bytes(p.tobytes())) == "CQ K1ABC FN42"
    assert unpack_message(bytearray(p.tobytes())) == "CQ K1ABC FN42"
    assert unpack_message(p.tolist()) == "CQ K1ABC FN42"


def test_field_goldens():
    """Known field encodings: token values and the FN42 grid number."""
    v = int.from_bytes(pack_message("CQ K1ABC FN42").tobytes(), "big") >> 3
    assert v & 7 == 1                               # i3 = 1 standard
    assert (v >> 3) & 0x7FFF == 10342               # g15 of FN42
    assert (v >> 49) == 2                           # c28 of CQ (r1a = 0)
    v = int.from_bytes(pack_message("DE K1ABC").tobytes(), "big") >> 3
    assert (v >> 49) == 0
    v = int.from_bytes(pack_message("QRZ K1ABC").tobytes(), "big") >> 3
    assert (v >> 49) == 1
    # blank third field packs as MAXGRID4 + 1
    v = int.from_bytes(pack_message("K1ABC K9XYZ").tobytes(), "big") >> 3
    assert (v >> 3) & 0x7FFF == 32401


def test_random_standard_payload_bit_roundtrip():
    """unpack -> pack is bit-exact for arbitrary type-1/2 payloads whose
    fields land in directly-representable space (no hashed calls, no
    reserved token range) — every field codec inverts exactly."""
    rng = np.random.default_rng(11)
    tried = exact = 0
    for _ in range(400):
        v = int(rng.integers(0, 1 << 62)) | (int(rng.integers(0, 1 << 15)) << 62)
        v = (v >> 3) << 3 | int(rng.integers(1, 3))        # i3 in {1, 2}
        payload = np.frombuffer(((v << 3).to_bytes(10, "big")), np.uint8)
        try:
            text = unpack_message(payload)
        except UnsupportedMessageError:
            continue
        if "<" in text or text.startswith("CQ ?"):
            continue                                      # not re-packable
        try:
            repacked = pack_message(text)
        except ValueError:
            # non-canonical encodings random bits can hit but real packing
            # never emits (e.g. /R on a CQ token, 3-digit reports)
            continue
        tried += 1
        rt = unpack_message(repacked)
        assert rt == text, (v, text, rt)
        if int.from_bytes(pack_message(text).tobytes(), "big") >> 3 == v:
            exact += 1
    assert tried > 50
    # most sampled payloads repack to the identical 77 bits (the rest
    # differ only in equivalent encodings of out-of-convention fields,
    # e.g. the literal grid "RR73" re-packing as the irpt-3 code)
    assert exact >= tried * 0.8


def test_free_text_right_justified():
    a = pack_free_text("73 GL")
    b = pack_free_text("  73 GL  ")
    assert np.array_equal(a, b)
    assert unpack_message(a) == "73 GL"
    with pytest.raises(ValueError):
        pack_free_text("THIS IS TOO LONG")
    with pytest.raises(ValueError):
        pack_free_text("lowercase#!")


def test_telemetry():
    p = pack_telemetry("123456789ABCDEF01")
    assert unpack_message(p) == "123456789ABCDEF01"
    assert unpack_message(pack_telemetry("0")) == "0"
    with pytest.raises(ValueError):
        pack_telemetry("F" * 18)                  # 72 bits, over 71
    with pytest.raises(ValueError):
        pack_telemetry("XYZ")


def test_unsupported_types_raise():
    for i3n3 in [(0, 2), (0, 3), (0, 4), (3, 0), (5, 0)]:
        v = (i3n3[1] << 3) | i3n3[0]
        payload = np.frombuffer((v << 3).to_bytes(10, "big"), np.uint8)
        with pytest.raises(UnsupportedMessageError):
            unpack_message(payload)


def test_hash_table_resolution():
    clear_hash_table()
    p = pack_message("PJ4/K1ABC K9XYZ RR73")   # hashes K9XYZ on pack
    assert unpack_message(p) == "PJ4/K1ABC <K9XYZ> RR73"
    clear_hash_table()
    assert unpack_message(p) == "PJ4/K1ABC <...> RR73"
    remember_callsign("K9XYZ")
    assert unpack_message(p) == "PJ4/K1ABC <K9XYZ> RR73"
    # a standard message with a bracketed (22-bit hashed) first call
    p = pack_message("<PJ4/K1ABC> K9XYZ FN42")
    assert unpack_message(p) == "<PJ4/K1ABC> K9XYZ FN42"
    clear_hash_table()
    assert unpack_message(p) == "<...> K9XYZ FN42"


def test_hash_widths_consistent():
    h22 = hash_callsign("K1ABC", 22)
    h12 = hash_callsign("K1ABC", 12)
    h10 = hash_callsign("K1ABC", 10)
    assert h12 == h22 >> 10 and h10 == h22 >> 12
    with pytest.raises(ValueError):
        hash_callsign("K1ABC", 16)


def test_is_standard_callsign():
    assert is_standard_callsign("K1ABC")
    assert is_standard_callsign("KA1ABC")
    assert is_standard_callsign("G4AAA")
    assert not is_standard_callsign("PJ4/K1ABC")
    assert not is_standard_callsign("3DA0AA")     # digit in position 4
    assert not is_standard_callsign("TOOLONGCALL")


def test_text_to_rf_to_text():
    """The full user flow: message text -> TX waveform -> decode -> text."""
    from ft8_demodulator_tpu.demod import decode_ft8_message
    from ft8_demodulator_tpu.ops.gfsk import ft8_passband

    fs = 2000.0
    payload = pack_message("CQ K1ABC FN42")
    w = np.asarray(ft8_passband(payload, fs, 500.0, 0.0))
    sig = np.zeros(int(fs * 15), np.float32)
    sig[400: 400 + len(w)] = w
    rng = np.random.default_rng(12)
    sp = float(np.mean(w ** 2))
    sig += rng.standard_normal(len(sig)).astype(np.float32) \
        * np.sqrt(sp / 10 ** (-10.0 / 10))
    results = decode_ft8_message(sig, fs, min_score=1.0)
    texts = [unpack_message(r.message.payload) for r in results]
    assert "CQ K1ABC FN42" in texts


def test_digit_only_tokens_are_not_callsigns():
    """"73"/"599" fit the 28-bit field's degenerate space but are not
    callsigns: sign-offs after a nonstandard call must fall through to
    free text, not pack as a hashed second call (review regression)."""
    assert not is_standard_callsign("73")
    assert not is_standard_callsign("599")
    assert unpack_message(pack_message("PJ4/K1ABC 73")) == "PJ4/K1ABC 73"
    assert unpack_message(pack_message("K1ABC 73")) == "K1ABC 73"


def test_hash_callsign_validates_input():
    with pytest.raises(ValueError, match="unsupported character"):
        hash_callsign("K1ABC-1")
    with pytest.raises(ValueError, match="1-11 chars"):
        hash_callsign("LONGCALLSIGN1")
    # a bad bracketed call degrades to a clean ValueError, not a cryptic
    # str.index failure
    with pytest.raises(ValueError):
        pack_message("<K1ABC-1> K9XYZ FN42")


def test_dxpedition_roundtrip():
    """Type 0.1 (DXpedition / Fox-and-Hound): simultaneous RR73 + report,
    the Fox's (often nonstandard) call as a 10-bit hash."""
    from ft8_demodulator_tpu.protocol.message import (clear_hash_table,
                                                      pack_message,
                                                      unpack_message)

    clear_hash_table()
    p = pack_message("K1ABC RR73; W9XYZ <KH1/KH7Z> -08")
    v = int.from_bytes(bytes(p.tolist()), "big") >> 3
    assert v & 7 == 0 and (v >> 3) & 7 == 1          # i3=0, n3=1
    # the packer remembered the fox call, so the hash resolves
    assert unpack_message(p) == "K1ABC RR73; W9XYZ <KH1/KH7Z> -08"

    clear_hash_table()                                # cold receiver
    assert unpack_message(p) == "K1ABC RR73; W9XYZ <...> -08"

    # report range is even -30..+32
    for txt in ("K1ABC RR73; W9XYZ <KH1/KH7Z> -30",
                "K1ABC RR73; W9XYZ <KH1/KH7Z> +32",
                "CQ RR73; W9XYZ <K1A> +00"):
        assert unpack_message(pack_message(txt)).endswith(txt[-3:])


def test_dxpedition_rejects_malformed():
    """A malformed 0.1 message (no fox hash / odd report) never packs as
    a silently-wrong 0.1 payload — it falls through to free text, whose
    alphabet has no ';' and so raises."""
    import pytest

    from ft8_demodulator_tpu.protocol.message import pack_message

    for txt in ("K1ABC RR73; W9XYZ",                      # no fox/report
                "K1ABC RR73; W9XYZ <KH1/KH7Z> -07"):      # odd report
        with pytest.raises(ValueError):
            pack_message(txt)
