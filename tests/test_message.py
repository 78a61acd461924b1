"""FT8 message text codec tests (protocol/message.py, beyond-reference).

The reference handles only raw 10-byte payloads (from_wave.py prints hex);
the codec adds WSJT-X packjt77-style text pack/unpack.  No external
encoder is available in-image, so coverage is: canonical-form roundtrips,
random-payload unpack->pack bit-exactness (exercises every field codec on
arbitrary bit patterns), field-level golden values, and an end-to-end
text -> TX -> RX -> text decode through the real pipeline.
"""

import re

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
    # RTTY Roundup (i3 = 3): TU;/R optional, serial or state/province
    "TU; W9XYZ K1ABC R 579 MA",
    "K1ABC W9XYZ 539 0013",
    "TU; K1ABC W9XYZ 599 DC",
    "W9XYZ K1ABC R 529 7999",
    "CQ K1ABC 569 NWT",
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


def test_random_rtty_ru_payload_bit_roundtrip():
    """unpack -> pack is bit-exact for arbitrary valid i3=3 payloads."""
    rng = np.random.default_rng(12)
    tried = 0
    for _ in range(300):
        v = int(rng.integers(0, 1 << 61))          # t1..r3 bits
        s13 = int(rng.integers(1, 8066))           # serial or table index
        v = (v << 13) | s13
        v = (v << 3) | 3
        payload = np.frombuffer(((v << 3).to_bytes(10, "big")), np.uint8)
        try:
            text = unpack_message(payload)
        except UnsupportedMessageError:
            continue                               # s13 == 8000 edge
        if "<" in text or re.search(r"CQ ([0-9]{3}|[A-Z]{1,4})( |$)", text):
            continue         # hashed call / two-token CQ: not re-packable
        try:
            repacked = pack_message(text)
        except ValueError:
            continue         # e.g. digit-only pseudo-call from random bits
        tried += 1
        assert int.from_bytes(repacked.tobytes(), "big") >> 3 == v, text
    assert tried > 150


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
    # (3, 0) = an i3=3 RTTY RU payload whose exchange field s13 is 0,
    # (0, 3) = a Field Day payload whose section index S7 is 0 — those
    # types are implemented but the field values are invalid; (0, 2) and
    # (0, 6)/(0, 7) and i3=6/7 are the genuinely reserved subtypes
    for i3n3 in [(0, 2), (0, 6), (0, 7), (6, 0), (7, 0), (3, 0), (0, 3)]:
        v = (i3n3[1] << 3) | i3n3[0]
        payload = np.frombuffer((v << 3).to_bytes(10, "big"), np.uint8)
        with pytest.raises(UnsupportedMessageError):
            unpack_message(payload)


def test_rtty_ru_field_layout():
    """Bit-level golden for the i3=3 layout t1|c28|c28|R1|r3|s13."""
    from ft8_demodulator_tpu.protocol.message import (
        _pack28, _payload_to_int)

    p = pack_message("TU; W9XYZ K1ABC R 579 MA")
    v = _payload_to_int(p)
    assert v & 7 == 3                              # i3
    assert (v >> 3) & 0x1FFF == 8021               # s13: MA = 21st entry
    assert (v >> 16) & 7 == 5                      # r3: 579
    assert (v >> 19) & 1 == 1                      # R
    assert (v >> 20) & ((1 << 28) - 1) == _pack28("K1ABC")
    assert (v >> 48) & ((1 << 28) - 1) == _pack28("W9XYZ")
    assert (v >> 76) & 1 == 1                      # TU;

    # serial exchange is table-free: s13 carries the number directly
    v2 = _payload_to_int(pack_message("K1ABC W9XYZ 539 0013"))
    assert v2 & 7 == 3 and (v2 >> 3) & 0x1FFF == 13
    assert (v2 >> 76) & 1 == 0 and (v2 >> 19) & 1 == 0


def test_rtty_ru_rejects_malformed():
    # bad report digit (3 digits but strength 1), bad exchange, serial 0
    for bad in ["K1ABC W9XYZ 519 MA", "K1ABC W9XYZ 579 ZZ",
                "K1ABC W9XYZ 579 0000", "K1ABC W9XYZ 579 8000"]:
        with pytest.raises(ValueError):
            # falls through to free text, which rejects >13 chars
            pack_message(bad)

    # out-of-range s13 on unpack -> honest hex fallback path
    v = (8000 + 70) << 3 | 3                       # past the 65-entry table
    payload = np.frombuffer((v << 3).to_bytes(10, "big"), np.uint8)
    with pytest.raises(UnsupportedMessageError):
        unpack_message(payload)


def test_rtty_ru_pack_does_not_corrupt_freetext_fallback():
    # a 5-token near-miss enters the R-elision branch then fails on the
    # calls; the free-text fallback must still see the ORIGINAL tokens
    # ("R" not eaten by the attempted RTTY parse)
    msg = "A B R 529 ZZ"                           # packs as free text
    p = pack_message(msg)
    assert unpack_message(p) == msg


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


# ---------------------------------------------------------------------------
# ARRL Field Day (0.3/0.4) — new in r3 (VERDICT r2 next #3)

def test_field_day_roundtrip_and_layout():
    from ft8_demodulator_tpu.protocol.message import _ARRL_SECTIONS

    # paper examples (QEX Jul/Aug 2020 Table 1 forms)
    for txt, n3 in [("WA9XYZ KA1ABC R 16A EMA", 3),
                    ("WA9XYZ KA1ABC R 32A EMA", 4),
                    ("W9XYZ K1ABC 2B WWA", 3),
                    ("CQ K1ABC 17F AB", 4)]:
        p = pack_message(txt)
        v = int.from_bytes(bytes(p.tolist()), "big") >> 3
        assert v & 7 == 0 and (v >> 3) & 7 == n3, txt
        assert unpack_message(p) == txt
    # every section roundtrips
    for i, sec in enumerate(_ARRL_SECTIONS):
        txt = f"W9XYZ K1ABC 1A {sec}"
        assert unpack_message(pack_message(txt)) == txt


def test_field_day_random_roundtrip():
    from ft8_demodulator_tpu.protocol.message import _ARRL_SECTIONS

    rng = np.random.default_rng(7)
    for _ in range(50):
        ntx = int(rng.integers(1, 33))
        klass = "ABCDEF"[rng.integers(0, 6)]
        sec = _ARRL_SECTIONS[rng.integers(0, len(_ARRL_SECTIONS))]
        r = "R " if rng.integers(0, 2) else ""
        txt = f"W9XYZ K1ABC {r}{ntx}{klass} {sec}"
        assert unpack_message(pack_message(txt)) == txt


def test_field_day_rejects_malformed():
    # bad section / class / transmitter count fall through to free text
    # (or raise when too long for free text) — never a silently-wrong 0.3
    from ft8_demodulator_tpu.protocol.message import _try_pack_field_day

    for txt in ("W9XYZ K1ABC 16A XXX",       # unknown section
                "W9XYZ K1ABC 33A EMA",       # > 32 transmitters
                "W9XYZ K1ABC 16G EMA",       # class G not in A-F
                "W9XYZ K1ABC 0A EMA"):       # zero transmitters
        assert _try_pack_field_day(txt.split()) is None


# ---------------------------------------------------------------------------
# EU VHF contest (i3=5) — new in r3 (VERDICT r2 next #3)

def test_eu_vhf_roundtrip():
    clear_hash_table()
    txt = "<G4ABC> <PA9XYZ> R 570007 JO22DB"
    p = pack_message(txt)
    v = int.from_bytes(bytes(p.tolist()), "big") >> 3
    assert v & 7 == 5
    assert unpack_message(p) == txt           # hashes taught by packing
    clear_hash_table()                        # cold receiver: unresolved
    assert unpack_message(p) == "<...> <...> R 570007 JO22DB"


def test_eu_vhf_random_roundtrip():
    rng = np.random.default_rng(11)
    calls = ["G4ABC", "PA9XYZ", "KH1/KH7Z", "VK9XX", "SP5ABC"]
    for _ in range(50):
        clear_hash_table()
        c1, c2 = rng.choice(calls, 2, replace=False)
        rpt = int(rng.integers(52, 60))
        ser = int(rng.integers(0, 2048))
        r = "R " if rng.integers(0, 2) else ""
        g = (chr(65 + rng.integers(0, 18)) + chr(65 + rng.integers(0, 18))
             + str(rng.integers(0, 10)) + str(rng.integers(0, 10))
             + chr(65 + rng.integers(0, 24)) + chr(65 + rng.integers(0, 24)))
        txt = f"<{c1}> <{c2}> {r}{rpt}{ser:04d} {g}"
        assert unpack_message(pack_message(txt)) == txt


def test_eu_vhf_field_layout():
    """Bit-level golden for the i3=5 layout h12|h22|R1|r3|s11|g25."""
    from ft8_demodulator_tpu.protocol.message import hash_callsign

    p = pack_message("<G4ABC> <PA9XYZ> R 570007 JO22DB")
    v = int.from_bytes(bytes(p.tolist()), "big") >> 3
    assert v & 7 == 5
    g25 = (v >> 3) & ((1 << 25) - 1)
    s11 = (v >> 28) & 0x7FF
    r3 = (v >> 39) & 7
    r1 = (v >> 42) & 1
    h22 = (v >> 43) & ((1 << 22) - 1)
    h12 = (v >> 65) & 0xFFF
    assert h12 == hash_callsign("G4ABC", 12)
    assert h22 == hash_callsign("PA9XYZ", 22)
    assert (r1, r3, s11) == (1, 57 - 52, 7)
    # JO22DB: J=9,O=14,2,2,D=3,B=1 mixed-radix 18/18/10/10/24/24
    assert g25 == ((((9 * 18 + 14) * 10 + 2) * 10 + 2) * 24 + 3) * 24 + 1


def test_rtty_serial_must_be_canonical_4_digits():
    """Advisor r2: a short free text that resembles an RTTY RU exchange
    ("DE DE 529 01") must round-trip VERBATIM as free text — WSJT-X only
    packs type 3 in contest mode, and serials render %04d."""
    clear_hash_table()
    p = pack_message("DE DE 529 01")
    v = int.from_bytes(bytes(p.tolist()), "big") >> 3
    assert v & 7 == 0 and (v >> 3) & 7 == 0          # free text, not i3=3
    assert unpack_message(p) == "DE DE 529 01"
    # the canonical 4-digit form still packs as RTTY RU
    p = pack_message("DE DE 529 0001")
    v = int.from_bytes(bytes(p.tolist()), "big") >> 3
    assert v & 7 == 3
    assert unpack_message(p) == "DE DE 529 0001"


# ---------------------------------------------------------------------------
# session-scoped, persistent hash tables (VERDICT r2 next #7)

def test_hash_table_instances_isolated():
    from ft8_demodulator_tpu.protocol.message import CallsignHashTable

    clear_hash_table()
    a, b = CallsignHashTable(), CallsignHashTable()
    p = pack_message("<G4ABC> <PA9XYZ> 520000 AA00AA", hash_table=a)
    assert a.calls() == ["G4ABC", "PA9XYZ"]
    assert b.calls() == [] and len(b) == 0
    # resolution follows the table, not the process
    assert unpack_message(p, hash_table=a).startswith("<G4ABC>")
    assert unpack_message(p, hash_table=b).startswith("<...>")
    # the global table was never touched
    assert unpack_message(p).startswith("<...>")


def test_stream_session_hash_table_survives_checkpoint(tmp_path):
    from ft8_demodulator_tpu.demod.stream_session import StreamSession

    sess = StreamSession(2000.0)
    # teach the session's table via a nonstandard-call message
    sess.unpack(pack_message("PJ4/K1ABC <W9XYZ> RR73",
                             hash_table=sess.hash_table))
    assert "W9XYZ" in sess.hash_table.calls()
    ck = str(tmp_path / "sess.npz")
    sess.save(ck)
    resumed = StreamSession.load(ck)
    assert resumed.hash_table.calls() == sess.hash_table.calls()
    # a <CALL> resolved before save still resolves after load
    from ft8_demodulator_tpu.protocol.message import hash_callsign
    h22 = hash_callsign("W9XYZ", 22)
    assert resumed.hash_table.get(h22, 22) == "W9XYZ"


def test_beacon_session_hash_table_survives_checkpoint(tmp_path):
    from ft8_demodulator_tpu.demod.beacon_session import BeaconSession

    sess = BeaconSession(2000.0, max_repeats=2)
    sess.hash_table.add("KH1/KH7Z")
    ck = str(tmp_path / "beacon.npz")
    sess.save(ck)
    resumed = BeaconSession.load(ck)
    assert resumed.hash_table.calls() == ["KH1/KH7Z"]


# ---------------------------------------------------------------------------
# Exhaustive field-range fuzz (VERDICT r3 next #7): a single-bit
# field-order mistake in the Field Day / EU VHF layouts cannot survive
# these — every discrete field value is packed, position-checked at the
# bit level, and round-tripped.

def test_field_day_exhaustive_full_range():
    """EVERY (section x class x transmitters x R) combination — 84*6*32*2
    = 32,256 frames — packs to the documented c28|c28|R1|n4|k3|S7 layout
    position-exactly and round-trips text-identical."""
    from ft8_demodulator_tpu.protocol.message import (_ARRL_SECTIONS,
                                                      _try_pack_field_day,
                                                      _unpack_field_day)

    for si, sec in enumerate(_ARRL_SECTIONS):
        for k in range(6):
            for ntx in range(1, 33):
                for r in (0, 1):
                    txt = (f"W9XYZ K1ABC {'R ' if r else ''}"
                           f"{ntx}{'ABCDEF'[k]} {sec}")
                    v = _try_pack_field_day(txt.split())
                    assert v is not None, txt
                    n3 = (v >> 3) & 7
                    assert v & 7 == 0
                    assert n3 == (3 if ntx <= 16 else 4), txt
                    f71 = v >> 6
                    assert f71 & 0x7F == si + 1                    # S7
                    assert (f71 >> 7) & 7 == k                     # k3
                    assert (f71 >> 10) & 0xF == \
                        (ntx - 1 if ntx <= 16 else ntx - 17)       # n4
                    assert (f71 >> 14) & 1 == r                    # R1
                    assert _unpack_field_day(f71, n3) == txt


def test_field_day_dispatcher_reaches_every_section():
    """The full pack_message dispatcher (not just the type packer) selects
    type 0.3/0.4 for a strided sweep of the combination space."""
    from ft8_demodulator_tpu.protocol.message import _ARRL_SECTIONS

    for si, sec in enumerate(_ARRL_SECTIONS):
        ntx = 1 + (si * 7) % 32
        k = "ABCDEF"[si % 6]
        r = "R " if si % 2 else ""
        txt = f"W9XYZ K1ABC {r}{ntx}{k} {sec}"
        p = pack_message(txt)
        v = int.from_bytes(bytes(p.tolist()), "big") >> 3
        assert v & 7 == 0 and (v >> 3) & 7 in (3, 4)
        assert unpack_message(p) == txt


def test_eu_vhf_exhaustive_serial_and_report_range():
    """Full s11 serial range 0..2047 (report/R derived per serial so all
    residues are exercised), plus the complete report x R product at the
    serial extremes; serials beyond 2047 must not pack as type 5."""
    from ft8_demodulator_tpu.protocol.message import (_try_pack_eu_vhf,
                                                      _unpack_eu_vhf)

    clear_hash_table()
    for ser in range(2048):
        rpt = 52 + (ser % 8)
        r = "R " if ser % 2 else ""
        txt = f"<G4ABC> <PA9XYZ> {r}{rpt}{ser:04d} JO22DB"
        v = _try_pack_eu_vhf(txt.split())
        assert v is not None and v & 7 == 5, txt
        assert (v >> 28) & 0x7FF == ser                            # s11
        assert (v >> 39) & 7 == rpt - 52                           # r3
        assert (v >> 42) & 1 == (1 if r else 0)                    # R1
        assert _unpack_eu_vhf(v) == txt
    for ser in (0, 2047):
        for rpt in range(52, 60):
            for r in ("", "R "):
                txt = f"<G4ABC> <PA9XYZ> {r}{rpt}{ser:04d} JO22DB"
                assert _unpack_eu_vhf(_try_pack_eu_vhf(txt.split())) == txt
    assert _try_pack_eu_vhf("<G4ABC> <PA9XYZ> 572048 JO22DB".split()) is None


def test_eu_vhf_locator_bijection_full_range():
    """g25 <-> grid6 is a bijection over the whole 18*18*10*10*24*24
    locator space: corners exactly plus a coprime-stride sweep (997 is
    coprime to every radix, so every digit cycles through all its
    values); out-of-range g25 raises instead of aliasing."""
    from ft8_demodulator_tpu.protocol.message import (_g25_to_grid6,
                                                      _grid6_to_g25)

    total = 18 * 18 * 10 * 10 * 24 * 24
    for g in range(0, total, 997):
        grid = _g25_to_grid6(g)
        assert _grid6_to_g25(grid) == g
    for grid in ("AA00AA", "RR99XX", "AR09AX", "RA90XA"):
        assert _g25_to_grid6(_grid6_to_g25(grid)) == grid
    with pytest.raises(UnsupportedMessageError):
        _g25_to_grid6(total)
