"""CLI tests: batch and streaming decode of a synthesized WAV."""

import numpy as np
import pytest

from ft8_demodulator_tpu.cli import main
from ft8_demodulator_tpu.io import write_wave_file
from ft8_demodulator_tpu.ops.gfsk import ft8_passband


@pytest.fixture()
def wav_path(tmp_path, goldens, rng):
    fs = 2000.0
    wave = np.asarray(ft8_passband(goldens["p1_payload"], fs, 400.0, 0.0))
    sig = np.zeros(int(fs * 15), np.float32)
    sig[1000: 1000 + len(wave)] = wave
    sig += rng.standard_normal(len(sig)).astype(np.float32) * 0.02
    path = tmp_path / "t.wav"
    write_wave_file(str(path), sig / np.abs(sig).max() * 0.8, fs)
    want = goldens["p1_payload"].copy()
    want[9] &= 0xF8          # low 3 bits of byte 9 lie past the 77-bit field
    return str(path), want


def _decoded_payloads(capsys):
    lines = capsys.readouterr().out.splitlines()
    return [ln.split(": ")[1] for ln in lines if ln.startswith("Payload:")]


def test_cli_batch_decode(wav_path, capsys):
    path, payload = wav_path
    assert main([path, "--min-score", "5"]) == 0
    out = capsys.readouterr().out
    lines = out.splitlines()
    payloads = [ln.split(": ")[1] for ln in lines if ln.startswith("Payload:")]
    assert bytes(payload.tolist()).hex() in payloads
    # every decode also prints its unpacked text form (the golden payload
    # decodes as an i3=2 standard message)
    from ft8_demodulator_tpu.protocol import unpack_message
    assert f"Message: {unpack_message(bytes(payload.tolist()))}" in lines


def test_cli_stream_decode(wav_path, capsys):
    path, payload = wav_path
    assert main([path, "--stream", "--min-score", "5"]) == 0
    assert bytes(payload.tolist()).hex() in _decoded_payloads(capsys)


def test_cli_missing_file(capsys):
    assert main(["/nonexistent/x.wav"]) == 1


def test_cli_metrics(wav_path, capsys):
    path, payload = wav_path
    assert main([path, "--min-score", "5", "--metrics"]) == 0
    out = capsys.readouterr().out
    import json
    line = next(ln for ln in out.splitlines() if ln.startswith("Metrics: "))
    m = json.loads(line.removeprefix("Metrics: "))
    assert m["decodes"] >= 1 and m["unique_messages"] >= 1
    assert m["candidates_found"] >= m["decodes"]


def test_cli_deep_preset(wav_path, capsys):
    path, payload = wav_path
    assert main([path, "--deep"]) == 0
    assert bytes(payload.tolist()).hex() in _decoded_payloads(capsys)


def test_cli_stream_rejects_unsupported_flags(wav_path, capsys):
    import pytest as _pytest
    path, _ = wav_path
    with _pytest.raises(SystemExit):
        main([path, "--stream", "--freq-min", "300"])
    with _pytest.raises(SystemExit):
        main([path, "--stream", "--passes", "2"])


@pytest.fixture()
def beacon_wav_path(tmp_path, goldens, rng):
    """Four 15-s cycles of one repeating transmission at -17 dB (below the
    single-slot cliff; each cycle alone does not decode)."""
    fs = 2000.0
    wave = np.asarray(ft8_passband(goldens["p1_payload"], fs, 400.0, 0.0))
    sp = float(np.mean(wave ** 2))
    sig = np.zeros((4, int(fs * 15)), np.float32)
    sig[:, 500: 500 + len(wave)] = wave
    sig += rng.standard_normal(sig.shape).astype(np.float32) \
        * np.sqrt(sp / 10 ** (-17.0 / 10))
    flat = sig.reshape(-1)
    path = tmp_path / "beacon.wav"
    write_wave_file(str(path), flat / np.abs(flat).max() * 0.8, fs)
    want = goldens["p1_payload"].copy()
    want[9] &= 0xF8
    return str(path), want


def test_cli_stack_decodes_repeated_beacon(beacon_wav_path, capsys):
    path, payload = beacon_wav_path
    # single-cycle decode of the same file misses it...
    assert main([path, "--time-max", "15", "--min-score", "1",
                 "--osd", "--mf-first"]) == 0
    assert bytes(payload.tolist()).hex() not in _decoded_payloads(capsys)
    # ...the 4-cycle stack decodes it
    assert main([path, "--stack", "4", "--min-score", "1", "--osd"]) == 0
    assert bytes(payload.tolist()).hex() in _decoded_payloads(capsys)


def test_cli_stack_rejects_unsupported_flags(beacon_wav_path):
    path, _ = beacon_wav_path
    with pytest.raises(SystemExit):
        main([path, "--stack", "4", "--stream"])
    with pytest.raises(SystemExit):
        main([path, "--stack", "4", "--passes", "2"])


def test_cli_stack_needs_two_cycles(wav_path, capsys):
    path, _ = wav_path                      # 15-s file: one cycle only
    assert main([path, "--stack", "4"]) == 1


def test_cli_deep_preset_keeps_explicit_flags(wav_path, capsys, monkeypatch):
    """--deep fills only unset options: an explicit --max-candidates wins."""
    import ft8_demodulator_tpu.demod as demod

    seen = {}
    orig = demod.decode_ft8_message

    def spy(*a, **kw):
        seen.update(kw)
        return orig(*a, **kw)

    monkeypatch.setattr("ft8_demodulator_tpu.demod.decode_ft8_message", spy)
    path, _ = wav_path
    assert main([path, "--deep", "--max-candidates", "24",
                 "--bins-per-tone", "2", "--steps-per-symbol", "2"]) == 0
    assert seen["max_candidates"] == 24      # explicit flag kept
    assert seen["bins_per_tone"] == 2        # explicit flag kept
    assert seen["min_score"] == 1.0          # preset filled in
    assert seen["use_osd"] is True           # preset filled in


def test_cli_tx_generates_decodable_wav(tmp_path, capsys):
    """--tx packs message text, writes a WAV, and the decode side reads the
    same text back (the full TX -> RX loop through the CLI alone)."""
    out = str(tmp_path / "tx.wav")
    assert main(["--tx", "CQ K1ABC FN42", "--fs", "2000", "--f0", "500",
                 "--tx-snr", "0", out]) == 0
    capsys.readouterr()
    assert main([out, "--min-score", "5"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert "Message: CQ K1ABC FN42" in lines


def test_cli_tx_rejects_stream_and_bad_message(tmp_path):
    out = str(tmp_path / "tx.wav")
    with pytest.raises(SystemExit):
        main(["--tx", "CQ K1ABC FN42", "--stream", out])
    assert main(["--tx", "THIS ONE IS FAR TOO LONG TO PACK", out]) == 1


def test_cli_tx_negative_start_is_a_clean_error(tmp_path, capsys):
    out = str(tmp_path / "tx.wav")
    assert main(["--tx", "CQ K1ABC FN42", "--tx-start", "-1", out]) == 1
    assert "does not fit" in capsys.readouterr().err


def test_cli_tx_seed_controls_noise(tmp_path):
    """Same seed -> identical file; different seeds -> different noise
    (required for generating independent repeats for --stack)."""
    a, b, c = (str(tmp_path / f"{n}.wav") for n in "abc")
    base = ["--tx", "CQ K1ABC FN42", "--fs", "2000", "--tx-snr", "0"]
    assert main(base + ["--tx-seed", "7", a]) == 0
    assert main(base + ["--tx-seed", "7", b]) == 0
    assert main(base + ["--tx-seed", "8", c]) == 0
    pa, pb, pc = (open(p, "rb").read() for p in (a, b, c))
    assert pa == pb and pa != pc


def test_cli_format_json_and_alltxt(wav_path, capsys):
    """--format json emits one parseable object per decode on stdout (the
    info banner moves to stderr); --format alltxt emits single-line rows."""
    import json as _json

    path, payload = wav_path
    assert main([path, "--min-score", "5", "--format", "json"]) == 0
    cap = capsys.readouterr()
    rows = [_json.loads(ln) for ln in cap.out.splitlines()]
    assert any(r["payload"] == bytes(payload.tolist()).hex() for r in rows)
    assert all({"time_sec", "freq_hz", "snr_db", "message"} <= set(r)
               for r in rows)
    assert "Read " in cap.err and "Read " not in cap.out

    assert main([path, "--min-score", "5", "--format", "alltxt"]) == 0
    cap = capsys.readouterr()
    assert any("~" in ln for ln in cap.out.splitlines())

    # empty result in a machine format prints nothing to stdout
    assert main([path, "--min-score", "99", "--format", "json"]) == 0
    assert capsys.readouterr().out == ""
