"""PCM transform operators (audio/transform.py): fidelity (SNR >= 30 dB on
tones — the BASELINE.json input_hint invariant), level/trim semantics, the
violation-row contract, and composition with decode_stats."""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_profiler_spark.audio.decode import decode_pcm16, decode_stats, encode_pcm16_wav
from data_profiler_spark.audio.transform import (
    loudness_kernel,
    loudness_normalize,
    resample,
    resample_kernel,
    trim_silence,
    trim_silence_kernel,
)


def _tone(freq: float, sr: int, secs: float, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(sr * secs), dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _snr_db(sig: np.ndarray, est: np.ndarray) -> float:
    n = min(len(sig), len(est))
    err = sig[:n].astype(np.float64) - est[:n].astype(np.float64)
    p_sig = float(np.mean(sig[:n].astype(np.float64) ** 2))
    p_err = float(np.mean(err**2))
    return 10.0 * np.log10(p_sig / p_err) if p_err > 0 else float("inf")


def _clips_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec"])
    return spark.createDataFrame(
        pdf, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )


def test_resample_kernel_tone_fidelity():
    # 440 Hz is far below the 4 kHz target Nyquist — linear interp must
    # reproduce the analytically generated target-rate tone at >= 30 dB
    x = _tone(440.0, 16000, 0.5)
    y, sr2 = resample_kernel(8000)(x, 16000)
    assert sr2 == 8000
    assert abs(len(y) - 4000) <= 1
    ref = _tone(440.0, 8000, 0.5)
    assert _snr_db(ref, y) >= 30.0


def test_resample_operator_roundtrip(spark):
    x = _tone(440.0, 16000, 0.25)
    df = _clips_df(spark, [("c1", encode_pcm16_wav(x, 16000), 16000, 250, "pcm16_wav")])
    out = resample(df, 8000).collect()[0]
    assert out["transform_err"] is None
    assert out["sr_hz"] == 8000
    assert abs(out["dur_ms"] - 250) <= 1
    y = decode_pcm16(out["bytes"], "pcm16_wav")
    assert _snr_db(_tone(440.0, 8000, 0.25), y) >= 30.0


def test_loudness_normalize_hits_target(spark):
    quiet = _tone(300.0, 16000, 0.2, amp=0.05)
    loud = _tone(300.0, 16000, 0.2, amp=0.9)
    df = _clips_df(
        spark,
        [
            ("q", encode_pcm16_wav(quiet, 16000), 16000, 200, "pcm16_wav"),
            ("l", encode_pcm16_wav(loud, 16000), 16000, 200, "pcm16_wav"),
        ],
    )
    rows = {r["clip_id"]: r for r in loudness_normalize(df, target_rms_db=-20.0).collect()}
    for cid in ("q", "l"):
        y = decode_pcm16(rows[cid]["bytes"], "pcm16_wav")
        rms_db = 20.0 * np.log10(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
        assert abs(rms_db - (-20.0)) < 0.5
        assert float(np.abs(y).max()) <= 1.0


def test_loudness_kernel_silence_passthrough():
    x = np.zeros(1000, dtype=np.float32)
    y, _ = loudness_kernel(-20.0)(x, 16000)
    assert np.array_equal(x, y)  # no gain can lift digital silence


def test_trim_silence_removes_padding(spark):
    sr = 16000
    pad = np.zeros(int(0.1 * sr), dtype=np.float32)
    tone = _tone(440.0, sr, 0.3)
    x = np.concatenate([pad, tone, pad])
    df = _clips_df(spark, [("c", encode_pcm16_wav(x, sr), sr, 500, "pcm16_wav")])
    out = trim_silence(df, threshold_db=-40.0, frame_ms=20).collect()[0]
    assert out["transform_err"] is None
    # 300 ms of tone survives, frame-quantized (+- one 20 ms frame per side)
    assert 260 <= out["dur_ms"] <= 340
    y = decode_pcm16(out["bytes"], "pcm16_wav")
    assert float(np.sqrt(np.mean(y.astype(np.float64) ** 2))) > 0.2


def test_trim_all_silence_keeps_one_frame():
    x = np.zeros(16000, dtype=np.float32)
    y, _ = trim_silence_kernel(-40.0, 20)(x, 16000)
    assert len(y) == 320  # one 20 ms frame, never empty


def test_malformed_payload_becomes_err_row(spark):
    df = _clips_df(spark, [("bad", b"not a wav", 16000, 100, "pcm16_wav")])
    out = resample(df, 8000).collect()[0]
    assert out["bytes"] is None
    assert out["transform_err"] is not None


def test_composes_with_decode_stats(spark):
    x = _tone(1000.0, 44100, 0.2, amp=0.4)
    df = _clips_df(spark, [("c", encode_pcm16_wav(x, 44100), 44100, 200, "pcm16_wav")])
    conformed = resample(df, 16000)
    stats = decode_stats(conformed).collect()[0]
    assert stats["decode_ok"]
    assert abs(stats["decoded_ms"] - 200.0) < 2.0
    # RMS of a sine at amp 0.4 is 0.4/sqrt(2) ~= 0.283, preserved by resample
    assert abs(stats["rms"] - 0.283) < 0.01


def test_fir_resample_antialiases_vs_linear():
    """The polyphase windowed-sinc kernel must crush linear interp on the
    aliasing case (upsampling images): >15 dB better on a 3 kHz tone."""
    from data_profiler_spark.audio.transform import fir_resample_kernel

    x = _tone(3000.0, 8000, 0.5)
    ref = _tone(3000.0, 16000, 0.5)
    fir, _ = fir_resample_kernel(16000)(x, 8000)
    lin, _ = resample_kernel(16000)(x, 8000)
    assert _snr_db(ref, fir) >= 40.0
    assert _snr_db(ref, fir) > _snr_db(ref, lin) + 15.0


def test_fir_resample_dc_exact_and_irrational_ratio():
    from data_profiler_spark.audio.transform import fir_resample_kernel
    import numpy as np

    dc = np.full(4000, 0.25, dtype=np.float32)
    y, sr = fir_resample_kernel(8000)(dc, 16000)
    assert sr == 8000 and float(np.abs(y - 0.25).max()) == 0.0
    # non-integer ratio (44.1k -> 16k): phase table covers all 160 phases
    x = _tone(1000.0, 44100, 0.3)
    y, _ = fir_resample_kernel(16000)(x, 44100)
    assert abs(len(y) - 4800) <= 1
    assert _snr_db(_tone(1000.0, 16000, 0.3), y) >= 40.0


def test_fir_is_the_operator_default(spark):
    x = _tone(3000.0, 8000, 0.25)
    df = _clips_df(spark, [("c", encode_pcm16_wav(x, 8000), 8000, 250, "pcm16_wav")])
    out = resample(df, 16000).collect()[0]  # default quality="fir"
    y = decode_pcm16(out["bytes"], "pcm16_wav")
    assert _snr_db(_tone(3000.0, 16000, 0.25), y) >= 35.0


def test_wav_header_rate_overrides_sr_column(spark):
    """For pcm16_wav the payload header is authoritative: a lying (or null)
    sr_hz column must NOT change the resample ratio — a wrong rate here
    would re-encode the payload at silently wrong speed with a clean
    header. The 8 kHz tone declared as 16 kHz must still resample to the
    correct length and SNR."""
    sr_true = 8000
    x = _tone(440.0, sr_true, 0.5)
    wav = encode_pcm16_wav(x, sr_true)
    df = _clips_df(
        spark,
        [("lying", wav, 16000, 500, "pcm16_wav"), ("nullsr", wav, None, 500, "pcm16_wav")],
    )
    out = {r["clip_id"]: r for r in resample(df, 16000).collect()}
    for cid in ("lying", "nullsr"):
        r = out[cid]
        assert r["transform_err"] is None
        assert r["sr_hz"] == 16000
        # 0.5s at the TRUE 8kHz -> 8000 samples at 16kHz (ratio 2x, not 1x)
        y = decode_pcm16(r["bytes"], "pcm16_wav")
        assert abs(len(y) - 8000) <= 2
        truth = _tone(440.0, 16000, 0.5)
        assert _snr_db(truth[100:-100], y[100:-100]) >= 30.0


def test_headerless_missing_sr_is_violation_not_16k_guess(spark):
    """pcm16_raw has no header: a missing/invalid sr_hz routes to the
    transform_err violation path instead of silently assuming 16 kHz."""
    from data_profiler_spark.audio.decode import encode_pcm16_raw

    x = _tone(440.0, 8000, 0.25)
    raw = encode_pcm16_raw(x)
    df = _clips_df(
        spark,
        [("nosr", raw, None, 250, "pcm16_raw"), ("badsr", raw, -1, 250, "pcm16_raw"),
         ("ok", raw, 8000, 250, "pcm16_raw")],
    )
    out = {r["clip_id"]: r for r in resample(df, 16000).collect()}
    assert out["ok"]["transform_err"] is None and out["ok"]["sr_hz"] == 16000
    for cid in ("nosr", "badsr"):
        assert out[cid]["bytes"] is None
        assert "sr_hz" in out[cid]["transform_err"]


def test_wav_header_rate_walks_chunks(spark):
    """wav_sample_rate must parse the fmt chunk wherever it sits — a legal
    WAV carrying a chunk before 'fmt ' decodes fine, so a fixed byte-24
    read would return garbage that the resample ratio then trusts."""
    import struct

    import pytest

    from data_profiler_spark.audio.decode import wav_sample_rate

    sr_true = 8000
    x = _tone(440.0, sr_true, 0.1)
    canonical = encode_pcm16_wav(x, sr_true)
    # splice a LIST chunk between 'WAVE' and 'fmt ' (still a legal RIFF)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = canonical[12:]
    size = len(extra) + len(body) + 4
    weird = b"RIFF" + struct.pack("<I", size) + b"WAVE" + extra + body
    assert wav_sample_rate(canonical) == sr_true
    assert wav_sample_rate(weird) == sr_true
    # and the full transform pipeline still resamples it at the true rate
    df = _clips_df(spark, [("weird", weird, None, 100, "pcm16_wav")])
    (row,) = resample(df, 16000).collect()
    assert row["transform_err"] is None and row["sr_hz"] == 16000
    with pytest.raises(ValueError):
        wav_sample_rate(b"RIFF\x00\x00\x00\x00WAVEjunk")  # no fmt chunk
    with pytest.raises(ValueError):
        wav_sample_rate(b"not audio at all")
