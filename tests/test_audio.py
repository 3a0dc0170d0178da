"""Audio decode fidelity — the per-row invariant from BASELINE.json
input_hint: decoded-PCM allclose (SNR≥30dB) + exact transcript equality,
through the full mapInPandas path."""

from __future__ import annotations

import numpy as np
import pytest

from data_profiler_spark import fixtures
from data_profiler_spark.audio import decode_stats
from data_profiler_spark.audio.decode import decode_pcm16

N = 120
SEED = 42


def test_wav_roundtrip_snr():
    for i in (0, 3, 17):
        truth = fixtures.clip_truth(SEED, i)
        p = fixtures.clip_params(SEED, i)
        payload = fixtures.encode_pcm16_wav(truth, p["sr_hz"])
        dec = decode_pcm16(payload, "pcm16_wav")
        assert len(dec) == len(truth)
        snr = 10 * np.log10(np.sum(truth**2) / np.sum((truth - dec) ** 2))
        assert snr >= 30.0, f"SNR {snr:.1f} dB < 30"
        assert np.allclose(dec, truth, atol=1.0 / 32767.0)


def test_raw_roundtrip():
    truth = fixtures.clip_truth(SEED, 5)
    payload = fixtures.encode_pcm16_raw(truth)
    dec = decode_pcm16(payload, "pcm16_raw")
    assert np.allclose(dec, truth, atol=1.0 / 32767.0)


@pytest.mark.parametrize(
    "payload,codec",
    [
        (b"", "pcm16_wav"),
        (b"RIFFxxxxWAVE", "pcm16_wav"),
        (b"\x01\x02\x03", "pcm16_raw"),  # odd length
        (b"\x01\x02", "mp3"),  # unsupported codec
        (None, "pcm16_wav"),
    ],
)
def test_malformed_payloads_raise(payload, codec):
    with pytest.raises(ValueError):
        decode_pcm16(payload, codec)


def test_per_row_fidelity_through_spark(spark):
    """Full pipeline fidelity: generate clips distributed, decode via
    mapInPandas, compare PCM + transcript against regenerated truth."""
    clips = fixtures.generate_clips(spark, N, seed=SEED)
    rows = clips.collect()
    assert len(rows) == N
    for r in rows:
        i = int(r.clip_id.split("-")[1])
        truth = fixtures.clip_truth(SEED, i)
        dec = decode_pcm16(bytes(r.bytes), r.codec)
        assert len(dec) == len(truth)
        snr = 10 * np.log10(np.sum(truth**2) / np.sum((truth - dec) ** 2))
        assert snr >= 30.0
        p = fixtures.clip_params(SEED, i)
        assert r.transcript == fixtures.clip_transcript(SEED, i, p["n_tokens"])
        assert r.sr_hz == p["sr_hz"] and r.dur_ms == p["dur_ms"]


def test_decode_stats_values(spark):
    clips = fixtures.generate_clips(spark, N, seed=SEED)
    stats = {r.clip_id: r for r in decode_stats(clips, passthrough=["dur_ms"]).collect()}
    assert len(stats) == N
    for i in (1, 8, 33):
        cid = f"clip-{i:012d}"
        truth = fixtures.clip_truth(SEED, i)
        r = stats[cid]
        assert r.decode_ok
        assert r.n_samples == len(truth)
        # decoded_ms consistent with declared dur_ms (generator guarantees)
        assert abs(r.decoded_ms - r.dur_ms) <= 5.0
        assert r.rms == pytest.approx(float(np.sqrt(np.mean(truth.astype(np.float64) ** 2))), rel=1e-3)
        assert r.peak == pytest.approx(float(np.abs(truth).max()), abs=2e-4)


def test_generator_deterministic(spark):
    a = fixtures.generate_clips(spark, 50, seed=7).orderBy("clip_id").collect()
    b = fixtures.generate_clips(spark, 50, seed=7).orderBy("clip_id").collect()
    assert [(r.clip_id, bytes(r.bytes), r.dur_ms) for r in a] == [
        (r.clip_id, bytes(r.bytes), r.dur_ms) for r in b
    ]
