"""AudioSpectrogram — planted-tone recovery, band pooling shape,
hermetic WAV path (no audio libraries)."""

import numpy as np
import pyarrow as pa

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.media import encode_wav
from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    AudioSpectrogram,
    audio_spectrograms,
)


def _media_table(rows):
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _tone_row(mid: str, hz: float, rate: int = 16000, n: int = 8000,
              noise: float = 0.0, seed: int = 0):
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * hz * t)
    if noise:
        x = x + np.random.default_rng(seed).normal(size=n) * noise
    return {
        "media_id": mid, "kind": "audio",
        "payload": encode_wav(rate, x), "mime": "audio/wav",
        "source_url": f"https://fixture.test/{mid}",
    }


def test_dominant_frequency_recovers_planted_tone():
    stage = AudioSpectrogram()
    tones = [250.0, 997.0, 3200.0, 6000.0]
    out = stage(_media_table(
        [_tone_row(f"t{i}", hz) for i, hz in enumerate(tones)]))
    got = out.column("dominant_hz").to_pylist()
    # rfft bin width = rate / n_fft = 62.5 Hz; peak lands within one bin
    for hz, g in zip(tones, got):
        assert abs(g - hz) <= 62.5, (hz, g)


def test_centroid_tracks_tone_and_noise_resistant():
    stage = AudioSpectrogram()
    out = stage(_media_table([
        _tone_row("lo", 300.0, noise=0.01, seed=1),
        _tone_row("hi", 5000.0, noise=0.01, seed=2),
    ]))
    lo, hi = out.column("centroid_hz").to_pylist()
    assert lo < 1500.0 < hi


def test_spec_shape_and_energy_band():
    stage = AudioSpectrogram(n_bands=8)
    out = stage(_media_table([_tone_row("x", 3000.0)]))
    spec = np.asarray(out.column("spec").to_pylist()[0])
    assert spec.shape == (8,)
    # 3 kHz at 16 kHz, n_fft=256 → bin 48; bands pool bins 1..128 in
    # 8 equal ranges of 16 → offset 47 → band 2
    assert int(np.argmax(spec)) == (48 - 1) // 16


def test_short_clip_zero_padded_not_crash():
    stage = AudioSpectrogram()
    out = stage(_media_table([_tone_row("tiny", 440.0, n=100)]))
    assert out.num_rows == 1
    assert np.isfinite(out.column("dominant_hz").to_pylist()[0])


def test_actor_pool_stage_over_dataset(ray_session):
    import ray.data

    # rows built on the driver: functions defined in a test module are
    # pickled by reference and Ray workers can't import tests/
    media = ray.data.from_arrow(_media_table([
        _tone_row(f"d{i:04d}", 400.0 + 100.0 * (i % 5))
        for i in range(40)])).repartition(3)
    out = audio_spectrograms(media).to_pandas()
    assert len(out) == 40
    # every clip's dominant frequency within a bin of its planted tone
    planted = 400.0 + 100.0 * (
        out["media_id"].str.slice(1).astype(int) % 5)
    assert (np.abs(out["dominant_hz"] - planted) <= 62.5).all()
