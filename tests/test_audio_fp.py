"""Audio energy-envelope fingerprint: gain invariance, noise
robustness, distinct-content distance, and the distributed near-dup
pipeline over real PCM16 WAV payloads (vendored codec)."""

import numpy as np
import pyarrow as pa

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.media import (
    audio_hash64,
    encode_wav,
)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _clip(seed: int, n: int = 8000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # random envelope modulating noise — energy profile varies by clip
    env = np.abs(np.cumsum(rng.normal(size=n)))
    env = env / env.max()
    return (env * rng.normal(size=n) * 0.3).astype(np.float64)


def test_gain_invariance_and_noise_robustness():
    x = _clip(3)
    h = audio_hash64(x)
    assert h == audio_hash64(x * 0.5)  # pure gain: identical bits
    noisy = x + np.random.default_rng(9).normal(size=x.size) * 0.003
    assert _hamming(h, audio_hash64(noisy)) <= 6
    other = _clip(4)
    assert _hamming(h, audio_hash64(other)) > 12


def test_wav_roundtrip_fingerprint_stable():
    x = _clip(7)
    from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.media import (
        decode_wav,
    )

    _rate, back = decode_wav(encode_wav(16000, x))
    # PCM16 quantization must not move the envelope bits far
    assert _hamming(audio_hash64(x), audio_hash64(back)) <= 2


def test_audio_dup_pipeline(ray_session):
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.dedup import (
        hamming_pairs,
    )
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprints,
    )

    rows = []
    n_base, n_dup = 20, 8
    for i in range(n_base):
        rows.append({"media_id": f"aud-{i:07d}", "kind": "audio",
                     "payload": encode_wav(16000, _clip(i)),
                     "mime": "audio/wav", "source_url": f"u{i}"})
    for i in range(n_dup):  # gain-changed noisy re-encode of base i
        x = _clip(i) * 0.7
        x = x + np.random.default_rng(100 + i).normal(size=x.size) * 0.002
        rows.append({"media_id": f"aud-{1000 + i:07d}", "kind": "audio",
                     "payload": encode_wav(16000, x),
                     "mime": "audio/wav", "source_url": f"d{i}"})
    media = ray.data.from_arrow(pa.Table.from_pylist(rows,
                                                     schema=MEDIA_SCHEMA))
    hashes = audio_fingerprints(media).map_batches(
        lambda b: pa.table({
            "num": pa.array([int(m[4:]) for m in
                             b.column("media_id").to_pylist()],
                            pa.int64()),
            "ahash": b.column("ahash"),
        }),
        batch_format="pyarrow",
    )
    pairs = hamming_pairs(hashes, max_hamming=6, id_col="num",
                          hash_col="ahash").to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    expected = {(i, 1000 + i) for i in range(n_dup)}
    assert len(expected - got) <= 1, expected - got
    assert not (got - expected), got - expected
