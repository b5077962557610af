"""Pure-stdlib WAV codec (operators/wav.py): real audio decode
evidence; roundtrips cross-checked against Python's own ``wave``
module (an independent stdlib implementation of the same format)."""

from __future__ import annotations

import io
import struct
import wave

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_functions_variant_spark.operators import wav


def _formula_samples(n: int, seed: int) -> list[int]:
    # deterministic sawtooth-ish signal spanning negative + positive
    return [((seed + 37 * i) % 4001) - 2000 for i in range(n)]


@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip(channels):
    samples = _formula_samples(96 * channels, 5)
    blob = wav.encode_wav(samples, sample_rate=16000, channels=channels)
    d = wav.decode_wav(blob)
    assert d["sample_rate"] == 16000
    assert d["channels"] == channels
    assert d["n_frames"] == 96
    assert d["samples"] == samples


def test_crossimpl_wave_module_reads_ours_and_we_read_wave():
    """Both directions against the independent stdlib ``wave``
    implementation: our encoder's output parses in ``wave`` with
    identical frames, and a ``wave``-written file decodes here."""
    samples = _formula_samples(64, 11)
    blob = wav.encode_wav(samples, sample_rate=8000, channels=1)
    with wave.open(io.BytesIO(blob)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (8000, 1, 2)
        theirs = struct.unpack("<64h", w.readframes(64))
    assert list(theirs) == samples

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        inter = _formula_samples(40, 3)
        w.writeframes(struct.pack("<40h", *inter))
    d = wav.decode_wav(buf.getvalue())
    assert (d["sample_rate"], d["channels"], d["n_frames"]) == (44100, 2, 20)
    assert d["samples"] == inter


@given(st.integers(1, 200), st.sampled_from([1, 2]), st.integers(0, 9999))
@settings(max_examples=60, deadline=None)
def test_property_roundtrip(n_frames, channels, seed):
    samples = _formula_samples(n_frames * channels, seed)
    d = wav.decode_wav(wav.encode_wav(samples, 22050, channels))
    assert d["samples"] == samples and d["n_frames"] == n_frames


def test_unsupported_bits_rejected():
    blob = bytearray(wav.encode_wav([0, 0], 8000, 1))
    # bits-per-sample field of fmt: RIFF(12) + 'fmt '+len(8) + 14 offset
    struct.pack_into("<H", blob, 12 + 8 + 14, 8)
    with pytest.raises(ValueError, match="unsupported"):
        wav.decode_wav(bytes(blob))


def test_spark_e2e_decode_through_media_seam(spark):
    import pandas as pd

    from datafusion_functions_variant_spark.operators import multimodal

    ids = spark.range(10).select("id")

    def gen(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["id"]:
                i = int(i)
                payloads.append(
                    wav.encode_wav(_formula_samples(30 + i, i), 8000 + 100 * i, 1)
                )
            yield pd.DataFrame({"asset_id": pdf["id"], "payload": payloads})

    assets = ids.mapInPandas(gen, "asset_id long, payload binary")
    feat = multimodal.featurize_binary(
        assets, "payload", "asset_id", decoder=wav.wav_decoder()
    )
    rows = {r.asset_id: r for r in feat.collect()}
    for i in range(10):
        r = rows[i]
        assert r.mime == "audio/wav"
        assert (r.sample_rate, r.channels, r.n_frames) == (8000 + 100 * i, 1, 30 + i)
        assert r.abs_sum == sum(abs(s) for s in _formula_samples(30 + i, i))


def test_truncated_data_chunk_rejected():
    import struct as _s

    blob = bytearray(wav.encode_wav([1, 2, 3, 4], 8000, 1))
    # inflate the data chunk's declared length beyond the payload;
    # data chunk header sits right after fmt: 12 + (8+16) = 36
    _s.pack_into("<I", blob, 40, 100)
    _s.pack_into("<I", blob, 4, len(blob) - 8 + 92)  # keep RIFF size consistent-ish
    with pytest.raises(ValueError):
        wav.decode_wav(bytes(blob))


def test_odd_sample_count_for_stereo_rejected():
    # hand-build a 2-channel data chunk holding 5 samples (a dangling
    # half frame): must raise, never report n_frames=2 with 5 samples
    mono = wav.encode_wav([1, 2, 3, 4, 5], 8000, 1)
    blob = bytearray(mono)
    import struct as _s

    _s.pack_into("<H", blob, 12 + 8 + 2, 2)  # fmt channels := 2
    with pytest.raises(ValueError, match="whole number"):
        wav.decode_wav(bytes(blob))


def test_short_fmt_chunk_rejected():
    blob = b"RIFF" + struct.pack("<I", 4 + 8 + 4) + b"WAVE" + b"fmt " + struct.pack("<I", 4) + bytes(4)
    with pytest.raises(ValueError, match="too short"):
        wav.decode_wav(blob)
