"""Pure-stdlib WAV/PCM codec — real audio decode without librosa.

Companion to ``png.py``: RIFF/WAVE with 16-bit signed little-endian
PCM (mono or stereo) needs only ``struct``, so the audio half of the
multimodal stack also gets genuine bytes→samples runtime evidence
in-container. Subset: format tag 1 (PCM), bits-per-sample 16,
channels 1-2; anything else raises ``ValueError`` (a real deployment
registers librosa/soundfile via the same ``MediaDecoder`` seam).

The encoder exists for test fixtures; both sides implement the wire
format for real — RIFF size bookkeeping, fmt chunk layout, interleaved
frames — so a fixture produced here plays in any audio tool and any
spec-conforming WAV (within the subset) decodes here.
"""

from __future__ import annotations

import struct

from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def encode_wav(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Encode 16-bit signed samples (interleaved if stereo) as WAV."""
    if channels not in (1, 2):
        raise ValueError("channels must be 1 or 2")
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """Decode a PCM WAV within the subset. Returns ``{"sample_rate",
    "channels", "n_frames", "samples"}`` (samples interleaved)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size != len(payload) - 8:
        raise ValueError("RIFF size mismatch")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError(
                f"truncated {ctype!r} chunk: declared {length}, "
                f"got {len(chunk)} bytes"
            )
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError(f"fmt chunk too short: {length} bytes")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif ctype == b"data":
            data = chunk
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if tag != 1 or bits != 16 or channels not in (1, 2):
        raise ValueError(
            f"unsupported WAV (tag={tag} bits={bits} channels={channels}); "
            "register a real audio decoder for full coverage"
        )
    if len(data) % (channels * 2):
        raise ValueError(
            f"data chunk length {len(data)} is not a whole number of "
            f"{channels}-channel 16-bit frames"
        )
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data))
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n // channels,
        "samples": samples,
    }


def wav_decoder():
    """``MediaDecoder`` for the registry seam: real decode emitting
    rate/channels/frame-count plus the exact absolute-amplitude sum —
    an oracle-checkable content proof over the decoded samples."""
    from .multimodal import MediaDecoder

    def _decode(payload: bytes) -> dict:
        d = decode_wav(payload)
        return {
            "sample_rate": d["sample_rate"],
            "channels": d["channels"],
            "n_frames": d["n_frames"],
            "abs_sum": sum(abs(s) for s in d["samples"]),
        }

    return MediaDecoder(
        name="stdlib-wav",
        fields=StructType(
            [
                StructField("sample_rate", IntegerType()),
                StructField("channels", IntegerType()),
                StructField("n_frames", IntegerType()),
                StructField("abs_sum", LongType()),
            ]
        ),
        fn=_decode,
    )
