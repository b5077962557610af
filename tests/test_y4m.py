"""Pure-stdlib Y4M codec (operators/y4m.py): real video-container
frame extraction through the frame_extractor seam."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_functions_variant_spark.operators import y4m


def _frame(w: int, h: int, seed: int, bpp: int = 1) -> bytes:
    return bytes((seed + 11 * i) % 256 for i in range(w * h * bpp))


@pytest.mark.parametrize("colorspace,bpp", [("mono", 1), ("444", 3)])
def test_roundtrip(colorspace, bpp):
    frames = [_frame(6, 4, s, bpp) for s in range(5)]
    blob = y4m.encode_y4m(frames, 6, 4, colorspace)
    assert blob.startswith(b"YUV4MPEG2 W6 H4 ")
    d = y4m.decode_y4m(blob)
    assert (d["width"], d["height"], d["colorspace"]) == (6, 4, colorspace)
    assert d["frames"] == frames


@given(st.integers(1, 8), st.integers(1, 6), st.integers(0, 12), st.integers(0, 99))
@settings(max_examples=60, deadline=None)
def test_property_roundtrip(w, h, n_frames, seed):
    frames = [_frame(w, h, seed + i) for i in range(n_frames)]
    d = y4m.decode_y4m(y4m.encode_y4m(frames, w, h))
    assert d["frames"] == frames


def test_default_420_colorspace_rejected():
    # no C tag → spec default C420, outside the subset: must raise,
    # never silently treat subsampled planes as full-res
    blob = b"YUV4MPEG2 W2 H2 F25:1\nFRAME\n" + bytes(6)
    with pytest.raises(ValueError, match="C420"):
        y4m.decode_y4m(blob)


def test_truncated_frame_rejected():
    blob = y4m.encode_y4m([_frame(4, 4, 1)], 4, 4)[:-3]
    with pytest.raises(ValueError, match="truncated"):
        y4m.decode_y4m(blob)


def test_extractor_samples_every_nth():
    frames = [_frame(3, 3, s) for s in range(10)]
    blob = y4m.encode_y4m(frames, 3, 3)
    got = y4m.y4m_frame_extractor(blob, 3)
    assert [i for i, _ in got] == [0, 3, 6, 9]
    assert all(f == frames[i] for i, f in got)


def test_spark_e2e_real_frames_through_sample_plan(spark):
    """frame_sample_plan with the Y4M extractor: the emitted hashes
    must be md5 of the ACTUAL frame bytes pulled from the container —
    real video sampling, same plan shape as the stubbed path."""
    import pandas as pd

    from datafusion_functions_variant_spark.operators import multimodal

    ids = spark.range(6).select("id")

    def gen(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["id"]:
                i = int(i)
                frames = [_frame(4, 2, i * 10 + f) for f in range(4 + i % 3)]
                payloads.append(y4m.encode_y4m(frames, 4, 2))
            yield pd.DataFrame({"asset_id": pdf["id"], "payload": payloads})

    assets = ids.mapInPandas(gen, "asset_id long, payload binary")
    out = multimodal.frame_sample_plan(
        assets, "payload", "asset_id", every_n=2,
        frame_extractor=y4m.y4m_frame_extractor,
    )
    rows = {(r.asset_id, r.frame_idx): r.frame_md5 for r in out.collect()}
    for i in range(6):
        n = 4 + i % 3
        idxs = [f for f in range(n) if f % 2 == 0]
        for f in idxs:
            want = hashlib.md5(_frame(4, 2, i * 10 + f)).hexdigest()
            assert rows[(i, f)] == want
        assert {k[1] for k in rows if k[0] == i} == set(idxs)
