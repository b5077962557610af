"""Netpbm codec (operators/ppm.py) + multi-kind registry dispatch
(multimodal.decode_via_registry) — the second REAL in-container image
format (round 9)."""

from __future__ import annotations

import pytest

from datafusion_functions_variant_spark.operators import multimodal as mm
from datafusion_functions_variant_spark.operators import png as pngmod
from datafusion_functions_variant_spark.operators import ppm


def test_ppm_roundtrip_gray_and_rgb():
    for channels in (1, 3):
        pix = bytes((7 * i + channels) % 251 for i in range(10 * 4 * channels))
        payload = ppm.encode_ppm(10, 4, pix, channels)
        d = ppm.decode_ppm(payload)
        assert (d["width"], d["height"], d["channels"]) == (10, 4, channels)
        assert d["pixels"] == pix


def test_ppm_decoder_tolerates_comments_and_whitespace():
    pix = bytes(range(12))
    hand = b"P5 # a comment\n  # another\n 4\t3\n255\n" + pix
    d = ppm.decode_ppm(hand)
    assert (d["width"], d["height"], d["channels"]) == (4, 3, 1)
    assert d["pixels"] == pix


def test_ppm_decoder_rejects_malformed():
    pix = bytes(12)
    with pytest.raises(ValueError, match="magic"):
        ppm.decode_ppm(b"P3 4 3 255\n" + pix)  # ascii variant unsupported
    with pytest.raises(ValueError, match="truncated PPM raster"):
        ppm.decode_ppm(b"P5 4 3 255\n" + pix[:-1])
    with pytest.raises(ValueError, match="maxval"):
        ppm.decode_ppm(b"P5 4 3 65535\n" + pix)
    with pytest.raises(ValueError, match="channels"):
        ppm.encode_ppm(2, 2, bytes(8), channels=2)
    with pytest.raises(ValueError, match="pixel buffer"):
        ppm.encode_ppm(2, 2, bytes(3), channels=1)


def test_stdlib_kinds_registered_and_sniffed():
    # import-time registration made the registry real in-container
    for kind in ("image/png", "image/ppm", "audio/wav"):
        assert mm.get_decoder(kind) is not None, kind
    # the generic "image" kind stays the documented PIL seam (stub)
    assert mm.get_decoder("image") is None or mm.get_decoder("image").name == "pil"
    assert mm.sniff_kind(ppm.encode_ppm(1, 1, b"\x00", 1)) == "image/ppm"
    assert mm.sniff_kind(pngmod.encode_png(1, 1, b"\x00", 1)) == "image/png"
    assert mm.sniff_kind(b"garbage") == "application/octet-stream"


def test_decode_via_registry_dispatches_both_kinds(spark):
    import pandas as pd

    rows = []
    for i in range(8):
        pix = bytes((i + 3 * j) % 200 for j in range(6 * 4))
        if i % 2 == 0:
            rows.append((i, pngmod.encode_png(6, 4, pix, 1, i % 5)))
        else:
            rows.append((i, ppm.encode_ppm(6, 4, pix, 1)))
    assets = spark.createDataFrame(
        pd.DataFrame(rows, columns=["asset_id", "payload"])
    )
    got = {
        r.asset_id: r
        for r in mm.decode_via_registry(
            assets, "payload", "asset_id", kinds=("image/png", "image/ppm")
        ).collect()
    }
    assert len(got) == 8
    for i in range(8):
        r = got[i]
        expect_sum = sum((i + 3 * j) % 200 for j in range(24))
        assert (r.width, r.height, r.channels) == (6, 4, 1)
        assert r.px_sum == expect_sum
        assert r.kind == ("image/png" if i % 2 == 0 else "image/ppm")


def test_decode_via_registry_fails_loudly(spark):
    import pandas as pd

    # unregistered kind at plan build time
    with pytest.raises(ValueError, match="no decoder registered"):
        mm.decode_via_registry(
            spark.range(1).selectExpr("id as asset_id", "cast(null as binary) as payload"),
            "payload",
            "asset_id",
            kinds=("image/does-not-exist",),
        )
    # mismatched field schemas across kinds at plan build time
    with pytest.raises(ValueError, match="field mismatch"):
        mm.decode_via_registry(
            spark.range(1).selectExpr("id as asset_id", "cast(null as binary) as payload"),
            "payload",
            "asset_id",
            kinds=("image/png", "audio/wav"),
        )
    # un-dispatched payload kind at runtime, with the asset id
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [7], "payload": [b"not an image"]})
    )
    with pytest.raises(Exception, match="sniffed kind"):
        mm.decode_via_registry(
            assets, "payload", "asset_id", kinds=("image/png", "image/ppm")
        ).collect()
