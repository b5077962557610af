"""Perceptual image hashing + banded near-duplicate blocking.

dHash (difference hash): downsample the gray image 2x2 to a 9x8 grid,
emit 64 bits — bit (gx, gy) = 1 iff grid[gy][gx+1] > grid[gy][gx].
Uniform brightness shifts preserve every comparison (floor((s+4c)/4) =
floor(s/4)+c), so brightness-variant near-dups hash identically; small
local edits flip only the bits whose grid cells they touch.

Blocking: the 64-bit signature splits into four 16-bit bands; a pair
is a candidate iff SOME band matches. By pigeonhole, a pair with
fewer differing bits than bands MUST leave one band clean — so
banding is LOSSLESS for Hamming <= N_BANDS - 1 = 3; from 4 up it is
LSH-style best-effort recall (6 bits can spread 2+2+1+1 over the 4
bands), raise N_BANDS for a lossless higher threshold. The exact
bit_count(xor) verify then removes chance collisions. Never
all-pairs: the candidate join is equi on (band_idx, band_value), the
image-dedup twin of the text MinHash banding in operators/dedup.py.

No reference counterpart (the reference is a variant codec,
open-variant/src/values/mod.rs); this is the perceptual-dedup stage a
multimodal training-data pipeline runs over decoded images.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed dHash geometry: input images are 2*GRID_W x 2*GRID_H gray
GRID_W, GRID_H = 9, 8
N_BANDS = 4
BITS_PER_BAND = (GRID_W - 1) * GRID_H // N_BANDS  # 16


def dhash_bands(assets: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """PNG payloads -> (id, band0..band3) dHash signature, one
    Arrow-batched stage: decode (operators/png.py), 2x2-average to a
    9x8 grid, 64 gradient bits packed into four 16-bit band ints.
    Pixels never leave the stage — only 4 ints per image do."""
    from . import png as pngmod

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                d = pngmod.decode_png(bytes(payload))
                w, px = d["width"], d["pixels"]
                grid = [
                    [
                        (
                            px[2 * gy * w + 2 * gx]
                            + px[2 * gy * w + 2 * gx + 1]
                            + px[(2 * gy + 1) * w + 2 * gx]
                            + px[(2 * gy + 1) * w + 2 * gx + 1]
                        )
                        // 4
                        for gx in range(GRID_W)
                    ]
                    for gy in range(GRID_H)
                ]
                bands = [0] * N_BANDS
                for gy in range(GRID_H):
                    for gx in range(GRID_W - 1):
                        if grid[gy][gx + 1] > grid[gy][gx]:
                            i = gy * (GRID_W - 1) + gx
                            bands[i // BITS_PER_BAND] |= 1 << (
                                i % BITS_PER_BAND
                            )
                rows.append((int(aid), *bands))
            yield pd.DataFrame(
                rows,
                columns=[id_col] + [f"band{k}" for k in range(N_BANDS)],
            )

    schema = f"{id_col} long, " + ", ".join(
        f"band{k} int" for k in range(N_BANDS)
    )
    return assets.mapInPandas(run, schema)


def neardup_pairs(
    sigs: DataFrame, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """Banded blocking + exact verify over dHash signatures. Returns
    (id_a, id_b, hamming) with id_a < id_b, hamming <= max_hamming.

    Bands ride along through the explode, so the candidate equi-join
    on (band_idx, band_value) yields both signatures directly — no
    join back to sigs, and the upstream pipeline is referenced twice,
    not four times. distinct() collapses multi-band collisions of the
    same pair (bands are functionally dependent on the ids, so the
    full-row distinct equals a pair distinct)."""
    band_cols = [f"band{k}" for k in range(N_BANDS)]
    exploded = sigs.select(
        id_col,
        *band_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("bi"), F.col(f"band{k}").alias("bv")
                    )
                    for k in range(N_BANDS)
                ]
            )
        ).alias("e"),
    ).select(
        id_col,
        *band_cols,
        F.col("e.bi").alias("bi"),
        F.col("e.bv").alias("bv"),
    )
    ham = sum(
        F.bit_count(F.col(f"a.band{k}").bitwiseXOR(F.col(f"b.band{k}")))
        for k in range(N_BANDS)
    )
    return (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
