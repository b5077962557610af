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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed dHash geometry: input images are 2*GRID_W x 2*GRID_H gray
GRID_W, GRID_H = 9, 8
N_BANDS = 4
BITS_PER_BAND = (GRID_W - 1) * GRID_H // N_BANDS  # 16


def _dhash_bands_pdf(pdf, id_col: str, payload_col: str):
    """The per-batch body of :func:`dhash_bands`, module-level so it
    is directly unit-testable in-process (``mapInPandas`` bodies run
    in Python worker subprocesses a driver-side tracer or debugger
    never sees): decode, 2x2-average to a 9x8 grid, pack 64 gradient
    bits into four 16-bit band ints."""
    import pandas as pd

    from . import png as pngmod

    rows = []
    for aid, payload in zip(pdf[id_col], pdf[payload_col]):
        d = pngmod.decode_png(bytes(payload))
        # fail LOUDLY at the decode boundary: the grid comprehension
        # below silently reads garbage (or IndexErrors deep inside)
        # on any other geometry
        if (
            d["width"] != 2 * GRID_W
            or d["height"] != 2 * GRID_H
            or d["channels"] != 1
        ):
            raise ValueError(
                f"dhash_bands expects {2 * GRID_W}x{2 * GRID_H}"
                f" single-channel gray images; asset {aid} is "
                f"{d['width']}x{d['height']} with "
                f"{d['channels']} channel(s) — resize/grayscale "
                "upstream (operators/multimodal.py resize plan)"
            )
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
                    bands[i // BITS_PER_BAND] |= 1 << (i % BITS_PER_BAND)
        rows.append((int(aid), *bands))
    return pd.DataFrame(
        rows, columns=[id_col] + [f"band{k}" for k in range(N_BANDS)]
    )


def dhash_bands(assets: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """PNG payloads -> (id, band0..band3) dHash signature, one
    Arrow-batched stage (body: :func:`_dhash_bands_pdf`). Pixels never
    leave the stage — only 4 ints per image do."""

    def run(batches):
        for pdf in batches:
            yield _dhash_bands_pdf(pdf, id_col, payload_col)

    schema = f"{id_col} long, " + ", ".join(
        f"band{k} int" for k in range(N_BANDS)
    )
    return assets.mapInPandas(run, schema)


def neardup_pairs(
    sigs: DataFrame,
    id_col: str,
    max_hamming: int = 6,
    max_bucket: int = 4096,
    observation=None,
) -> DataFrame:
    """Banded blocking + exact verify over dHash signatures. Returns
    (id_a, id_b, hamming) with id_a < id_b, hamming <= max_hamming.

    Flood-proof bucket formulation (round 9 — was an unguarded
    ``exploded ⋈ exploded`` band self-join, which a million identical
    logos would blow to 10¹² candidate rows inside one band bucket):
    the image twin of ``operators/dedup.py::lsh_candidate_pairs``.
    A window over (band_idx, band_value) annotates every banded row
    with its bucket size and keeper (the min-id member); buckets at or
    under ``max_bucket`` keep one subgroup whose collected member
    array is bounded by construction, while every member of an
    overflow bucket becomes its OWN single-row subgroup and emits one
    star pair against the keeper — O(n) candidates per flood bucket,
    no per-bucket array ever exceeds ``max_bucket`` structs, and the
    exact Hamming verify still runs on every emitted pair. Star pairs
    keep the same connected component under downstream clustering
    (keeper = min id, the ``exact_dedup_groups`` convention).

    Like SimHash star routing, overflow trades away within-bucket
    completeness (non-keeper members aren't paired with each other);
    pass ``observation`` to get the bucket audit (n_buckets /
    n_colliding_buckets / n_overflow_buckets / max_bucket_size) riding
    the pair-producing pass — ``n_overflow_buckets > 0`` is the signal
    to widen bands or run an exact content-md5 canonicalize first
    (``pipeline_media_to_shards`` does). Signatures ride along through
    the explode, so candidates never join back to sigs; ``distinct()``
    collapses multi-band collisions of the same pair."""
    member = F.struct(
        F.col(id_col).alias("id"),
        *[F.col(f"band{k}").alias(f"band{k}") for k in range(N_BANDS)],
    )
    exploded = sigs.select(
        member.alias("_m"),
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
    ).select("_m", F.col("e.bi").alias("bi"), F.col("e.bv").alias("bv"))
    w = Window.partitionBy("bi", "bv")
    routed = exploded.select(
        "bi",
        "bv",
        "_m",
        F.count(F.lit(1)).over(w).alias("_n"),
        F.min("_m").over(w).alias("_keeper"),
    ).withColumn(
        "_sub",
        F.when(F.col("_n") <= int(max_bucket), F.lit(None)).otherwise(
            F.col("_m.id")
        ),
    )
    buckets = routed.groupBy("bi", "bv", "_sub").agg(
        F.first("_n").alias("n"),
        F.first("_keeper").alias("keeper"),
        F.sort_array(F.collect_set("_m")).alias("members"),
    )
    if observation is not None:
        is_bucket_row = (F.col("n") <= int(max_bucket)) | (
            F.element_at("members", 1)["id"] == F.col("keeper.id")
        )
        is_overflow = F.col("n") > int(max_bucket)
        buckets = buckets.observe(
            observation,
            F.sum(is_bucket_row.cast("long")).alias("n_buckets"),
            F.sum((is_bucket_row & (F.col("n") > 1)).cast("long")).alias(
                "n_colliding_buckets"
            ),
            F.sum((is_bucket_row & is_overflow).cast("long")).alias(
                "n_overflow_buckets"
            ),
            F.max("n").alias("max_bucket_size"),
        )
    buckets = buckets.where(F.col("n") > 1)
    # hamming computed INSIDE the expansion, so the multi-band
    # distinct below dedups 3 narrow columns instead of carrying both
    # signatures through (bands are functionally dependent on the ids,
    # so distinct over (id_a, id_b, hamming) equals a pair distinct) —
    # measured ~2x on the adversarial 250-group depth probe
    def pair_struct(x: str) -> str:
        ham = " + ".join(
            f"bit_count({x}.band{k} ^ y.band{k})" for k in range(N_BANDS)
        )
        return (
            f"struct({x}.id AS id_a, y.id AS id_b,"
            f" cast({ham} AS INT) AS hamming)"
        )

    all_pairs = (
        "flatten(transform(members, (x, i) ->"
        " transform(slice(members, i + 2, size(members) - i - 1),"
        f" y -> {pair_struct('x')})))"
    )
    star_pairs = (
        f"filter(transform(members, y -> {pair_struct('keeper')}),"
        " p -> p.id_b != p.id_a)"
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    f"CASE WHEN n <= {int(max_bucket)} THEN {all_pairs}"
                    f" ELSE {star_pairs} END"
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
