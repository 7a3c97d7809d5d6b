"""Multimodal column plumbing (north-star extension).

Images / audio / video are carried as opaque ``binary`` payload
columns plus a typed metadata struct — the layout that scales: the
payload never passes through Python except inside Arrow-batched
``mapInPandas`` stages, and metadata-only queries never touch the
bytes (parquet column pruning skips the payload entirely).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are STUBS: ``decode_image_stub`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, in which
case it derives a fake-but-deterministic "decoded" feature block from
the bytes (so the Spark-side plumbing — schemas, batching, partition
behavior — is fully real and testable). Swapping in a real codec
changes only the body of the kernel function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of a multimodal asset row: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),  # image|audio|video
                    T.StructField("format", T.StringType()),    # png|wav|mp4|…
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = (
    # doubles, not float32: the stripe means are exact rationals s/1020
    # whose float64 quotients are IEEE-identical across engines, which
    # is what lets the feature pipeline carry a full DuckDB oracle.
    "asset_id long, n_bytes long, payload_crc long, features array<double>"
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic asset table from ``documents``: the
    utf-8 bytes of the text become the payload (a stand-in for real
    image bytes), metadata derived from doc fields."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
            .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video"))
            .alias("modality"),
            F.lit("raw").alias("format"),
            (F.col("doc_id") % 640).cast("int").alias("width"),
            (F.col("doc_id") % 480).cast("int").alias("height"),
            (F.length("text") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes, *, deterministic_fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWxC array.

    STUB: real decoding needs an image codec (e.g. PIL), which is not
    available in this environment. With ``deterministic_fake`` the
    payload bytes are folded into a fixed-size pseudo-"pixel" block so
    downstream plumbing can be exercised deterministically.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires an image codec (PIL/opencv); "
            "not available in this environment — use deterministic_fake "
            "for plumbing tests"
        )
    buf = np.frombuffer(payload, dtype=np.uint8)
    size = 8 * 8
    reps = int(np.ceil(size / max(len(buf), 1)))
    return np.tile(buf, reps)[:size].reshape(8, 8).astype(np.uint8)


def extract_features(assets: DataFrame, *, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column via
    ``mapInPandas``: per input batch, "decode" each payload (stub) and
    emit a fixed-dim feature vector + payload stats.

    The iterator-of-batches shape is the real production kernel
    signature — a GPU/codec implementation would process
    ``pdf["payload"]`` in vectorized chunks exactly here.
    """

    feature_dim = FEATURE_DIM

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained on purpose: the kernel must not reference
        # module-level symbols, so cloudpickle ships it by value and
        # executor Python workers need no importable copy of this
        # package (the driver contract is consumed by path, not
        # installed). Semantics mirror
        # decode_image_stub(deterministic_fake) + 4-byte stripe
        # pooling, computed batch-wide: one concatenated uint8 buffer
        # + offsets, fancy-indexed (n, 64) head matrix, reduceat
        # checksums — no per-row Python in the hot loop (only the
        # rare shorter-than-64-byte payloads fall back to a tile).
        head_n = feature_dim * 4  # 64 = the stub's 8x8 block

        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            n = len(payloads)
            if n == 0:
                yield pd.DataFrame(
                    columns=["asset_id", "n_bytes", "payload_crc", "features"]
                )
                continue
            lens = np.fromiter((len(p) for p in payloads), np.int64, count=n)
            big = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            offs = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])

            # per-row byte sums mod 2^32 (empty rows excluded from
            # reduceat — zero-length segments misindex).
            sums = np.zeros(n, dtype=np.uint64)
            nonempty = lens > 0
            if big.size:
                sums[nonempty] = np.add.reduceat(
                    big.astype(np.uint64), offs[nonempty]
                )
            crcs = (sums % (2**32)).astype(np.int64)

            head = np.zeros((n, head_n), dtype=np.uint8)
            full = lens >= head_n
            if full.any():
                head[full] = big[offs[full, None] + np.arange(head_n)]
            for i in np.nonzero(~full & nonempty)[0]:
                buf = big[offs[i] : offs[i] + lens[i]]
                reps = int(np.ceil(head_n / lens[i]))
                head[i] = np.tile(buf, reps)[:head_n]
            feats = head.reshape(n, feature_dim, 4).mean(axis=2) / 255.0

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "n_bytes": lens,
                    "payload_crc": crcs,
                    "features": list(feats),
                }
            )

    return assets.mapInPandas(kernel, schema=_FEATURES_SCHEMA)


FRAME_BYTES = 16
FRAME_STEP = 32

_FRAME_SCHEMA = "asset_id long, frame_off long, frame_len long, frame_crc long"


def frame_checksums(
    assets: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    step: int = FRAME_STEP,
) -> DataFrame:
    """Per-sampled-frame decode stand-in over the payload column: the
    payload is treated as a sequence of ``frame_bytes``-byte frames
    and every frame starting at a multiple of ``step`` is "decoded"
    (stub: an exact byte-sum checksum; a real video path would seek +
    decode the frame here). One output row per sampled frame —
    mapInPandas is the row-expanding Arrow stage, exactly the shape a
    codec kernel needs (payload stays out of Python objects except as
    one concatenated buffer per batch).

    Fully vectorized per batch: frame counts → repeat/arange index
    math → one masked gather into the concatenated buffer → row-wise
    sums. No per-row Python.
    """
    fb, st = frame_bytes, step

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "frame_off", "frame_len", "frame_crc"]
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            n = len(payloads)
            lens = np.fromiter((len(p) for p in payloads), np.int64, count=n)
            nframes = (lens + st - 1) // st
            total = int(nframes.sum())
            if total == 0:
                yield pd.DataFrame(columns=cols)
                continue
            big = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_off = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=row_off[1:])
            rep = np.repeat(np.arange(n), nframes)
            fidx = np.arange(total) - np.repeat(np.cumsum(nframes) - nframes, nframes)
            off = fidx * st
            fl = np.minimum(fb, lens[rep] - off)
            idx = (row_off[rep] + off)[:, None] + np.arange(fb)
            valid = np.arange(fb)[None, :] < fl[:, None]
            vals = big[np.minimum(idx, big.size - 1)].astype(np.int64) * valid
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy()[rep],
                    "frame_off": off,
                    "frame_len": fl,
                    "frame_crc": vals.sum(axis=1),
                }
            )

    return assets.mapInPandas(kernel, schema=_FRAME_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video assets: one output row per
    sampled timestamp (metadata-only — pure JVM explode of a
    sequence; the per-frame decode would be a second mapInPandas
    stage over (payload, frame_ts))."""
    video = assets.filter(F.col("meta.modality") == "video")
    frame_ts = F.explode(
        F.sequence(
            F.lit(0).cast("long"),
            F.greatest(F.col("meta.duration_ms") - 1, F.lit(0).cast("long")),
            F.lit(every_ms).cast("long"),
        )
    )
    return video.select("asset_id", frame_ts.alias("frame_ms"))
