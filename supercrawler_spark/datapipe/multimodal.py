"""Multimodal (image) column plumbing over mapInPandas.

Images travel as opaque ``binary`` columns with typed metadata — exactly the
reference's opaque Buffer body (/root/reference/lib/Crawler.js:335-339).
The decode step uses the deterministic numpy codec from
supercrawler_spark.imaging (the container has no PIL/libjpeg — swapping the
two codec calls for PIL is the only production change; schema, partitioning,
UDF signature and Arrow batch shape are the real thing and tested).

Stages:
- decode_features: binary → (w, h, fmt, phash, mean_luma) per row
- verify_against_reference: decoded-pixel PSNR vs the expected pixels +
  caption equality (the BASELINE.json per-row invariant)
- resize/frame-sample style derivations: block-mean thumbnail vector
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import imaging

DECODE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("decode_error", T.StringType()),
])


def decode_features(df: DataFrame, id_col: str = "image_id",
                    bytes_col: str = "bytes") -> DataFrame:
    """binary → typed features, one vectorized mapInPandas pass.
    Corrupt payloads yield a decode_error row instead of failing the stage
    (a 100 TB crawl always contains corrupt bytes)."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    px, w, h, fmt = imaging.decode_image(
                        bytes(data) if data is not None else b"")
                    luma = float(np.mean(
                        px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])))
                    rows.append((iid, w, h, fmt, imaging.phash64(px),
                                 round(luma, 4), None))
                except Exception as exc:
                    rows.append((iid, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA])

    return df.select(id_col, bytes_col).mapInPandas(kernel, schema=DECODE_SCHEMA)


def phash_dup_pairs(df: DataFrame, id_col: str = "image_id",
                    bytes_col: str = "bytes", max_hamming: int = 6,
                    phash_col: str | None = None) -> DataFrame:
    """Near-duplicate IMAGE detection at corpus scale — the image-axis
    twin of text SimHash dedup (input_hint's phash:int64 column made
    first-class): decode → 64-bit perceptual hash (one mapInPandas pass,
    corrupt rows dropped) → banded hamming join via the shared
    pigeonhole-complete kernel (datapipe.dedup.hamming_near_pairs), so
    candidates are chunk-collision buckets only, never O(n²) image pairs,
    and the verify is a codegen'd bit_count.

    Pass ``phash_col`` to skip the decode when the table already carries
    precomputed perceptual hashes (the input_hint schema) — then the
    whole operator is pure JVM."""
    from . import dedup as _dd
    if phash_col is not None:
        sigs = df.select(F.col(id_col), F.col(phash_col).alias("phash"))
    else:
        sigs = (decode_features(df, id_col=id_col, bytes_col=bytes_col)
                .filter(F.col("decode_error").isNull())
                .select(id_col, "phash"))
    return _dd.hamming_near_pairs(sigs, "phash", id_col,
                                  bits=64, max_hamming=max_hamming)


def phash_dup_clusters(df: DataFrame, id_col: str = "image_id",
                       bytes_col: str = "bytes", max_hamming: int = 6,
                       phash_col: str | None = None) -> DataFrame:
    """The image-dedup final step: phash near-pairs → connected components
    → (image_id, cluster_id) keep/drop groups, mirroring text corpus dedup
    (minhash/simhash pairs → dedup.dup_clusters). cluster_id is the min
    image id in the component; images with no near pair are trivially
    their own keepers and are not emitted (at 100 TB the pair set — not
    the corpus — is the clustering input, so the label-propagation joins
    run over O(duplicates), never O(corpus))."""
    from . import dedup as _dd
    pairs = phash_dup_pairs(df, id_col=id_col, bytes_col=bytes_col,
                            max_hamming=max_hamming, phash_col=phash_col)
    return _dd.dup_clusters(pairs).withColumnRenamed("doc_id", id_col)


VERIFY_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("psnr_db", T.DoubleType()),
    T.StructField("pixels_ok", T.BooleanType()),
    T.StructField("caption_ok", T.BooleanType()),
])


def verify_against_reference(df: DataFrame, id_col: str = "image_id",
                             bytes_col: str = "bytes",
                             caption_col: str = "caption",
                             min_psnr_db: float = 40.0) -> DataFrame:
    """The BASELINE.json per-row invariant as a stage: decoded pixels
    allclose vs the deterministic reference pixels (PSNR >= 40 dB lossy /
    exact lossless) + caption equality."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for iid, data, cap in zip(pdf[id_col], pdf[bytes_col], pdf[caption_col]):
                try:
                    px, w, h, fmt = imaging.decode_image(bytes(data))
                    ref = imaging.synth_pixels(iid, w, h)
                    p = imaging.psnr(ref, px)
                    ok = bool(np.array_equal(ref, px)) if fmt == "png" \
                        else bool(p >= min_psnr_db)
                    expected_cap = (
                        f"synthetic caption {int(iid.split('-')[1])} for {iid}")
                    rows.append((iid, None if p == float("inf") else round(p, 2),
                                 ok, cap == expected_cap))
                except Exception:
                    rows.append((iid, None, False, False))
            yield pd.DataFrame(rows, columns=[f.name for f in VERIFY_SCHEMA])

    return (df.select(id_col, bytes_col, caption_col)
              .mapInPandas(kernel, schema=VERIFY_SCHEMA))


FRAME_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("phash", T.LongType()),
    T.StructField("decode_error", T.StringType()),
])


def frame_sample(df: DataFrame, every_n: int = 4, id_col: str = "video_id",
                 bytes_col: str = "bytes") -> DataFrame:
    """Video frame-sampling stage: one opaque binary in → one row per
    sampled frame out (UDTF shape over mapInPandas). Parses the synthetic
    length-prefixed frame container (fixtures.make_videos) and decodes
    every ``every_n``-th frame; a production build swaps the container
    parser + codec for pyav/ffmpeg keyframe extraction — the schema,
    batching and fan-out shape are the real thing. Corrupt containers
    degrade to a decode_error row."""
    import struct

    def kernel(batches):
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    blob = bytes(data) if data is not None else b""
                    if blob[:4] != b"SVID":
                        raise ValueError("not a SVID container")
                    n_frames = struct.unpack("<I", blob[4:8])[0]
                    off = 8
                    for f in range(n_frames):
                        ln = struct.unpack("<I", blob[off:off + 4])[0]
                        frame = blob[off + 4:off + 4 + ln]
                        off += 4 + ln
                        if f % every_n:
                            continue
                        px, w, h, fmt = imaging.decode_image(frame)
                        rows.append((vid, f, w, h, imaging.phash64(px), None))
                except Exception as exc:
                    rows.append((vid, None, None, None, None, str(exc)))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.select(id_col, bytes_col).mapInPandas(kernel, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("decode_error", T.StringType()),
])


def audio_features(df: DataFrame, id_col: str = "audio_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Audio feature extraction over opaque binary columns: a REAL WAV
    decode (stdlib ``wave`` — PCM16 mono/stereo) in one mapInPandas pass →
    sample rate, duration, RMS loudness, peak. Corrupt payloads degrade to
    error rows. A production build swaps the parser for soundfile/ffmpeg;
    the schema and Arrow batch shape stay the same."""
    import io
    import wave

    def kernel(batches):
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    with wave.open(io.BytesIO(bytes(data)), "rb") as w:
                        sr = w.getframerate()
                        n = w.getnframes()
                        ch = w.getnchannels()
                        if w.getsampwidth() != 2:
                            raise ValueError("only PCM16 supported")
                        pcm = np.frombuffer(w.readframes(n), dtype="<i2")
                    x = pcm.astype(np.float64) / 32767.0
                    if ch > 1:
                        x = x.reshape(-1, ch).mean(axis=1)
                    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                    peak = float(np.abs(x).max()) if len(x) else 0.0
                    rows.append((aid, sr, n, round(n / sr, 4),
                                 round(rms, 4), round(peak, 4), None))
                except Exception as exc:
                    rows.append((aid, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA])

    return df.select(id_col, bytes_col).mapInPandas(kernel, schema=AUDIO_SCHEMA)


def thumbnail_vectors(df: DataFrame, id_col: str = "image_id",
                      bytes_col: str = "bytes", side: int = 4) -> DataFrame:
    """Resize stage: block-mean grayscale thumbnail as array<float> —
    the embedding-ish derivation used for visual near-dup search."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("thumb", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches):
        for pdf in batches:
            ids, thumbs = [], []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    px, w, h, fmt = imaging.decode_image(bytes(data))
                except Exception:
                    ids.append(iid); thumbs.append(None)
                    continue
                gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                yi = (np.arange(h) * side // h).clip(0, side - 1)
                xi = (np.arange(w) * side // w).clip(0, side - 1)
                acc = np.zeros((side, side))
                cnt = np.zeros((side, side))
                np.add.at(acc, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), gray)
                np.add.at(cnt, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), 1.0)
                ids.append(iid)
                thumbs.append((acc / np.maximum(cnt, 1)).flatten()
                              .astype(np.float32).tolist())
            yield pd.DataFrame({"image_id": ids, "thumb": thumbs})

    return df.select(id_col, bytes_col).mapInPandas(kernel, schema=schema)
