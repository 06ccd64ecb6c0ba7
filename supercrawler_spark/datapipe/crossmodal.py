"""Cross-modal curation over image+caption tables.

The reference crawler stops at fetch + handler extraction
(`lib/Crawler.js:159-217` downloads content and hands it to handlers);
these operators extend the engine with the curation stages a web-scale
image+caption corpus needs AFTER the crawl — the LAION-style pipeline:

- ``crossmodal_dedup``: exact cross-modal dedup — duplicate captions
  attached to distinct images and duplicate images (same 64-bit phash)
  attached to distinct captions, one keep/drop verdict per row.
- ``caption_image_alignment`` / ``alignment_filter``: encoder-based
  caption<->image agreement score + threshold gate (the CLIP-score
  filter shape).
- ``image_quality_gate``: metadata-only size / aspect-ratio / format
  gate (pure JVM column expressions — never touches the bytes).

Encoders are deterministic stand-ins (hashing-trick text projection,
centered block-mean image thumbnail) because no model runtime exists in
this sandbox; both are injectable so a real text/image tower drops in as
a same-signature ``fn(df) -> DataFrame(image_id, vec)``. The Spark
plumbing — Arrow-batched ``mapInPandas`` encoders, JVM-side cosine,
groupBy-min canonicalization — is the production shape.

Scale notes (10^10-row corpus):
- Dedup canonicalization is groupBy-min + equi-join back, both
  map-combinable; a window over the dup key would serialize the hottest
  key (millions of rows sharing one boilerplate caption) through a
  single task. Null/empty captions are excluded from caption-dup keys —
  at web scale "" is always the most skewed key.
- Alignment joins two derivations of the SAME table on its id: an
  equi-join AQE plans as a shuffle join on an id key that is unique on
  both sides — no skew, no broadcast needed, and the cosine itself is
  a JVM higher-order function (no Python in the scoring hot path).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import multimodal as MM
from .similarity import cosine


def _caption_norm(col) -> "F.Column":
    """lower + trim + collapse internal whitespace; '' -> NULL so empty
    captions never form a dedup group (the most skewed key on the web)."""
    return F.nullif(
        F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), F.lit(""))


def crossmodal_dedup(images: DataFrame, id_col: str = "image_id",
                     caption_col: str = "caption",
                     phash_col: str = "phash") -> DataFrame:
    """One-pass exact cross-modal dedup over (image, caption) pairs.

    A row is kept iff it is the min-id canonical of BOTH its exact-image
    group (same ``phash``) and its caption group (same normalized
    caption; null/empty captions are singleton groups by definition).
    ``drop_reason`` prefers 'dup_image' (the stronger duplicate) over
    'dup_caption'. Min-id canonicals are independent per key — a dropped
    canonical does not resurrect the rows it shadowed (standard one-pass
    dedup semantics; documented so the SQL twin is exact).

    Returns (image_id, caption_canonical, phash_canonical, keep,
    drop_reason) — one row per input row.
    """
    base = images.select(
        F.col(id_col).alias("image_id"),
        _caption_norm(F.col(caption_col)).alias("cap_norm"),
        F.col(phash_col).alias("phash"))

    cap_canon = (base.filter(F.col("cap_norm").isNotNull())
                 .groupBy("cap_norm")
                 .agg(F.min("image_id").alias("caption_canonical")))
    ph_canon = (base.groupBy("phash")
                .agg(F.min("image_id").alias("phash_canonical")))

    joined = (base
              .join(cap_canon, "cap_norm", "left")
              .join(ph_canon, "phash", "left"))
    is_img_canon = F.col("image_id") == F.col("phash_canonical")
    is_cap_canon = (F.col("caption_canonical").isNull() |
                    (F.col("image_id") == F.col("caption_canonical")))
    return joined.select(
        "image_id",
        "caption_canonical",
        "phash_canonical",
        (is_img_canon & is_cap_canon).alias("keep"),
        F.when(~is_img_canon, F.lit("dup_image"))
         .when(~is_cap_canon, F.lit("dup_caption"))
         .alias("drop_reason"))


def crossmodal_dedup_oracle_sql(table: str = "images") -> str:
    """DuckDB twin of :func:`crossmodal_dedup` (same keep/drop rules)."""
    return f"""
        WITH base AS (
          SELECT image_id,
                 nullif(lower(trim(regexp_replace(caption, '\\s+', ' ', 'g'))), '')
                   AS cap_norm,
                 phash
          FROM {table}
        ),
        cap AS (SELECT cap_norm, min(image_id) AS caption_canonical
                FROM base WHERE cap_norm IS NOT NULL GROUP BY cap_norm),
        ph  AS (SELECT phash, min(image_id) AS phash_canonical
                FROM base GROUP BY phash)
        SELECT b.image_id, cap.caption_canonical, ph.phash_canonical,
               (b.image_id = ph.phash_canonical AND
                (cap.caption_canonical IS NULL OR
                 b.image_id = cap.caption_canonical)) AS keep,
               CASE WHEN b.image_id <> ph.phash_canonical THEN 'dup_image'
                    WHEN cap.caption_canonical IS NOT NULL AND
                         b.image_id <> cap.caption_canonical THEN 'dup_caption'
               END AS drop_reason
        FROM base b
        LEFT JOIN cap USING (cap_norm)
        LEFT JOIN ph  USING (phash)
        ORDER BY image_id
    """


def caption_text_embed(df: DataFrame, id_col: str = "image_id",
                       caption_col: str = "caption", dim: int = 16,
                       seed: int = 7) -> DataFrame:
    """Deterministic text-encoder stand-in: hashing-trick projection of
    unigram+bigram tokens into ``dim`` dims (md5-seeded index + sign),
    L2-normalized. Arrow-batched; a real text tower replaces this with
    the same (image_id, vec) contract. Zero-token captions -> NULL vec."""
    out_schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("vec", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches):
        memo: dict[str, tuple[int, float]] = {}

        def slot(tok: str) -> tuple[int, float]:
            hit = memo.get(tok)
            if hit is None:
                h = int(hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:8], 16)
                hit = (h % dim, 1.0 if (h >> 31) & 1 else -1.0)
                memo[tok] = hit
            return hit

        for pdf in batches:
            ids, vecs = [], []
            for iid, cap in zip(pdf[id_col], pdf[caption_col]):
                ids.append(iid)
                toks = [t for t in ("" if cap is None else cap).lower().split()
                        if t]
                toks += [a + " " + b for a, b in zip(toks, toks[1:])]
                if not toks:
                    vecs.append(None)
                    continue
                v = np.zeros(dim, dtype=np.float64)
                for t in toks:
                    i, s = slot(t)
                    v[i] += s
                n = float(np.linalg.norm(v))
                vecs.append((v / n).astype(np.float32).tolist() if n > 0
                            else None)
            yield pd.DataFrame({"image_id": ids, "vec": vecs})

    return df.select(id_col, caption_col).mapInPandas(kernel, schema=out_schema)


def image_thumb_embed(df: DataFrame, id_col: str = "image_id",
                      bytes_col: str = "bytes", side: int = 4) -> DataFrame:
    """Deterministic image-encoder stand-in: block-mean grayscale
    thumbnail (existing decode kernel), mean-centered then L2-normalized
    JVM-side so cosine against it is contrast-invariant. dim = side^2."""
    thumbs = MM.thumbnail_vectors(df, id_col=id_col, bytes_col=bytes_col,
                                  side=side)
    mean = F.aggregate("thumb", F.lit(0.0), lambda a, v: a + v) / F.size("thumb")
    centered = F.transform("thumb", lambda v: v - mean)
    norm = F.sqrt(F.aggregate(centered, F.lit(0.0), lambda a, v: a + v * v))
    vec = F.when(norm > 0,
                 F.transform(centered, lambda v: (v / norm).cast("float")))
    return thumbs.select("image_id", vec.alias("vec"))


def caption_image_alignment(images: DataFrame, id_col: str = "image_id",
                            caption_col: str = "caption",
                            bytes_col: str = "bytes", side: int = 4,
                            text_encoder=None, image_encoder=None,
                            round_to: int = 4) -> DataFrame:
    """CLIP-score-shaped alignment: cosine(text_vec, image_vec) per row.

    Encoders are ``fn(images) -> DataFrame(image_id, vec)``; defaults are
    the deterministic stand-ins above (text dim is forced to the image
    side^2 so the default pair is comparable). Rows where either encoder
    abstains (NULL vec) get a NULL alignment — downstream filters treat
    that as "cannot score", not zero.
    """
    text = (text_encoder(images) if text_encoder is not None
            else caption_text_embed(images, id_col=id_col,
                                    caption_col=caption_col,
                                    dim=side * side))
    img = (image_encoder(images) if image_encoder is not None
           else image_thumb_embed(images, id_col=id_col,
                                  bytes_col=bytes_col, side=side))
    t = text.select(F.col("image_id"), F.col("vec").alias("t_vec"))
    i = img.select(F.col("image_id"), F.col("vec").alias("i_vec"))
    return (t.join(i, "image_id")
            .select("image_id",
                    F.round(cosine(F.col("t_vec"), F.col("i_vec")),
                            round_to).alias("alignment")))


def alignment_filter(images: DataFrame, threshold: float,
                     id_col: str = "image_id", **kwargs) -> DataFrame:
    """Threshold gate over :func:`caption_image_alignment`; unscorable
    rows (NULL alignment) are dropped, matching production CLIP-filters
    where an undecodable/empty side disqualifies the pair."""
    scored = caption_image_alignment(images, id_col=id_col, **kwargs)
    return scored.select(
        "image_id", "alignment",
        (F.col("alignment").isNotNull() &
         (F.col("alignment") >= threshold)).alias("keep"))


def image_quality_gate(images: DataFrame, id_col: str = "image_id",
                       min_w: int = 64, min_h: int = 64,
                       max_aspect: float = 3.0,
                       allowed_fmts: tuple[str, ...] = ("png", "jpeg"),
                       ) -> DataFrame:
    """Metadata-only image gate (size / aspect ratio / format): pure JVM
    column expressions over (w, h, fmt) — the scan never reads the bytes
    column (column pruning), which is the whole point at 100 TB."""
    aspect = (F.greatest(F.col("w"), F.col("h")) /
              F.least(F.col("w"), F.col("h")).cast("double"))
    reasons = F.filter(F.array(
        F.when(F.col("w") < min_w, F.lit("too_narrow")),
        F.when(F.col("h") < min_h, F.lit("too_short")),
        F.when(aspect > max_aspect, F.lit("extreme_aspect")),
        F.when(~F.col("fmt").isin(*allowed_fmts), F.lit("bad_format")),
    ), lambda x: x.isNotNull())
    return images.select(
        F.col(id_col).alias("image_id"), "w", "h", "fmt",
        reasons.alias("reasons"),
        (F.size(reasons) == 0).alias("keep"))


def image_quality_gate_oracle_sql(table: str = "images", min_w: int = 64,
                                  min_h: int = 64, max_aspect: float = 3.0,
                                  allowed_fmts: tuple[str, ...] = ("png", "jpeg"),
                                  ) -> str:
    """DuckDB twin of :func:`image_quality_gate`."""
    fmts = ", ".join(f"'{f}'" for f in allowed_fmts)
    return f"""
        SELECT image_id, w, h, fmt,
               list_filter([
                 CASE WHEN w < {min_w} THEN 'too_narrow' END,
                 CASE WHEN h < {min_h} THEN 'too_short' END,
                 CASE WHEN greatest(w, h) / least(w, h)::DOUBLE > {max_aspect}
                      THEN 'extreme_aspect' END,
                 CASE WHEN fmt NOT IN ({fmts}) THEN 'bad_format' END
               ], x -> x IS NOT NULL) AS reasons,
               len(list_filter([
                 CASE WHEN w < {min_w} THEN 'too_narrow' END,
                 CASE WHEN h < {min_h} THEN 'too_short' END,
                 CASE WHEN greatest(w, h) / least(w, h)::DOUBLE > {max_aspect}
                      THEN 'extreme_aspect' END,
                 CASE WHEN fmt NOT IN ({fmts}) THEN 'bad_format' END
               ], x -> x IS NOT NULL)) = 0 AS keep
        FROM {table} ORDER BY image_id
    """
