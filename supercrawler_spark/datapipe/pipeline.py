"""End-to-end image+caption corpus curation: crawl output → training shards.

One call chains the LAION-shaped curation stages over a crawled
image+caption table (the BASELINE.json input_hint shape —
(image_id, bytes, w, h, fmt, caption, phash)):

    metadata quality gate  →  exact cross-modal dedup  →
    caption<->image alignment filter  →  deterministic shard sink

Each stage is the already-audited operator (crossmodal.py, sharding.py);
this module only sequences them and accounts for what each dropped. The
reference has no equivalent — its pipeline ends at handler events
(`lib/Crawler.js:200-217`); this is the post-crawl half a 100 TB
training-data system needs.

Scale notes: the stages communicate by DataFrame, so Catalyst fuses the
gate filter into the dedup's first shuffle; per-stage counts are single
map-combinable aggregations (no driver-side row transfer); the sink
repartition is the pipeline's only non-key shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import crossmodal as XM
from . import sharding as SH


@dataclass
class CurationConfig:
    min_w: int = 64
    min_h: int = 64
    max_aspect: float = 3.0
    allowed_fmts: tuple = ("png", "jpeg")
    alignment_threshold: float | None = 0.0  # None disables the stage
    n_shards: int = 16
    id_col: str = "image_id"
    # injectable encoder stand-ins (see crossmodal.caption_image_alignment)
    text_encoder: object = None
    image_encoder: object = None


@dataclass
class CurationResult:
    manifest: DataFrame          # shard sink manifest (shard, n_rows, ...)
    stats: dict = field(default_factory=dict)  # per-stage in/kept counts


def curate_corpus(images: DataFrame, out_path: str,
                  cfg: CurationConfig = CurationConfig(),
                  collect_stats: bool = True) -> CurationResult:
    """Runs the full curation pipeline and writes training shards to
    ``out_path``. Returns the sink manifest plus per-stage drop
    accounting (scalars only — no per-row driver transfer).

    Stage order is deliberate: the metadata gate is the cheapest filter
    (no bytes read, no shuffle) so it runs first; exact dedup next (one
    groupBy-min pass over survivors); the alignment filter last because
    its encoders decode bytes — it should see the fewest rows.

    ``collect_stats=True`` counts each stage, which forces a pass per
    stage; the expensive stage outputs are persisted so no stage (in
    particular the decoding alignment encoders) ever executes twice —
    one persisted pass each, released before return.
    ``collect_stats=False`` skips the intermediate counts entirely: the
    whole pipeline fuses into the sink write's single lineage (plus the
    dedup/alignment shuffles), and only the manifest-derived totals are
    reported — the 100 TB production mode.
    """
    idc = cfg.id_col
    stats: dict[str, int] = {}
    pinned: list[DataFrame] = []

    def stage(df: DataFrame, key: str) -> DataFrame:
        if collect_stats:
            df = df.persist()
            pinned.append(df)
            stats[key] = df.count()
        return df

    try:
        if collect_stats:
            stats["input"] = images.count()

        gate = XM.image_quality_gate(
            images, id_col=idc, min_w=cfg.min_w, min_h=cfg.min_h,
            max_aspect=cfg.max_aspect, allowed_fmts=cfg.allowed_fmts)
        gated = stage(images.join(
            gate.filter(F.col("keep")).select(F.col("image_id").alias(idc)),
            idc, "left_semi"), "after_quality_gate")

        verdicts = XM.crossmodal_dedup(gated, id_col=idc)
        deduped = stage(gated.join(
            verdicts.filter(F.col("keep"))
                    .select(F.col("image_id").alias(idc)),
            idc, "left_semi"), "after_crossmodal_dedup")

        if cfg.alignment_threshold is not None:
            aligned = XM.alignment_filter(
                deduped, threshold=cfg.alignment_threshold, id_col=idc,
                text_encoder=cfg.text_encoder,
                image_encoder=cfg.image_encoder)
            kept = stage(deduped.join(
                aligned.filter(F.col("keep"))
                       .select(F.col("image_id").alias(idc)),
                idc, "left_semi"), "after_alignment_filter")
        else:
            kept = deduped
            if collect_stats:
                stats["after_alignment_filter"] = \
                    stats["after_crossmodal_dedup"]

        manifest = SH.write_shards(kept, out_path, cfg.n_shards, id_col=idc)
    finally:
        for df in pinned:
            df.unpersist()
    stats["shards_written"] = manifest.count()
    stats["rows_sharded"] = (manifest.agg(F.sum("n_rows")).collect()[0][0]
                             or 0)
    return CurationResult(manifest=manifest, stats=stats)
