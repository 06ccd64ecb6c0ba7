"""End-to-end corpus curation pipeline (datapipe/pipeline.py)."""

import pandas as pd

from supercrawler_spark import fixtures
from supercrawler_spark.datapipe import pipeline as PL


def _corpus(spark):
    base = fixtures.make_images(10)          # w,h in 24-64 → gate at 24 keeps
    extra = pd.DataFrame([
        # caption dup of img-0001 (distinct image) → dropped by dedup
        {"image_id": "img-dupcap", "bytes": bytes(base.loc[1, "bytes"]),
         "w": int(base.loc[1, "w"]), "h": int(base.loc[1, "h"]),
         "fmt": "png", "caption": str(base.loc[1, "caption"]),
         "phash": 991},
        # too small → dropped by the gate before anything else
        {"image_id": "img-tiny", "bytes": bytes(base.loc[2, "bytes"]),
         "w": 4, "h": 4, "fmt": "png", "caption": "tiny",
         "phash": 992},
        # bad format → gate drop
        {"image_id": "img-gif", "bytes": bytes(base.loc[3, "bytes"]),
         "w": 40, "h": 40, "fmt": "gif", "caption": "gif cap",
         "phash": 993},
    ])
    return spark.createDataFrame(
        pd.concat([base, extra], ignore_index=True))


def test_curate_corpus_stage_accounting_and_shards(spark, tmp_path):
    out = str(tmp_path / "shards")
    cfg = PL.CurationConfig(min_w=8, min_h=8, n_shards=4,
                            alignment_threshold=-1.0)  # keep all scorable
    res = PL.curate_corpus(_corpus(spark), out, cfg)
    s = res.stats
    assert s["input"] == 13
    assert s["after_quality_gate"] == 11           # tiny + gif dropped
    assert s["after_crossmodal_dedup"] == 10       # caption dup dropped
    assert s["after_alignment_filter"] == 10       # all scorable kept
    assert s["rows_sharded"] == 10
    assert s["shards_written"] == res.manifest.count()
    # written corpus is exactly the surviving ids
    back = {r["image_id"] for r in spark.read.parquet(out).collect()}
    assert back == {f"img-{i:04d}" for i in range(10)}
    # stage monotonicity: each stage only removes rows
    order = ["input", "after_quality_gate", "after_crossmodal_dedup",
             "after_alignment_filter", "rows_sharded"]
    vals = [s[k] for k in order]
    assert vals == sorted(vals, reverse=True)


def test_curate_corpus_alignment_stage_optional(spark, tmp_path):
    out = str(tmp_path / "shards2")
    cfg = PL.CurationConfig(min_w=8, min_h=8, n_shards=2,
                            alignment_threshold=None)
    res = PL.curate_corpus(_corpus(spark), out, cfg)
    assert res.stats["after_alignment_filter"] == \
        res.stats["after_crossmodal_dedup"]
    assert res.stats["rows_sharded"] == res.stats["after_alignment_filter"]


def test_curate_corpus_stats_off_single_pass(spark, tmp_path):
    """collect_stats=False skips intermediate counts (production mode):
    same written corpus, manifest-derived totals only."""
    out = str(tmp_path / "shards3")
    cfg = PL.CurationConfig(min_w=8, min_h=8, n_shards=4,
                            alignment_threshold=-1.0)
    res = PL.curate_corpus(_corpus(spark), out, cfg, collect_stats=False)
    assert set(res.stats) == {"shards_written", "rows_sharded"}
    assert res.stats["rows_sharded"] == 10
    back = {r["image_id"] for r in spark.read.parquet(out).collect()}
    assert back == {f"img-{i:04d}" for i in range(10)}
