"""Cross-modal curation operators (datapipe/crossmodal.py): exact
cross-modal dedup, caption<->image alignment, metadata quality gate.
DuckDB twins where the semantics are SQL-expressible; mock-encoder
contract tests for the alignment plumbing."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from supercrawler_spark import fixtures
from supercrawler_spark.crawler import plan_str
from supercrawler_spark.datapipe import crossmodal as XM


def _planted_images() -> pd.DataFrame:
    base = fixtures.make_images(8)
    extra = pd.DataFrame([
        # duplicate caption of img-0001 on a distinct image
        {"image_id": "img-9001", "bytes": b"\x00", "w": 30, "h": 30,
         "fmt": "png", "caption": "synthetic caption 1 for img-0001",
         "phash": 111},
        # duplicate phash of img-0002 under a distinct caption
        {"image_id": "img-9002", "bytes": b"\x00", "w": 30, "h": 30,
         "fmt": "png", "caption": "a different caption",
         "phash": int(base.loc[2, "phash"])},
        # whitespace/case variant of img-0003's caption
        {"image_id": "img-9003", "bytes": b"\x00", "w": 30, "h": 30,
         "fmt": "png", "caption": "  Synthetic   CAPTION 3 for img-0003 ",
         "phash": 333},
        # empty + null captions: never caption-dup keys, both kept
        {"image_id": "img-9004", "bytes": b"\x00", "w": 30, "h": 30,
         "fmt": "png", "caption": "   ", "phash": 444},
        {"image_id": "img-9005", "bytes": b"\x00", "w": 30, "h": 30,
         "fmt": "png", "caption": None, "phash": 555},
    ])
    return pd.concat([base, extra], ignore_index=True)


def test_crossmodal_dedup_duckdb_parity_and_planted(spark):
    pdf = _planted_images()
    got = (XM.crossmodal_dedup(spark.createDataFrame(pdf))
           .orderBy("image_id").toPandas())

    con = duckdb.connect()
    con.register("images", pdf.drop(columns=["bytes"]))
    want = con.execute(XM.crossmodal_dedup_oracle_sql()).fetchdf()
    con.close()

    assert len(got) == len(want) == len(pdf)
    for col in ["image_id", "caption_canonical", "phash_canonical",
                "keep", "drop_reason"]:
        g = [None if pd.isna(v) else v for v in got[col]]
        w = [None if pd.isna(v) else v for v in want[col]]
        assert g == w, f"mismatch in {col}"

    by_id = got.set_index("image_id")
    # caption dup: img-9001 shares img-0001's caption, min-id keeps 0001
    assert not by_id.loc["img-9001", "keep"]
    assert by_id.loc["img-9001", "drop_reason"] == "dup_caption"
    assert by_id.loc["img-0001", "keep"]
    # image dup: img-9002 shares img-0002's phash; dup_image wins
    assert not by_id.loc["img-9002", "keep"]
    assert by_id.loc["img-9002", "drop_reason"] == "dup_image"
    # normalization: whitespace/case variant is the same caption key
    assert not by_id.loc["img-9003", "keep"]
    assert by_id.loc["img-9003", "drop_reason"] == "dup_caption"
    # blank/null captions are singleton groups -> kept
    assert by_id.loc["img-9004", "keep"] and by_id.loc["img-9005", "keep"]


def test_caption_text_embed_deterministic_unit_norm(spark):
    pdf = pd.DataFrame({
        "image_id": ["a", "b", "c", "d"],
        "caption": ["a red bird on a wire", "a red bird on a wire",
                    "completely different words here", ""],
    })
    df = spark.createDataFrame(pdf)
    out = {r["image_id"]: r["vec"]
           for r in XM.caption_text_embed(df, dim=16).collect()}
    assert out["a"] == out["b"]                      # deterministic
    assert out["d"] is None                          # zero-token abstains
    assert abs(np.linalg.norm(out["a"]) - 1.0) < 1e-5
    assert out["a"] != out["c"]


def test_alignment_mock_encoder_contract(spark):
    """With controlled encoders the operator is exactly per-row cosine:
    aligned onehots score 1.0, orthogonal score 0.0."""
    images = spark.createDataFrame(pd.DataFrame({
        "image_id": ["a", "b"], "caption": ["x", "y"], "bytes": [b"", b""]}))

    def onehot(i):
        v = [0.0, 0.0, 0.0]
        v[i] = 1.0
        return v

    def text_enc(df):
        return spark.createDataFrame(
            [("a", onehot(0)), ("b", onehot(1))], "image_id string, vec array<float>")

    def img_enc(df):
        return spark.createDataFrame(
            [("a", onehot(0)), ("b", onehot(2))], "image_id string, vec array<float>")

    got = {r["image_id"]: r["alignment"]
           for r in XM.caption_image_alignment(
               images, text_encoder=text_enc, image_encoder=img_enc).collect()}
    assert got == {"a": 1.0, "b": 0.0}


def test_alignment_default_stub_deterministic_and_bounded(spark):
    images = spark.createDataFrame(fixtures.make_images(6))
    a = XM.caption_image_alignment(images).orderBy("image_id").collect()
    b = XM.caption_image_alignment(images).orderBy("image_id").collect()
    assert [r["alignment"] for r in a] == [r["alignment"] for r in b]
    for r in a:
        assert r["alignment"] is not None
        assert -1.0 - 1e-6 <= r["alignment"] <= 1.0 + 1e-6
    # threshold gate keeps exactly the rows at/above the cut
    cut = sorted(r["alignment"] for r in a)[3]
    kept = {r["image_id"] for r in
            XM.alignment_filter(images, threshold=cut).collect() if r["keep"]}
    assert kept == {r["image_id"] for r in a if r["alignment"] >= cut}


def test_image_quality_gate_duckdb_parity(spark):
    pdf = _planted_images()
    pdf = pd.concat([pdf, pd.DataFrame([
        {"image_id": "img-9100", "bytes": b"", "w": 300, "h": 40,
         "fmt": "png", "caption": "wide", "phash": 1},      # extreme aspect
        {"image_id": "img-9101", "bytes": b"", "w": 80, "h": 80,
         "fmt": "gif", "caption": "fmt", "phash": 2},       # bad format
    ])], ignore_index=True)
    got = (XM.image_quality_gate(spark.createDataFrame(pdf),
                                 min_w=32, min_h=32)
           .orderBy("image_id").toPandas())
    con = duckdb.connect()
    con.register("images", pdf.drop(columns=["bytes"]))
    want = con.execute(XM.image_quality_gate_oracle_sql(
        min_w=32, min_h=32)).fetchdf()
    con.close()
    assert len(got) == len(want)
    assert got["image_id"].tolist() == want["image_id"].tolist()
    assert got["keep"].tolist() == [bool(v) for v in want["keep"]]
    assert [list(v) for v in got["reasons"]] == \
        [list(v) for v in want["reasons"]]
    by_id = got.set_index("image_id")
    assert by_id.loc["img-9100", "reasons"].tolist() == ["extreme_aspect"]
    assert by_id.loc["img-9101", "reasons"].tolist() == ["bad_format"]


def test_image_quality_gate_prunes_bytes_column(spark, tmp_path):
    """The metadata gate over a parquet scan must never read the bytes
    column — ReadSchema pruning is the operator's 100 TB contract."""
    path = str(tmp_path / "images.parquet")
    spark.createDataFrame(fixtures.make_images(4)).write.parquet(path)
    plan = plan_str(XM.image_quality_gate(spark.read.parquet(path)))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert all("bytes" not in ln for ln in read_schema), read_schema


def test_crossmodal_dedup_randomized_vs_pandas_reference(spark):
    """500 rows with heavy caption/phash collisions (and blank/null
    captions) vs an independent pandas reference implementation."""
    rng = np.random.default_rng(11)
    n = 500
    captions = [None, "", "   ", "cap one", "CAP  one", "cap two",
                "unique %d"]
    pdf = pd.DataFrame({
        "image_id": [f"id-{i:04d}" for i in range(n)],
        "caption": [
            (captions[int(c)] % i if c == 6 else captions[int(c)])
            for i, c in enumerate(rng.integers(0, 7, n))],
        "phash": rng.integers(0, 40, n),  # ~12 rows per phash value
    })

    # independent reference: same normalization + min-id canonicals
    ref = pdf.copy()
    ref["cap_norm"] = (ref.caption.str.lower().str.strip()
                       .str.replace(r"\s+", " ", regex=True)
                       .replace("", None))
    cap_min = (ref.dropna(subset=["cap_norm"])
               .groupby("cap_norm").image_id.min())
    ph_min = ref.groupby("phash").image_id.min()
    ref["caption_canonical"] = ref.cap_norm.map(cap_min)
    ref["phash_canonical"] = ref.phash.map(ph_min)
    img_ok = ref.image_id == ref.phash_canonical
    cap_ok = ref.caption_canonical.isna() | (ref.image_id ==
                                             ref.caption_canonical)
    ref["keep"] = img_ok & cap_ok
    ref["drop_reason"] = np.where(
        ~img_ok, "dup_image", np.where(~cap_ok, "dup_caption", None))

    got = (XM.crossmodal_dedup(spark.createDataFrame(pdf))
           .orderBy("image_id").toPandas())
    ref = ref.sort_values("image_id").reset_index(drop=True)
    assert got.image_id.tolist() == ref.image_id.tolist()
    assert got.keep.tolist() == ref.keep.tolist()
    g_reason = [None if pd.isna(v) else v for v in got.drop_reason]
    r_reason = [None if pd.isna(v) else v for v in ref.drop_reason]
    assert g_reason == r_reason
    assert got.phash_canonical.tolist() == ref.phash_canonical.tolist()
    # at these collision rates a majority of rows must be drops
    assert 0 < got.keep.sum() < n // 2


def test_alignment_corrupt_image_abstains(spark):
    """An undecodable image (or empty caption) yields NULL alignment;
    alignment_filter drops unscorable rows rather than scoring them 0."""
    pdf = pd.concat([fixtures.make_images(3), pd.DataFrame([
        {"image_id": "img-corrupt", "bytes": b"\x00\x01garbage",
         "w": 10, "h": 10, "fmt": "png", "caption": "fine caption",
         "phash": 1},
        {"image_id": "img-nocap", "bytes": bytes(
            fixtures.make_images(1).loc[0, "bytes"]),
         "w": 10, "h": 10, "fmt": "png", "caption": "", "phash": 2},
    ])], ignore_index=True)
    out = {r["image_id"]: r for r in
           XM.alignment_filter(spark.createDataFrame(pdf),
                               threshold=-1.0).collect()}
    assert out["img-corrupt"]["alignment"] is None
    assert out["img-corrupt"]["keep"] is False
    assert out["img-nocap"]["alignment"] is None
    assert out["img-nocap"]["keep"] is False
    for i in range(3):
        assert out[f"img-{i:04d}"]["alignment"] is not None
        assert out[f"img-{i:04d}"]["keep"] is True
