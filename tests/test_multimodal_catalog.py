import pytest

from pygr_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
)
from pygr_spark.plans.catalog import Catalog, SchemaEdge


def _media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNGfake1", {"src": "a"}),
        (2, "audio", "audio/wav", b"RIFFfake2", {"src": "b"}),
        (3, "video", "video/mp4", b"ftypfake3", {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features(spark):
    out = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    assert set(out) == {1, 2, 3}
    img = out[1]
    assert img.width and img.height and img.duration_ms is None
    assert len(img.feature) == 8 and all(0 <= x <= 1 for x in img.feature)
    assert len(img.sha256) == 64
    # deterministic: same payload → same features
    again = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    assert again[1].feature == img.feature
    assert out[2].duration_ms is not None


def test_extract_features_unknown_kind(spark):
    bad = spark.createDataFrame(
        [(9, "hologram", "x/y", b"zz", {})], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="hologram"):
        extract_features(bad).collect()


def test_resize_images(spark):
    from pygr_spark.operators.multimodal import _fake_image_resize, resize_images

    out = {r.media_id: r for r in resize_images(_media(spark), 32, 24).collect()}
    assert len(out) == 3
    # image row re-encoded + annotated; others untouched
    assert bytes(out[1].payload) == _fake_image_resize(b"\x89PNGfake1", 32, 24)
    assert out[1].meta["resized"] == "32x24" and out[1].meta["src"] == "a"
    assert bytes(out[2].payload) == b"RIFFfake2" and "resized" not in out[2].meta
    # schema is closed under the transform: stages compose
    resized_feats = extract_features(resize_images(_media(spark), 32, 24))
    assert resized_feats.count() == 3


def test_frame_sample_plan(spark):
    out = frame_sample_plan(_media(spark), every_ms=1000).collect()
    assert len(out) > 0
    assert all(r.frame_ts_ms % 1000 == 0 for r in out)
    assert {r.media_id for r in out} == {3}


def test_feature_schema_stable(spark):
    df = extract_features(_media(spark))
    assert df.schema == FEATURE_SCHEMA


def test_catalog(spark):
    cat = Catalog()
    seqs = spark.createDataFrame([("s1", "acgt")], ["id", "seq"])
    annots = spark.createDataFrame([("X", "s1", 0, 2)], ["annot_id", "seq_id", "start", "stop"])
    cat.add_resource("Bio.Seq.Test", seqs)
    cat.add_resource("Bio.Annotation.Test", lambda: annots)
    assert cat.dir("Bio.") == ["Bio.Annotation.Test", "Bio.Seq.Test"]
    assert cat("Bio.Seq.Test").count() == 1

    cat.add_schema(
        SchemaEdge(
            source="Bio.Annotation.Test",
            attr="sequence",
            target="Bio.Seq.Test",
            relation="many:one",
            source_key="seq_id",
            target_key="id",
        )
    )
    j = cat.auto_join("Bio.Annotation.Test", "sequence")
    row = j.collect()[0]
    assert row.annot_id == "X" and row.seq == "acgt"

    with pytest.raises(KeyError):
        cat("Nope")
    with pytest.raises(KeyError):
        cat.auto_join("Bio.Seq.Test", "nothing")
