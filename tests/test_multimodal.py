"""Multimodal plumbing tests: binary columns through Arrow mapInPandas,
verified against numpy reference computations."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from polkadot_etl_spark.multimodal import (
    MEDIA_SCHEMA,
    byte_histogram_features,
    decode_image,
    resize_images,
    sample_frames,
)

RNG = np.random.RandomState(42)


def _image(mid, w, h):
    raster = RNG.randint(0, 256, size=(h, w), dtype=np.uint8)
    return (mid, "image", bytearray(raster.tobytes()), (w, h, 1, None, None, None)), raster


def _video(mid, w, h, n):
    frames = RNG.randint(0, 256, size=(n, h, w), dtype=np.uint8)
    return (mid, "video", bytearray(frames.tobytes()), (w, h, 1, None, n, 30.0)), frames


@pytest.fixture(scope="module")
def media(spark):
    rows, rasters = [], {}
    for mid, (w, h) in enumerate([(8, 6), (16, 16), (5, 7)]):
        row, raster = _image(mid, w, h)
        rows.append(row)
        rasters[mid] = raster
    vrow, vframes = _video(100, 4, 4, 6)
    rows.append(vrow)
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return {"df": df, "rasters": rasters, "vframes": vframes}


def test_decode_image_stats(media):
    out = {r.media_id: r for r in decode_image(media["df"]).collect()}
    assert len(out) == 3
    for mid, raster in media["rasters"].items():
        r = out[mid]
        assert r.valid and r.n_pixels == raster.size
        assert r.pixel_mean == pytest.approx(raster.astype(np.float64).mean())
        assert r.pixel_std == pytest.approx(raster.astype(np.float64).std())


def test_resize_nearest_neighbor(media):
    out = {r.media_id: r for r in resize_images(media["df"], 4, 3).collect()}
    raster = media["rasters"][0]  # 8x6 → 4x3: every 2nd pixel
    expect = raster[np.ix_([0, 2, 4], [0, 2, 4, 6])]
    got = np.frombuffer(out[0].content, dtype=np.uint8).reshape(3, 4)
    assert (got == expect).all()
    assert out[2].width == 4 and out[2].height == 3  # non-divisible dims OK


def test_byte_histogram_features(media):
    out = {r.media_id: r for r in byte_histogram_features(media["df"]).collect()}
    assert len(out) == 4  # kind-agnostic: images + video
    raster = media["rasters"][1]
    expect = np.bincount(raster.flatten() >> 4, minlength=16) / raster.size
    assert np.allclose(out[1].features, expect, atol=1e-6)
    assert abs(sum(out[1].features) - 1.0) < 1e-5


def test_sample_frames(media):
    out = sample_frames(media["df"], every_n=2).collect()
    assert {r.frame_index for r in out} == {0, 2, 4}
    frames = media["vframes"]
    got = {r.frame_index: np.frombuffer(r.content, dtype=np.uint8).reshape(4, 4) for r in out}
    for fi in (0, 2, 4):
        assert (got[fi] == frames[fi]).all()


def test_real_codec_is_clearly_stubbed(media):
    with pytest.raises((NotImplementedError, Exception)) as ei:
        decode_image(media["df"], codec="jpeg").collect()
    # the stub must be explicit, not an accidental failure
    assert "pillow" in str(ei.value) or "PIL" in str(ei.value)


def test_features_feed_similarity_search(spark, media):
    """The multimodal featurizer output plugs into the ANN operators."""
    feats = byte_histogram_features(media["df"])
    j = feats.alias("a").crossJoin(feats.alias("b")).where("a.media_id < b.media_id")
    dot = F.expr(
        "aggregate(zip_with(a.features, b.features, (x, y) -> cast(x as double) * y),"
        " 0D, (acc, v) -> acc + v)"
    )
    sims = j.select(F.col("a.media_id").alias("ma"), F.col("b.media_id").alias("mb"),
                    dot.alias("dot")).collect()
    assert len(sims) == 6 and all(s.dot > 0 for s in sims)
