"""Multimodal plumbing: schema shape, Arrow batch decode, frame slicing,
and the real-codec integration point."""

from __future__ import annotations

import pytest

from pandas_db_spark.operators import multimodal as M
from pandas_db_spark.sources.registry import read_parquet

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    return M.attach_media(docs, "text", "doc_id")


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<media_type:string,n_bytes:int")


def test_payload_roundtrip(media, spark):
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    row = media.orderBy("doc_id").limit(1).collect()[0]
    text = docs.orderBy("doc_id").limit(1).collect()[0]["text"]
    assert bytes(row["payload"]).decode("utf-8") == text
    assert row["meta"]["n_bytes"] == len(text.encode("utf-8"))


def test_fake_decode_deterministic(media):
    out = M.decode_media(media).orderBy("doc_id").collect()
    meta = {r["doc_id"]: r["meta"]["n_bytes"]
            for r in media.select("doc_id", "meta").collect()}
    for r in out:
        n = meta[r["doc_id"]]
        assert r["width"] == n % M.FAKE_WIDTH_MOD
        assert r["height"] == (n * 7) % M.FAKE_HEIGHT_MOD
        assert r["channels"] == 3


def test_real_codec_is_explicit_stub(media):
    with pytest.raises(NotImplementedError) as ei:
        M.decode_media(media, codec="pil")
    assert "register_codec" in str(ei.value)


def test_register_codec_swaps_decode_body(media, spark):
    """r10 (VERDICT r9 #8): a registered codec runs inside the same
    mapInPandas plumbing — schema, batching, id passthrough unchanged —
    and the fake codec's behavior is untouched by the registration."""
    def double_codec(payloads):
        import pandas as pd
        n = payloads.map(len)
        return pd.DataFrame({
            "width": (2 * n).astype("int32"),
            "height": (3 * n).astype("int32"),
            "channels": pd.Series(1, dtype="int32", index=payloads.index),
        })

    M.register_codec("double", double_codec)
    try:
        out = {r["doc_id"]: r for r in
               M.decode_media(media, codec="double").collect()}
        lens = {r["doc_id"]: r["meta"]["n_bytes"]
                for r in media.collect()}
        for doc_id, n in lens.items():
            assert out[doc_id]["width"] == 2 * n
            assert out[doc_id]["height"] == 3 * n
            assert out[doc_id]["channels"] == 1
        # fake codec unchanged (the oracle-gated default)
        fake = M.decode_media(media).collect()
        for r in fake:
            n = lens[r["doc_id"]]
            assert r["width"] == n % M.FAKE_WIDTH_MOD
            assert r["height"] == (n * 7) % M.FAKE_HEIGHT_MOD
    finally:
        M._CODECS.pop("double", None)


def test_pil_codec_activates_when_pil_present(spark):
    """Skip-marked real-codec path: in an environment WITH PIL, register
    the documented pil codec and decode a real PNG payload — the decode
    body swaps in, the Spark plumbing is identical."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    def pil_codec(payloads):
        import io as _io
        import pandas as pd
        from PIL import Image
        dims = [Image.open(_io.BytesIO(b)).size for b in payloads]
        return pd.DataFrame({
            "width": pd.Series([w for w, _ in dims], dtype="int32",
                               index=payloads.index),
            "height": pd.Series([h for _, h in dims], dtype="int32",
                                index=payloads.index),
            "channels": pd.Series(3, dtype="int32",
                                  index=payloads.index)})

    M.register_codec("pil", pil_codec)
    try:
        buf = io.BytesIO()
        PIL_Image.new("RGB", (17, 9)).save(buf, format="PNG")
        df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                                   "doc_id long, payload binary")
        row = M.decode_media(df, codec="pil").collect()[0]
        assert (row["width"], row["height"], row["channels"]) == (17, 9, 3)
    finally:
        M._CODECS.pop("pil", None)


def test_feature_histogram_mass_and_dim(media):
    """Each feature vector has the fixed dimension and its counts sum to the
    payload byte length (nothing dropped, nothing double-counted)."""
    feats = {r["doc_id"]: list(r["features"])
             for r in M.extract_features(media).collect()}
    sizes = {r["doc_id"]: r["meta"]["n_bytes"]
             for r in media.select("doc_id", "meta").collect()}
    assert feats.keys() == sizes.keys()
    for doc_id, f in feats.items():
        assert len(f) == M.FEATURE_BINS
        assert sum(f) == sizes[doc_id]
        assert all(v >= 0 for v in f)


def test_feature_bins_validated():
    with pytest.raises(ValueError):
        M.extract_features(None, bins=12)


def test_resize_preserves_aspect_and_bounds(media):
    out = M.resize_media(media, target_w=224, target_h=224).collect()
    for r in out:
        assert 1 <= r["out_w"] <= 224 and 1 <= r["out_h"] <= 224
        w, h = max(r["width"], 1), max(r["height"], 1)
        scale = min(224.0 / w, 224.0 / h)
        assert r["out_w"] == max(1, int(w * scale))
        assert r["out_h"] == max(1, int(h * scale))
        # the binding dimension fills the target (floor slack ≤ 1 pixel)
        assert max(r["out_w"], r["out_h"]) >= 223


def test_frame_slices_reassemble(media):
    frames = M.frame_slices(media, n_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    payloads = {r["doc_id"]: bytes(r["payload"])
                for r in media.collect()}
    for doc_id, fs in by_doc.items():
        fs.sort(key=lambda r: r["frame_idx"])
        assert len(fs) == 4
        joined = b"".join(bytes(r["frame"]) for r in fs)
        assert joined == payloads[doc_id]
        assert all(r["frame_len"] == len(bytes(r["frame"])) for r in fs)
