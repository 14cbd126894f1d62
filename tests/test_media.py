"""Multimodal stage plumbing: fetch → decode → resize/frames → features.

Codecs are deterministic stubs (stages/media.py); these tests pin the
Ray-side contract — schemas, row multiplicity, determinism, and that
media spans in ``documents`` are untouched by the text pipeline.
"""

import pyarrow as pa
import pytest

from stanford_relation_extractor_ray.corpus import documents_dataset
from stanford_relation_extractor_ray.stages import media

N_DOCS = 60


@pytest.fixture(scope="module")
def media_items(ray_session):
    return media.extract_media(documents_dataset(N_DOCS)).materialize()


def test_extract_media_schema_and_refs(media_items):
    tables = list(media_items.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(tables)
    assert t.schema.equals(media.MEDIA_ITEM_SCHEMA)
    assert t.num_rows > 0
    kinds = set(t.column("kind").to_pylist())
    assert kinds <= {"image", "audio", "table"}
    for ref in t.column("media_ref").to_pylist():
        assert ref.startswith("media://d")


def test_decode_metadata(media_items):
    dec = media.decode(media_items, concurrency=2).materialize()
    rows = dec.take_all()
    assert len(rows) == media_items.count()
    for r in rows:
        if r["kind"] == "image":
            assert 64 <= r["width"] <= 2048 and 64 <= r["height"] <= 2048
            assert 1 <= r["channels"] <= 4
        elif r["kind"] == "audio":
            assert r["sample_rate"] in (8000, 16000, 22050, 44100)
            assert 0.5 <= r["duration_s"] <= 60.0
        elif r["kind"] == "table":
            assert r["n_rows"] >= 1 and r["n_cols"] >= 1


def test_decode_rejects_non_synthetic_payload():
    d = media.MediaDecoder()
    with pytest.raises(NotImplementedError):
        d._decode("image", b"\x89PNG----real-bytes----")


def test_resize_fits_box_and_is_deterministic(media_items):
    dec = media.decode(media_items, concurrency=2)
    small = media.resize_images(dec, max_side=128, concurrency=2)
    rows = sorted(small.take_all(), key=lambda r: r["media_ref"])
    assert rows, "corpus should contain image spans"
    for r in rows:
        assert r["kind"] == "image"
        assert max(r["width"], r["height"]) <= 128
        assert len(r["payload"]) > 0
    # determinism: second run bit-identical
    rows2 = sorted(
        media.resize_images(media.decode(media_items, concurrency=2),
                            max_side=128, concurrency=2).take_all(),
        key=lambda r: r["media_ref"])
    assert [r["payload"] for r in rows] == [r["payload"] for r in rows2]


def test_frame_sampling_multiplicity(media_items):
    dec = media.decode(media_items, concurrency=2).materialize()
    frames = media.sample_frames(dec, every_s=1.0, max_frames=16)
    rows = frames.take_all()
    n_audio = sum(1 for r in dec.take_all() if r["kind"] == "audio")
    assert n_audio > 0
    by_ref: dict[str, list] = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    assert len(by_ref) == n_audio
    for ref, fr in by_ref.items():
        fr.sort(key=lambda r: r["frame_idx"])
        assert [f["frame_idx"] for f in fr] == list(range(len(fr)))
        assert len(fr) <= 16
        for f in fr:
            assert f["t_start"] < f["t_end"]


def test_media_features_unit_norm(media_items):
    import numpy as np
    feats = media.featurize_media(media_items, dim=32, concurrency=2)
    rows = feats.take_all()
    assert len(rows) == media_items.count()
    for r in rows[:20]:
        v = np.asarray(r["embedding"], dtype=np.float64)
        assert v.shape == (32,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    assert "payload" not in feats.schema().names
