"""Distant-supervision training path: DS labeling, feature threshold,
LR learning, caching, bagged ensemble (SURVEY.md §3.2, §2.7)."""

import numpy as np
import pytest

from stanford_relation_extractor_ray.stages.classify import (
    LRModel, NO_RELATION)

N_TRAIN = 300


@pytest.fixture(scope="module")
def model_dict(ray_session, tmp_path_factory):
    from stanford_relation_extractor_ray.pipelines.train import train_lr
    cache = str(tmp_path_factory.mktemp("lrcache"))
    return train_lr(N_TRAIN, cache_dir=cache), cache


def test_lr_learns_pattern_features(model_dict):
    d, _ = model_dict
    lr = LRModel.from_dict(d)
    # a bag with a strong connector phrase should classify correctly
    probs = lr.predict_proba([[
        "types:PERSON:CITY", "order:SO", "dist:3",
        "between:was born in",
        "types_between:PERSON:was born in:CITY",
        "bw:was", "bw:born", "bw:in"]])
    top = lr.labels[int(probs.argmax())]
    assert top == "per:city_of_birth"
    assert probs.max() > 0.5


def test_lr_no_relation_on_noise(model_dict):
    d, _ = model_dict
    lr = LRModel.from_dict(d)
    probs = lr.predict_proba([["between:zzz qqq unseen", "order:OS"]])
    assert lr.labels[int(probs.argmax())] == NO_RELATION


def test_model_cache_roundtrip(model_dict):
    from stanford_relation_extractor_ray.pipelines.train import train_lr
    d, cache = model_dict
    d2 = train_lr(N_TRAIN, cache_dir=cache)      # loads from cache
    assert np.array_equal(d["weights"], d2["weights"])
    assert np.array_equal(d["bias"], d2["bias"])


def test_ds_labeling_and_subsampling(ray_session):
    from stanford_relation_extractor_ray.pipelines.train import \
        training_examples
    rows = training_examples(N_TRAIN).take_all()
    labels = {r["label"] for r in rows}
    assert NO_RELATION in labels          # negatives survive subsampling
    assert len(labels) > 3                # multiple positive relations
    # negatives subsampled to ~10% — there must be far fewer negatives
    # than a no-subsampling run would produce (most pairs are negative)
    n_neg = sum(1 for r in rows if r["label"] == NO_RELATION)
    assert 0 < n_neg < len(rows)


def test_bagged_ensemble_components_differ_but_agree(ray_session):
    from stanford_relation_extractor_ray.pipelines.train import \
        train_bagged
    models = train_bagged(N_TRAIN, k=2, subsample=0.6)
    assert len(models) == 2
    m0, m1 = (LRModel.from_dict(d) for d in models)
    # different subsamples → different weights
    assert not np.array_equal(m0.W, m1.W)
    # but both learn the strong pattern
    bag = [["types:PERSON:CITY", "order:SO", "dist:3",
            "between:was born in",
            "types_between:PERSON:was born in:CITY",
            "bw:was", "bw:born", "bw:in"]]
    assert m0.labels[int(m0.predict_proba(bag).argmax())] == \
        "per:city_of_birth"
    assert m1.labels[int(m1.predict_proba(bag).argmax())] == \
        "per:city_of_birth"
