"""JointBayes (MIML-RE) EM training + Y-layer inference semantics
(mirrors JointBayesRelationExtractor behavior on constructed bags)."""

import numpy as np
import pytest

from stanford_relation_extractor_ray.pipelines.jointbayes import (
    DEFAULT_THRESHOLD, JointBayesModel, YClassifier, build_training_bags,
    classify_bag, extract_y_features, train_jointbayes)
from stanford_relation_extractor_ray.stages.classify import NO_RELATION


def test_y_features_none_atleastonce_unique_cooc():
    assert extract_y_features("per:title", [NO_RELATION]) == {"none": 1.0}
    f = extract_y_features("per:title", ["per:title", NO_RELATION])
    assert f == {"atleastonce": 1.0, "unique": 1.0}
    f2 = extract_y_features("per:title", ["per:title", "per:spouse"])
    assert f2 == {"atleastonce": 1.0, "cooc:per:spouse": 1.0}


def test_y_classifier_init_favors_atleastonce():
    y = YClassifier()
    assert y.prob({"atleastonce": 1.0}) > 0.99
    assert y.prob({"none": 1.0}) == pytest.approx(0.5)


def _mk_bags():
    """Bags whose positive labels correlate with a 'born' feature and
    negatives with a 'lives' feature."""
    bags = []
    for i in range(30):
        bags.append({
            "subj": f"P{i}", "obj": f"C{i}",
            "sent_features": [["between:was born in", "bw:born"],
                              ["between:visited", "bw:visited"]],
            "pos": ["per:city_of_birth"], "neg": [], "unk": []})
        bags.append({
            "subj": f"Q{i}", "obj": f"D{i}",
            "sent_features": [["between:visited", "bw:visited"]],
            "pos": [], "neg": ["per:city_of_birth"], "unk": []})
    return bags


@pytest.fixture(scope="module")
def model():
    return train_jointbayes(_mk_bags(), epochs=3)


def test_em_learns_z_signal(model):
    out = classify_bag(model, [["between:was born in", "bw:born"]],
                       mode="NOISY_OR")
    assert "per:city_of_birth" in out
    assert out["per:city_of_birth"] > DEFAULT_THRESHOLD
    out2 = classify_bag(model, [["between:visited", "bw:visited"]],
                        mode="NOISY_OR")
    assert "per:city_of_birth" not in out2


def test_output_modes_differ(model):
    feats = [["between:was born in", "bw:born"]] * 3
    noisy = classify_bag(model, feats, mode="NOISY_OR")
    ygz = classify_bag(model, feats, mode="Y_GIVEN_ZSTAR")
    ytn = classify_bag(model, feats, mode="Y_THEN_NOISY_OR")
    # Y_GIVEN_ZSTAR is a normalized distribution over all relations
    assert sum(ygz.values()) == pytest.approx(1.0)
    assert len(ygz) > len(noisy)
    # Y_THEN_NOISY_OR gates on the Y prob, then multiplies in the
    # z noisy-or: same keys as NOISY_OR here, same scores
    assert set(ytn) == {"per:city_of_birth"}
    assert ytn["per:city_of_birth"] == pytest.approx(
        noisy["per:city_of_birth"])
    # noisy-or grows with more supporting sentences
    single = classify_bag(model, feats[:1], mode="NOISY_OR")
    assert noisy["per:city_of_birth"] > single["per:city_of_birth"]


def test_per_relation_thresholds(model):
    strict = JointBayesModel(model.z_single, model.y, model.labels,
                             thresholds={"per:city_of_birth": 0.999})
    out = classify_bag(strict, [["between:was born in", "bw:born"]],
                       mode="NOISY_OR")
    assert "per:city_of_birth" not in out
    assert strict.threshold("per:spouse") == DEFAULT_THRESHOLD


def test_z_single_is_candidate_scorer_drop_in(model):
    """The single Z classifier is a plain LRModel dict usable by the
    pipeline's scorer actors."""
    from stanford_relation_extractor_ray.stages.classify import LRModel
    lr = LRModel.from_dict(model.z_single)
    p = lr.predict_proba([["between:was born in", "bw:born"]])
    assert p.shape[1] == len(model.labels)
    assert model.labels[p.argmax(axis=1)[0]] == "per:city_of_birth"


def test_only_local_skips_em():
    bags = _mk_bags()
    local = train_jointbayes(bags, only_local=True, epochs=3)
    # local init labels every sentence of a positive bag with the bag
    # label, so the 'visited' sentence pollutes the Z signal; full EM
    # flips it to NO_RELATION. The local model must still classify the
    # born-sentence bag correctly.
    out = classify_bag(local, [["between:was born in", "bw:born"]],
                       mode="NOISY_OR")
    assert "per:city_of_birth" in out


def test_em_flips_ambiguous_sentence_labels(model):
    """EM's E-step relabels the non-evidence sentence ('visited') away
    from the bag label: the z classifier should assign it NO_RELATION."""
    from stanford_relation_extractor_ray.stages.classify import LRModel
    lr = LRModel.from_dict(model.z_single)
    p = lr.predict_proba([["between:visited", "bw:visited"]])
    assert model.labels[p.argmax(axis=1)[0]] == NO_RELATION


def test_min_et_al_relabeling_promotes_unknowns():
    bags = _mk_bags()
    # an unk-labeled bag that looks exactly like the positives
    bags.append({"subj": "X", "obj": "Y",
                 "sent_features": [["between:was born in", "bw:born"]],
                 "pos": [], "neg": [],
                 "unk": ["per:city_of_birth"]})
    train_jointbayes(bags, epochs=3, guess_unlabeled=True)
    assert "per:city_of_birth" in bags[-1]["pos"]


def test_build_training_bags_labels(ray_session):
    bags = build_training_bags(80)
    assert bags
    assert all(set(b) >= {"sent_features", "pos", "neg", "unk"}
               for b in bags)
    labeled = [b for b in bags if b["pos"]]
    assert labeled, "distant supervision produced no positive bags"
    # determinism
    again = build_training_bags(80)
    assert [b["subj"] for b in bags] == [b["subj"] for b in again]
