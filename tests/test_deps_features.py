"""Dependency parse + feature template fixtures (FIXTURES.md;
mirrors the per-template assertion shape of the reference's
FeatureProvidersTest.java over constructed sentences)."""

import pyarrow as pa

from stanford_relation_extractor_ray.schemas import CANDIDATES_SCHEMA
from stanford_relation_extractor_ray.stages.deps import (
    dep_features, parse, path_string, pos_tag, shortest_path)
from stanford_relation_extractor_ray.stages.featurize import (
    context_features, featurize_batch)


def _edges(sent):
    toks = sent.split(" ")
    pos = pos_tag(toks)
    return toks, pos, parse(toks, pos)


def test_pos_tagger_rules():
    toks = "Robert Smith was born in Toronto on May 3 , 1970".split(" ")
    assert pos_tag(toks) == [
        "NNP", "NNP", "VBD", "VBN", "IN", "NNP", "IN", "NNP", "CD",
        ",", "CD"]


def test_parse_passive_prep():
    toks, pos, edges = _edges("Robert Smith was born in Toronto")
    rel = {(h, d): l for h, d, l in edges}
    assert rel[(3, 1)] == "nsubj"          # Smith <- born
    assert rel[(3, 2)] == "aux"            # was <- born
    assert rel[(3, 5)] == "prep_in"        # Toronto <- born (collapsed)


def test_parse_is_deterministic():
    toks, pos, e1 = _edges("Jane Doe works for Acme Corp")
    _, _, e2 = _edges("Jane Doe works for Acme Corp")
    assert e1 == e2


def test_dep_path_lowlevel_format():
    toks, pos, edges = _edges("Robert Smith was born in Toronto")
    nodes, parts = shortest_path(edges, len(toks), 1, 5)
    assert parts == ["nsubj->", "<-prep_in"]
    assert path_string(parts) == "_nsubj->__<-prep_in_"


def test_dep_features_templates():
    toks, pos, edges = _edges("Robert Smith was born in Toronto")
    feats = dep_features(toks, pos, edges, (0, 2), (5, 6))
    assert "dep_path_lowlevel:_nsubj->__<-prep_in_" in feats
    # path word "born" lemma'd, args excluded
    assert "word_in_dependency_path:born" in feats
    assert not any(f == "word_in_dependency_path:smith" for f in feats)
    # constituency stand-in path over POS tags
    assert "full_tree_path:NNP_->_VBN_<-_NNP" in feats


def test_dep_path_conjunction():
    toks, pos, edges = _edges(
        "Jane Doe works for Acme Corp and resides in Canada")
    feats = dep_features(toks, pos, edges, (0, 2), (9, 10))
    # path subj -> works -conj_and-> resides -prep_in-> Canada
    assert "dep_path_lowlevel:_nsubj->__<-conj_and__<-prep_in_" in feats
    assert "word_in_dependency_path:reside" in feats


def test_context_features_entities_and_adjacency():
    toks, pos, edges = _edges(
        "Robert Smith works for Acme Corp in Toronto")
    ments = [(0, 2, "PERSON"), (4, 6, "ORGANIZATION"), (7, 8, "CITY")]
    feats = context_features(toks, pos, edges, ments, (0, 2), (7, 8))
    assert "rightarg0-works" in feats          # adjacent_words
    assert "leftarg1-in" in feats
    # ORG head (idx 5) strictly between PERSON head (1) and CITY head (7)
    assert "entity_between_args:_ORGANIZATION" in feats
    assert "entity_counts_PERSON:_1" in feats  # entity_counts_binary
    assert "entity_counts_bin1" in feats       # entity_counts_bins


def _cand_row(**over):
    row = {"subj": "Robert Smith", "subj_type": "PERSON",
           "obj": "Toronto", "obj_type": "CITY", "doc_id": "d0",
           "sent_idx": 0, "subj_begin": 0, "subj_end": 2,
           "obj_begin": 5, "obj_end": 6, "between": "was born in",
           "ctx_features": ["dep_path_lowlevel:_nsubj->__<-prep_in_"]}
    row.update(over)
    return row


def test_featurize_active_template_set():
    t = pa.Table.from_pylist([_cand_row()], schema=CANDIDATES_SCHEMA)
    feats = featurize_batch(t).column("features").to_pylist()[0]
    assert "arg1type=PERSON_and_arg2type=CITY" in feats
    assert "arg1BeforeArg2" in feats
    assert "surface_distance_4" in feats       # heads 1 and 5
    assert "surface_distance_bin_lt6" in feats
    assert "word_arg1:_Toronto" in feats
    assert "span_word:born" in feats
    # ctx features carried through
    assert "dep_path_lowlevel:_nsubj->__<-prep_in_" in feats
    # legacy pattern-component features retained
    assert "order:SO" in feats and "between:was born in" in feats


def test_feature_provider_registry():
    """Feature-enum extension surface (Feature.java:10-29): register a
    provider, select template sets per call."""
    from stanford_relation_extractor_ray.stages.featurize import (
        ACTIVE_FEATURES, FEATURE_PROVIDERS, register_feature)
    t = pa.Table.from_pylist([_cand_row()], schema=CANDIDATES_SCHEMA)
    try:
        register_feature("shout", lambda f: [f"shout:{f.obj_type}"])
        feats = featurize_batch(
            t, features=("arg_type", "shout")).column(
            "features").to_pylist()[0]
        assert feats[:2] == ["arg1type=PERSON_and_arg2type=CITY",
                             "shout:CITY"]
    finally:
        FEATURE_PROVIDERS.pop("shout", None)
    # bigram provider available though not in the active set
    assert "span_words_bigrams" in FEATURE_PROVIDERS
    assert "span_words_bigrams" not in ACTIVE_FEATURES
    bi = featurize_batch(t, features=("span_words_bigrams",)) \
        .column("features").to_pylist()[0]
    assert "span_bigram:was-born" in bi


def test_sentences_table_carries_dep_edges(ray_session):
    """SENTENCES_SCHEMA contract (SURVEY.md §1.1): pos + dep_edges."""
    from stanford_relation_extractor_ray.corpus import documents_dataset
    from stanford_relation_extractor_ray.stages import nlp
    sents = nlp.annotate(documents_dataset(20)).take_all()
    assert all("pos" in s and "dep_edges" in s for s in sents)
    with_e = [s for s in sents if s["dep_edges"]]
    assert with_e, "no sentence produced dependency edges"
    s = with_e[0]
    assert len(s["pos"]) == s["n_tokens"]
    for e in s["dep_edges"]:
        assert 0 <= e["dep"] < s["n_tokens"]
        assert 0 <= e["head"] < s["n_tokens"]
        assert e["label"]


def test_full_dep_template_library():
    """All 19 dep-path template families emit (FeatureFactory
    addDependencyPathFeatures parity, minus word-cluster files)."""
    from stanford_relation_extractor_ray.stages.deps import (
        ALL_DEP_TEMPLATES, dep_template_features, generalize)
    toks, pos, edges = _edges(
        "Jane Doe works for Acme Corp and resides in Canada")
    feats = dep_template_features(toks, pos, edges, (0, 2), (9, 10))
    # generalized vs lowlevel paths
    assert "dep_path:_subj->__<-conj__<-prep_" in feats
    assert "dep_path_lowlevel:_nsubj->__<-conj_and__<-prep_in_" in feats
    assert "dependency_path_length_3" in feats
    assert "word_in_dependency_path:work" in feats
    assert "POS_in_dependency_path:_VBZ" in feats
    # n-grams over path lemmas and POS
    assert any(f.startswith("dependency_path_2-gram:_") for f in feats)
    assert any(f.startswith("dependency_path_POS_3-gram:_")
               for f in feats)
    # edge n-grams generalized + lowlevel
    assert "dep_edge_2-gram:_subj_--_conj" in feats
    assert "dep_edge_lowlevel_2-gram:_nsubj_--_conj_and" in feats
    # node/edge gram shapes
    assert any(f.startswith("nen:_") for f in feats)
    assert any(f.startswith("ene:_") for f in feats)
    assert any(f.startswith("directed_bigram:_") for f in feats)
    assert "dep_edge_unigram:_nsubj_->_left" in feats
    # verb-anchored families ("works" and "resides" are interior verbs)
    assert any(f.startswith("verb:_") for f in feats)
    assert any(f.startswith("stub:_") for f in feats)
    # every family name is selectable
    for t in ALL_DEP_TEMPLATES:
        assert isinstance(
            dep_template_features(toks, pos, edges, (0, 2), (9, 10),
                                  templates=(t,)), list)
    assert generalize("prep_in") == "prep"
    assert generalize("conj_and") == "conj"
    assert generalize("nsubj") == "subj"
    assert generalize("dobj") == "obj"


def test_active_subset_pinned():
    """dep_features emits the round-3 active set (the properties-file
    three + the word-cluster family; no clustered path word in this
    sentence), pinned byte-for-byte — feature-set changes must bump
    FEATURE_VERSION in pipelines/train.py and update this pin."""
    toks, pos, edges = _edges("Robert Smith was born in Toronto")
    feats = dep_features(toks, pos, edges, (0, 2), (5, 6))
    assert feats == [
        "dep_path_lowlevel:_nsubj->__<-prep_in_",
        "word_in_dependency_path:born",
        "full_tree_path:NNP_->_VBN_<-_NNP"]


def test_dependency_path_clusters_template():
    """Word-cluster family (FeatureFactory.java:844-852) over the
    deterministic Brown-cluster stand-in: path words found in the
    cluster map emit cluster_in_dependency_path features."""
    from stanford_relation_extractor_ray.stages.deps import \
        dep_template_features
    from stanford_relation_extractor_ray.world import get_world
    clusters = get_world().word_clusters()
    # "treasurer" is a TITLE token → clustered
    toks, pos, edges = _edges("Robert Smith the treasurer of Toronto")
    feats = dep_template_features(
        toks, pos, edges, (0, 2), (5, 6),
        templates=("dependency_path_clusters",))
    want = "cluster_in_dependency_path:" + clusters["treasurer"]
    assert any(f == want for f in feats), feats


def test_featurize_cluster_providers():
    import pyarrow as pa
    from stanford_relation_extractor_ray.schemas import \
        CANDIDATES_SCHEMA
    from stanford_relation_extractor_ray.stages.featurize import \
        featurize_batch
    from stanford_relation_extractor_ray.world import get_world
    clusters = get_world().word_clusters()
    batch = pa.Table.from_pylist([{
        "subj": "Robert Smith", "subj_type": "PERSON",
        "obj": "treasurer", "obj_type": "TITLE",
        "doc_id": "d0", "sent_idx": 0,
        "subj_begin": 0, "subj_end": 2, "obj_begin": 5, "obj_end": 6,
        "between": "serves as", "ctx_features": []}],
        schema=CANDIDATES_SCHEMA)
    feats = featurize_batch(batch).to_pylist()[0]["features"]
    assert f"cluster_arg0:_{clusters['Smith']}" in feats
    assert f"cluster_arg1:_{clusters['treasurer']}" in feats
    assert (f"cluster_args:_{clusters['Smith']}__"
            f"{clusters['treasurer']}") in feats


def test_trigger_feature_families():
    """Trigger-phrase families (FeatureFactory.java:512-518,972-983
    over PreFeaturizerAnnotator.markTriggerWords :418-437): relation
    labels of trigger phrases, available providers outside the active
    set — matching the shipped relationFeatures config."""
    from stanford_relation_extractor_ray.stages.deps import \
        dep_template_features
    from stanford_relation_extractor_ray.stages.featurize import (
        ACTIVE_FEATURES, FEATURE_PROVIDERS)
    from stanford_relation_extractor_ray.stages.triggers import \
        trigger_marks
    # BIO marking, case-insensitive, matched span skipped past
    marks = trigger_marks("Jane Doe WORKS FOR Acme Corp".split())
    assert marks[2] == "B-per:employee_of"
    assert marks[3] == "I-per:employee_of"
    assert marks[0] is None and marks[4] is None
    # span provider: B- marks inside the between-args span only
    assert "span_words_trigger" in FEATURE_PROVIDERS
    assert "span_words_trigger" not in ACTIVE_FEATURES
    t = pa.Table.from_pylist([_cand_row()], schema=CANDIDATES_SCHEMA)
    feats = featurize_batch(
        t, features=("span_words_trigger",)).column(
        "features").to_pylist()[0]
    # "was born in" is the shared phrase of three *_of_birth relations;
    # the deterministic tie order keeps the last-sorted label
    trig = [f for f in feats if f.startswith("span_words_trigger=")]
    assert trig == ["span_words_trigger=per:stateorprovince_of_birth"]
    # dep-path provider: B- mark must land ON a non-arg path node
    toks, pos, edges = _edges("Jane Doe works for Acme Corp")
    feats = dep_template_features(
        toks, pos, edges, (0, 2), (4, 6),
        templates=("dependency_path_trigger",))
    assert feats == ["dependency_path_trigger=per:employee_of"]
