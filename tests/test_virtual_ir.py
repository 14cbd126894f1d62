"""Virtual-IR entry: candidate_sentences TSV → pseudo-documents →
slot fills (SimpleSlotFiller.java:110-157,360-429 semantics)."""

import pytest

from stanford_relation_extractor_ray.corpus import documents_dataset


@pytest.fixture(scope="module")
def tsv_path(ray_session, tmp_path_factory):
    """Build a candidate-sentences TSV from real corpus sentences."""
    from stanford_relation_extractor_ray.stages import nlp
    sents = nlp.annotate(documents_dataset(40)).take_all()
    path = tmp_path_factory.mktemp("vir") / "candidate_sentences.txt"
    n = 0
    with open(path, "w") as f:
        for s in sents:
            ents = [m for m in s["mentions"]
                    if m["ner"] in ("PERSON", "ORGANIZATION")
                    and not m["antecedent"]]
            if not ents:
                continue
            m = ents[0]
            prov = (f"{s['doc_id']}:{s['sent_idx']}:"
                    f"{m['begin']}-{m['end']}:{m['begin']}-{m['end']}")
            f.write(f"E{hash(m['surface']) % 97}\tunknown\t1.0\t"
                    f"{prov}\t{s['text']}\n")
            n += 1
    assert n > 20
    return str(path)


def test_virtual_ir_documents_shape(ray_session, tsv_path):
    from stanford_relation_extractor_ray.pipelines.virtual_ir import \
        virtual_ir_documents
    from stanford_relation_extractor_ray.sources import \
        read_candidate_sentences
    docs = virtual_ir_documents(
        read_candidate_sentences(tsv_path)).take_all()
    assert docs
    for d in docs:
        assert d["doc_id"]
        assert all(sp["kind"] == "text" for sp in d["spans"])
        # spans ordered by original sentence index
        offs = [sp["offset"] for sp in d["spans"]]
        assert offs == sorted(offs)


def test_sentence_cap_per_entity(ray_session, tmp_path):
    from stanford_relation_extractor_ray.pipelines.virtual_ir import \
        virtual_ir_documents
    from stanford_relation_extractor_ray.sources import \
        read_candidate_sentences
    path = tmp_path / "cands.txt"
    with open(path, "w") as f:
        for i in range(30):
            f.write(f"E1\trel\t1.0\td{i:03d}:0:0-1:0-1\t"
                    f"sentence number {i} here\n")
        # duplicate sentence strings collapse before the cap
        f.write("E1\trel\t1.0\td900:0:0-1:0-1\t"
                "sentence number 0 here\n")
    docs = virtual_ir_documents(read_candidate_sentences(str(path)),
                                sent_limit=10).take_all()
    n_sentences = sum(len(d["spans"]) for d in docs)
    assert n_sentences == 10


def test_fill_from_candidate_sentences(ray_session, tsv_path):
    from stanford_relation_extractor_ray.pipelines.kg import (
        extract_fills, finalize_fills)
    from stanford_relation_extractor_ray.pipelines.virtual_ir import \
        fill_from_candidate_sentences
    fills = fill_from_candidate_sentences(tsv_path).take_all()
    assert fills
    # fills from the virtual IR are a subset of the full-corpus fills
    # (same sentences, same extractor, possibly fewer sentences)
    full = {(r["subj"], r["pred"], r["obj"])
            for r in finalize_fills(
                extract_fills(documents_dataset(40))).take_all()}
    got = {(r["subj"], r["pred"], r["obj"]) for r in fills}
    assert got and got <= full
