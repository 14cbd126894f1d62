"""Geographic world-knowledge post-processing fixtures (mirrors the
reference's WorldKnowledgePostProcessorTest geography cases)."""

import pyarrow as pa
import pytest

from stanford_relation_extractor_ray.schemas import FILLS_SCHEMA
from stanford_relation_extractor_ray.stages import worldknowledge as wk


def _ds(rows):
    import ray.data as rd
    full = []
    for i, (s, st, p, o, ot, sc) in enumerate(rows):
        full.append({"subj": s, "subj_type": st, "pred": p, "obj": o,
                     "obj_type": ot, "score": sc, "doc_id": f"d{i}",
                     "sent_idx": 0, "subj_span": [0, 1],
                     "obj_span": [2, 3]})
    return rd.from_arrow(pa.Table.from_pylist(full, schema=FILLS_SCHEMA))


def test_normalize_origin_demonym(ray_session):
    ds = _ds([
        ("Alice Smith", "PERSON", "per:origin", "Canadian",
         "NATIONALITY", 0.8),
        ("Alice Smith", "PERSON", "per:origin", "Portugal",
         "COUNTRY", 0.7),
        ("Alice Smith", "PERSON", "per:title", "curator", "TITLE", 0.9),
    ])
    rows = {(r["pred"], r["obj"], r["obj_type"])
            for r in wk.normalize_origin(ds).take_all()}
    assert ("per:origin", "Canada", "COUNTRY") in rows
    assert ("per:origin", "Portugal", "COUNTRY") in rows
    assert ("per:title", "curator", "TITLE") in rows


def test_infer_country_from_city(ray_session):
    ds = _ds([
        ("Alice Smith", "PERSON", "per:city_of_birth", "Toronto",
         "CITY", 0.8),
        ("Acme Corp", "ORGANIZATION", "org:city_of_headquarters",
         "Osaka", "CITY", 0.6),
        # city without a known country → no inference
        ("Bob Jones", "PERSON", "per:city_of_birth", "Galway",
         "CITY", 0.9),
    ])
    inf = wk.infer_country_fills(ds).take_all()
    got = {(r["subj"], r["pred"], r["obj"]): r["score"] for r in inf}
    assert got == {
        ("Alice Smith", "per:country_of_birth", "Canada"):
            pytest.approx(0.8 * wk.INFER_DAMPING),
        ("Acme Corp", "org:country_of_headquarters", "Japan"):
            pytest.approx(0.6 * wk.INFER_DAMPING),
    }


def test_geo_consistency_drops_contradiction(ray_session):
    ds = _ds([
        # Toronto (Canada) contradicts country_of_birth = France;
        # country fill has the lower score → dropped
        ("Alice Smith", "PERSON", "per:city_of_birth", "Toronto",
         "CITY", 0.9),
        ("Alice Smith", "PERSON", "per:country_of_birth", "France",
         "COUNTRY", 0.4),
        # a consistent pair survives
        ("Bob Jones", "PERSON", "per:city_of_birth", "Marseille",
         "CITY", 0.8),
        ("Bob Jones", "PERSON", "per:country_of_birth", "France",
         "COUNTRY", 0.7),
    ])
    kept = {(r["subj"], r["pred"], r["obj"])
            for r in wk.geo_consistency(ds).take_all()}
    assert ("Alice Smith", "per:city_of_birth", "Toronto") in kept
    assert ("Alice Smith", "per:country_of_birth", "France") not in kept
    assert ("Bob Jones", "per:city_of_birth", "Marseille") in kept
    assert ("Bob Jones", "per:country_of_birth", "France") in kept
