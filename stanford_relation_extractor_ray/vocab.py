"""Closed vocabularies: NER tags, the 42 KBP relations, and the
connector-phrase pattern library.

Parity notes (behavior only, no code copied):
- NER tag set mirrors the reference's ``kbp/common/NERTag.java:8-28``.
- Relation inventory + (entity type, cardinality, valid slot NER types)
  mirrors ``kbp/common/RelationType.java:24-67``.
- The connector-phrase table plays the role of the reference's
  TokensRegex rule files (``kbp/slotfilling/classify/TokensRegexExtractor.java``)
  and doubles as the synthetic corpus template library (FIXTURES.md §1):
  the corpus generator and the extractors share one vocabulary so triple
  parity is testable without GB-scale models (SURVEY.md §7.0).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --------------------------------------------------------------------------
# NER tags (reference: kbp/common/NERTag.java)
# --------------------------------------------------------------------------

NER_TAGS = [
    "PERSON",
    "ORGANIZATION",
    "COUNTRY",
    "CITY",
    "STATE_OR_PROVINCE",
    "NATIONALITY",
    "DATE",
    "NUMBER",
    "TITLE",
    "RELIGION",
    "IDEOLOGY",
    "CAUSE_OF_DEATH",
    "CRIMINAL_CHARGE",
    "URL",
    "DURATION",
    "MISC",
    "LOCATION",
    "MODIFIER",
]

SINGLE = "SINGLE"
LIST = "LIST"


@dataclass(frozen=True)
class RelationSpec:
    """One KBP relation (reference: RelationType.java enum entries)."""

    name: str
    entity_type: str            # PERSON or ORGANIZATION (subject type)
    cardinality: str            # SINGLE or LIST
    slot_types: tuple           # valid obj NER tags
    prior: float = 0.05
    # connector phrases: token strings that appear between subj and obj
    # mentions; shared by the corpus generator and the pattern extractor.
    phrases: tuple = field(default_factory=tuple)


_R = RelationSpec

RELATIONS: dict[str, RelationSpec] = {
    r.name: r
    for r in [
        # ---- per:* ----------------------------------------------------
        _R("per:alternate_names", "PERSON", LIST, ("PERSON",), 0.03,
           (", also known as", ", who goes by the name")),
        _R("per:date_of_birth", "PERSON", SINGLE, ("DATE",), 0.02,
           ("was born on",)),
        _R("per:age", "PERSON", SINGLE, ("NUMBER",), 0.03,
           ("is now aged", "celebrated turning")),
        _R("per:country_of_birth", "PERSON", SINGLE, ("COUNTRY",), 0.02,
           ("was born in",)),
        _R("per:stateorprovince_of_birth", "PERSON", SINGLE,
           ("STATE_OR_PROVINCE",), 0.02, ("was born in",)),
        _R("per:city_of_birth", "PERSON", SINGLE, ("CITY",), 0.02,
           ("was born in",)),
        _R("per:origin", "PERSON", LIST, ("NATIONALITY", "COUNTRY"), 0.02,
           ("is a citizen of", "holds citizenship of")),
        _R("per:date_of_death", "PERSON", SINGLE, ("DATE",), 0.02,
           ("died on", "passed away on")),
        _R("per:country_of_death", "PERSON", SINGLE, ("COUNTRY",), 0.01,
           ("died in", "passed away in")),
        _R("per:stateorprovince_of_death", "PERSON", SINGLE,
           ("STATE_OR_PROVINCE",), 0.01, ("died in", "passed away in")),
        _R("per:city_of_death", "PERSON", SINGLE, ("CITY",), 0.01,
           ("died in", "passed away in")),
        _R("per:cause_of_death", "PERSON", SINGLE, ("CAUSE_OF_DEATH",), 0.01,
           ("died of", "succumbed to")),
        _R("per:countries_of_residence", "PERSON", LIST, ("COUNTRY",), 0.02,
           ("lives in", "resides in")),
        _R("per:statesorprovinces_of_residence", "PERSON", LIST,
           ("STATE_OR_PROVINCE",), 0.02, ("lives in", "resides in")),
        _R("per:cities_of_residence", "PERSON", LIST, ("CITY",), 0.02,
           ("lives in", "resides in")),
        _R("per:schools_attended", "PERSON", LIST, ("ORGANIZATION",), 0.02,
           ("studied at", "graduated from")),
        _R("per:title", "PERSON", LIST, ("TITLE",), 0.08,
           ("serves as a", "works as a")),
        _R("per:employee_of", "PERSON", LIST, ("ORGANIZATION",), 0.08,
           ("works for", "is employed by")),
        _R("per:member_of", "PERSON", LIST, ("ORGANIZATION",), 0.03,
           ("is a member of",)),
        _R("per:religion", "PERSON", SINGLE, ("RELIGION",), 0.01,
           ("practices", "adheres to")),
        _R("per:spouse", "PERSON", LIST, ("PERSON",), 0.03,
           ("is married to", "wed")),
        _R("per:children", "PERSON", LIST, ("PERSON",), 0.02,
           ("has a child named", "is the proud parent of")),
        _R("per:parents", "PERSON", LIST, ("PERSON",), 0.02,
           ("is the child of", "was raised by")),
        _R("per:siblings", "PERSON", LIST, ("PERSON",), 0.02,
           ("is a sibling of", "grew up alongside a sibling ,")),
        _R("per:other_family", "PERSON", LIST, ("PERSON",), 0.01,
           ("is a cousin of", "is related by family to")),
        _R("per:charges", "PERSON", LIST, ("CRIMINAL_CHARGE",), 0.01,
           ("was charged with", "stands accused of")),
        # ---- org:* ----------------------------------------------------
        _R("org:alternate_names", "ORGANIZATION", LIST, ("ORGANIZATION",),
           0.03, (", also known as", ", trading as")),
        _R("org:political/religious_affiliation", "ORGANIZATION", LIST,
           ("RELIGION", "IDEOLOGY"), 0.01,
           ("is affiliated with", "is aligned with")),
        _R("org:top_members/employees", "ORGANIZATION", LIST, ("PERSON",),
           0.05, ("is led by", "is chaired by")),
        _R("org:number_of_employees/members", "ORGANIZATION", SINGLE,
           ("NUMBER",), 0.02, ("employs a workforce of",)),
        _R("org:members", "ORGANIZATION", LIST, ("ORGANIZATION",), 0.01,
           ("counts among its members",)),
        _R("org:member_of", "ORGANIZATION", LIST, ("ORGANIZATION",), 0.01,
           ("is a member of",)),
        _R("org:subsidiaries", "ORGANIZATION", LIST, ("ORGANIZATION",), 0.02,
           ("owns the subsidiary", "operates its unit")),
        _R("org:parents", "ORGANIZATION", LIST, ("ORGANIZATION",), 0.02,
           ("is a subsidiary of", "is a division of")),
        _R("org:founded_by", "ORGANIZATION", LIST, ("PERSON",), 0.02,
           ("was founded by", "was established by")),
        _R("org:founded", "ORGANIZATION", SINGLE, ("DATE",), 0.02,
           ("was founded on", "was established on")),
        _R("org:dissolved", "ORGANIZATION", SINGLE, ("DATE",), 0.01,
           ("was dissolved on", "shut down on")),
        _R("org:country_of_headquarters", "ORGANIZATION", SINGLE,
           ("COUNTRY",), 0.02, ("is headquartered in", "is based in")),
        _R("org:stateorprovince_of_headquarters", "ORGANIZATION", SINGLE,
           ("STATE_OR_PROVINCE",), 0.02,
           ("is headquartered in", "is based in")),
        _R("org:city_of_headquarters", "ORGANIZATION", SINGLE, ("CITY",),
           0.02, ("is headquartered in", "is based in")),
        _R("org:shareholders", "ORGANIZATION", LIST,
           ("PERSON", "ORGANIZATION"), 0.01,
           ("is partly owned by", "counts as a shareholder")),
        _R("org:website", "ORGANIZATION", SINGLE, ("URL",), 0.01,
           ("maintains the website", "publishes at")),
    ]
}

assert len(RELATIONS) == 42, len(RELATIONS)

RELATION_NAMES = sorted(RELATIONS)

# relations whose SINGLE cardinality forces top-1 per (entity, relation)
# (reference: DuplicateRelationOnlyInListRelations,
#  HeuristicSlotfillPostProcessors.java:742-754)
SINGLE_RELATIONS = frozenset(n for n, r in RELATIONS.items()
                             if r.cardinality == SINGLE)

# pairs of relations that may NOT cooccur for one (entity, slot value)
# (reference: RelationType.plausiblyCooccursWith / declared
#  incompatibilities, GraphConsistencyPostProcessors + RelationType.java:320-345).
# Any two *_of_birth vs *_of_death with the same value are implausible,
# as are birth places at two distinct levels mismatching residence.
INCOMPATIBLE_RELATIONS = frozenset(
    frozenset(p)
    for p in [
        ("per:city_of_birth", "per:city_of_death"),
        ("per:country_of_birth", "per:country_of_death"),
        ("per:stateorprovince_of_birth", "per:stateorprovince_of_death"),
        ("per:date_of_birth", "per:date_of_death"),
        ("org:founded", "org:dissolved"),
        ("org:parents", "org:subsidiaries"),
        ("per:spouse", "per:siblings"),
        ("per:spouse", "per:parents"),
        ("per:spouse", "per:children"),
        ("per:parents", "per:children"),
    ]
)

# relations that may share one (entity, slot) pair simultaneously
# (reference: plausibleOverlappingRelations, RelationType.java:320-345)
PLAUSIBLE_OVERLAPS = frozenset(
    frozenset(p)
    for p in [
        ("per:city_of_birth", "per:cities_of_residence"),
        ("per:country_of_birth", "per:countries_of_residence"),
        ("per:stateorprovince_of_birth",
         "per:statesorprovinces_of_residence"),
        ("per:employee_of", "per:member_of"),
        ("per:employee_of", "per:schools_attended"),
        ("org:member_of", "org:parents"),
    ]
)


def phrase_index() -> dict[tuple[str, str], list[tuple[str, float]]]:
    """Map (connector phrase, subj entity type) → [(relation, prior)].

    Several phrases are ambiguous ("was born in" → city/country/state of
    birth; "is a member of" → per:/org:member_of): disambiguation happens
    at extraction time via the obj mention's NER tag, mirroring the
    reference's slotTypeToRelations side table (RelationType.java:356-364).
    """
    idx: dict[tuple[str, str], list[tuple[str, float]]] = {}
    for rel in RELATIONS.values():
        for ph in rel.phrases:
            idx.setdefault((ph, rel.entity_type), []).append(
                (rel.name, rel.prior))
    return idx


def resolve_relation(phrase: str, subj_type: str, obj_type: str,
                     _idx=phrase_index()) -> str | None:
    """Resolve a matched connector phrase to a relation name, or None."""
    for name, _ in _idx.get((phrase, subj_type), ()):
        if obj_type in RELATIONS[name].slot_types:
            return name
    return None
