"""Linker scalar-function micro-fixtures (FIXTURES.md §6: mirror of the
reference's AcronymMatcher / EntityLinker.GaborsHackyBaseline cases)."""

from stanford_relation_extractor_ray.functions.text import (
    approx_match_score, extract_year, is_acronym_of, levenshtein,
    normalize_tokens, same_entity)


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("a", "") == 1


def test_acronym():
    assert is_acronym_of("ADC", "Acme Dynamics Corporation")
    assert not is_acronym_of("ADC", "Acme Dynamics")
    assert not is_acronym_of("adc", "Acme Dynamics Corporation")
    assert not is_acronym_of("A", "Acme")


def test_normalize_tokens():
    assert normalize_tokens("The Acme Corp.") == ["acme"]
    assert normalize_tokens("Acme Dynamics Corporation") == \
        ["acme", "dynamics"]
    assert normalize_tokens("Robert Smith") == ["robert", "smith"]


def test_approx_match_and_same_entity():
    nick = {"bob": "robert"}
    assert approx_match_score("Robert Smith", "Robert Smith") == 1.0
    assert approx_match_score("Bob Smith", "Robert Smith", nick) == 1.0
    assert approx_match_score("ACME", "Acme Corporation") == 1.0  # acronym
    # single-token overlap of a two-token name → 0.5
    assert abs(approx_match_score("Robert Smith", "Robert Jones") - 0.5) \
        < 1e-9
    assert same_entity("Robert Smith", "Robert Jones", "PERSON")   # > .49
    assert not same_entity("Robert Smith", "Robert Jones",
                           "ORGANIZATION")                         # < .79
    # edit-distance-1 tokens (long) match
    assert same_entity("Johansson Ltd", "Johanssen Ltd", "ORGANIZATION")


def test_extract_year():
    assert extract_year("born on April 12 , 1984 .") == "1984"
    assert extract_year("no year here") is None


def test_timex_sutime_shapes():
    """SUTime-depth shapes (time/SUTimeSimpleParser.java contract)."""
    from stanford_relation_extractor_ray.functions.text import \
        timex_normalize as t
    assert t("May 3 , 1970") == "1970-05-03"
    assert t("3 May 1970") == "1970-05-03"
    assert t("May 3rd , 1970") == "1970-05-03"
    assert t("Jan. 3 , 1970") == "1970-01-03"
    assert t("Sept 4 , 1980") == "1980-09-04"
    assert t("May 1970") == "1970-05-XX"
    assert t("1970") == "1970-XX-XX"
    assert t("05/03/1970") == "1970-05-03"
    assert t("23/11/1970") == "1970-11-23"   # unambiguous DD/MM
    assert t("the 1970s") == "197X"
    assert t("Summer 1970") == "1970-SU"
    assert t("1970-05-03") == "1970-05-03"   # ISO passthrough
    assert t("1970-05-XX") == "1970-05-XX"
    assert t("yesterday") is None            # no document date


def test_timex_durations():
    """ISO-8601 durations (SUTime's duration output tail)."""
    from stanford_relation_extractor_ray.functions.text import \
        timex_normalize as t
    assert t("three weeks") == "P3W"
    assert t("a week") == "P1W"
    assert t("an hour") == "PT1H"
    assert t("45 minutes") == "PT45M"
    assert t("two years") == "P2Y"
    assert t("six months") == "P6M"
    assert t("two decades") == "P20Y"
    assert t("a century") == "P100Y"
    assert t("ten days") == "P10D"


def test_timex_holidays():
    """Holiday names: fixed-date table, computed Thanksgiving (4th
    Thursday) and Easter (Gregorian computus)."""
    from stanford_relation_extractor_ray.functions.text import \
        timex_normalize as t
    assert t("Christmas 1970") == "1970-12-25"
    assert t("Fourth of July 2001") == "2001-07-04"
    assert t("Thanksgiving 2023") == "2023-11-23"
    assert t("Thanksgiving 2024") == "2024-11-28"
    assert t("Easter 2024") == "2024-03-31"
    assert t("Easter 2016") == "2016-03-27"
    assert t("Halloween") is None            # needs year or doc date
    assert t("Halloween", doc_date="2024-01-01") == "2024-10-31"


def test_timex_relative_with_doc_date():
    """Relative expressions resolve only against an explicit document
    date (SUTimeSimpleParser drops them without one; callers that know
    the doc date pass it)."""
    from stanford_relation_extractor_ray.functions.text import \
        timex_normalize as t
    dd = "2024-03-15"                         # a Friday
    assert t("yesterday", doc_date=dd) == "2024-03-14"
    assert t("today", doc_date=dd) == "2024-03-15"
    assert t("tomorrow", doc_date=dd) == "2024-03-16"
    assert t("last Tuesday", doc_date=dd) == "2024-03-12"
    assert t("next Tuesday", doc_date=dd) == "2024-03-19"
    assert t("next Friday", doc_date=dd) == "2024-03-22"
    assert t("Friday", doc_date=dd) == "2024-03-15"   # forward, incl.
    assert t("last month", doc_date=dd) == "2024-02-XX"
    assert t("next year", doc_date=dd) == "2025-XX-XX"
    assert t("last week", doc_date=dd) == "2024-W10"
    assert t("three weeks ago", doc_date=dd) == "2024-02-23"
    # calendar month arithmetic clamps the day
    assert t("in one month", doc_date="2024-01-31") == "2024-02-29"
    assert t("two months ago", doc_date="2024-03-31") == "2024-01-31"
    # absolute shapes ignore the anchor
    assert t("May 3 , 1970", doc_date=dd) == "1970-05-03"


def test_repetition_metrics(ray_session):
    """Gopher-style repetition: top/dup bigram fractions per doc."""
    import ray.data as rd

    from stanford_relation_extractor_ray.stages.textquality import \
        add_repetition
    ds = rd.from_items([
        {"doc_id": "d1", "text": "a b a b c"},   # "a b"×2 of 4 bigrams
        {"doc_id": "d2", "text": "x y"},
        {"doc_id": "d3", "text": "solo"},        # no bigram → 0.0
    ])
    out = {r["doc_id"]: r for r in add_repetition(ds).take_all()}
    assert out["d1"]["top_bigram_frac"] == 0.5
    assert out["d1"]["dup_bigram_frac"] == 0.5
    assert out["d2"]["top_bigram_frac"] == 1.0
    assert out["d2"]["dup_bigram_frac"] == 0.0
    assert out["d3"]["top_bigram_frac"] == 0.0


def test_pii_scrub_patterns(ray_session):
    """Email/phone/IP redaction with per-pattern counts; patterns
    apply in order on the progressively redacted text."""
    import ray.data as rd

    from stanford_relation_extractor_ray.stages.scrub import scrub
    ds = rd.from_items([
        {"text": "mail jane.doe@example.org or call 555-123-4567"},
        {"text": "host 192.168.0.1 ok"},
        {"text": "clean"},
    ])
    out = scrub(ds, "text").take_all()
    by = {r["text"]: r for r in out}
    r0 = by["mail jane.doe@example.org or call 555-123-4567"]
    assert r0["text_redacted"] == "mail <EMAIL> or call <PHONE>"
    assert (r0["n_email"], r0["n_phone"], r0["n_redacted"]) == (1, 1, 2)
    r1 = by["host 192.168.0.1 ok"]
    assert r1["text_redacted"] == "host <IP> ok"
    assert by["clean"]["n_redacted"] == 0


def test_pii_scrub_summary(ray_session):
    import ray.data as rd

    from stanford_relation_extractor_ray.stages.scrub import \
        scrub_summary
    ds = rd.from_items([
        {"g": "a", "text": '{"k": 12}'},
        {"g": "a", "text": '{"k": 7}'},
        {"g": "b", "text": "none"},
    ])
    out = {r["g"]: r for r in
           scrub_summary(ds, "text", "g",
                         patterns=("number",)).take_all()}
    assert out["a"]["n_rows"] == 2
    assert out["a"]["total_redacted"] == 2
    assert out["a"]["distinct_forms"] == 1      # both → {"k": <NUM>}
    assert out["b"]["total_redacted"] == 0


def test_pii_scrub_summary_null_text(ray_session):
    """Null text rows count toward n_rows (SQL count(*)) but are
    excluded from the distinct-form census (count(DISTINCT) ignores
    nulls) and contribute 0 redactions."""
    import ray.data as rd

    from stanford_relation_extractor_ray.stages.scrub import \
        scrub_summary
    ds = rd.from_items([
        {"g": "a", "text": '{"k": 12}'},
        {"g": "a", "text": None},
        {"g": "a", "text": '{"k": 7}'},
    ])
    out = scrub_summary(ds, "text", "g",
                        patterns=("number",)).take_all()
    assert out[0]["n_rows"] == 3
    assert out[0]["total_redacted"] == 2
    assert out[0]["distinct_forms"] == 1


def test_round_col_matches_duckdb_round(ray_session):
    """__ray_entry__._round_col must reproduce DuckDB ROUND exactly:
    half away from zero, not Arrow's default half-to-even — exact
    binary ties (1/1024 at 9 digits) are reachable by ratio columns
    whose denominators are raw token counts."""
    import duckdb
    import ray.data as rd
    vals = [1.0 / 1024, -1.0 / 1024, 0.123456789499, 2.5e-9]
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_re", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ds = rd.from_items([{"v": v} for v in vals])
    got = sorted(r["v"] for r in mod._round_col(ds, "v", 9).take_all())
    want = sorted(
        duckdb.sql(f"SELECT ROUND({v!r}::DOUBLE, 9)").fetchone()[0]
        for v in vals)
    assert got == want
