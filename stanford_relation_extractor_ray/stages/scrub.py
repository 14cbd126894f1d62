"""PII scrubbing / pattern redaction over a text column.

A training-data pipeline redacts personal identifiers (emails, phone
numbers, IP addresses) before a corpus ships; the same machinery
serves generic pattern normalization (digit runs → ``<NUM>``). The
operator is a single vectorized ``map_batches`` stage — every kernel
is a pyarrow.compute RE2 call on the Arrow column (zero-copy from the
object store, no per-row Python), so it streams at full width on a
100-TB corpus with no shuffle.

No reference counterpart (the KBP system never redacts); this module
belongs to the LLM-data-pipeline operator family alongside
``textquality`` / ``dedup``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: named RE2 patterns → replacement tokens. Order matters: emails are
#: redacted before digit runs so a later pattern never eats part of an
#: earlier pattern's match.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "phone": (r"(\+?[0-9]{1,2}[ .-]?)?\(?[0-9]{3}\)?[ .-]?[0-9]{3}"
              r"[ .-]?[0-9]{4}", "<PHONE>"),
    "ipv4": (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    "number": (r"[0-9]+", "<NUM>"),
}


def scrub(ds, text_col: str,
          patterns: tuple[str, ...] = ("email", "phone", "ipv4"),
          out_col: str | None = None, counts: bool = True):
    """Redact the named ``PII_PATTERNS`` in ``text_col``.

    Appends ``out_col`` (default ``<text_col>_redacted``) with every
    pattern replaced by its token, and — when ``counts`` — one
    ``n_<name>`` int64 column per pattern plus ``n_redacted`` (their
    sum). Patterns apply in the order given on the progressively
    redacted text, so overlapping matches resolve deterministically.
    """
    out_name = out_col or f"{text_col}_redacted"
    specs = [(name,) + PII_PATTERNS[name] for name in patterns]

    def redact(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        total = None
        per: list[tuple[str, pa.Array]] = []
        for name, pat, tok in specs:
            if counts:
                n = pc.count_substring_regex(col, pat)
                n = pc.fill_null(n.cast(pa.int64()), 0)
                per.append((name, n))
                total = n if total is None else pc.add(total, n)
            col = pc.replace_substring_regex(col, pat, tok)
        out = batch.append_column(out_name, col)
        if counts:
            for name, n in per:
                out = out.append_column(f"n_{name}", n)
            out = out.append_column("n_redacted", total)
        return out

    return ds.map_batches(redact, batch_format="pyarrow",
                          batch_size=4096)


def scrub_summary(ds, text_col: str, group_col: str,
                  patterns: tuple[str, ...] = ("number",)):
    """Per-group redaction audit: row count, total matches redacted,
    and distinct post-redaction forms (a cheap template census — most
    corpora collapse to a handful of shapes once identifiers are
    masked).

    Scale shape: the redaction streams (see ``scrub``); the audit
    pre-combines on (group, redacted-form) INSIDE each batch, so only
    tiny partial-count rows reach the single small ``groupby`` — the
    same map-side-combine discipline as the dedup/diversity family.
    """
    red = scrub(ds, text_col, patterns=patterns)
    form = f"{text_col}_redacted"

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, form, "n_redacted"]).to_pandas()
        # dropna=False: null text rows still count toward n_rows
        # (SQL count(*) semantics); their null form is excluded from
        # the distinct-form census in final (count(DISTINCT ...)
        # ignores nulls), and their n_redacted is 0 (scrub fills it)
        g = (df.groupby([group_col, form], sort=False, dropna=False)
             ["n_redacted"].agg(n_rows="count", n_red="sum")
             .reset_index())
        # replace_schema_metadata: from_pandas' metadata dict makes
        # the schema unhashable → slow-path block unify + warnings
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def final(df) -> "object":
        import pandas as pd
        g = (df.groupby(form, sort=True, dropna=False)
             [["n_rows", "n_red"]].sum().reset_index())
        return pd.DataFrame({
            group_col: [df[group_col].iloc[0]],
            "n_rows": [int(g["n_rows"].sum())],
            "total_redacted": [int(g["n_red"].sum())],
            "distinct_forms": [int(g[form].notna().sum())]})

    return (red.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(final, batch_format="pandas"))
