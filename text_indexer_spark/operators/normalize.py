"""Text normalization — the canonicalization stage every dedup/quality
tier assumes has already happened (C4/CCNet run exactly this before
anything else): strip control characters, canonicalize whitespace,
optionally apply a Unicode normal form so visually-identical strings
(ligatures, full-width forms, combining vs precomposed accents) hash
identically for the exact-dedup and line-dedup tiers.

No reference analogue (the reference tokenizes raw content,
library/.../DocumentTokenizer.kt, and its delimiter class absorbs most
of this); here normalization is a first-class operator because the
HASH-based tiers (exact dedup, line dedup, span dedup, decontam) are
byte-sensitive: "ﬁle" and "file" are different md5s until NFKC says
otherwise.

Two tiers, chosen by what each transform needs:

* **Whitespace/control tier — pure codegen.**  A chain of
  ``regexp_replace`` expressions (JVM, scan-fused, zero shuffle):
  strip C0/C1 control chars (keeping ``\\t``/``\\n``), collapse
  horizontal-whitespace runs to one space, trim around newlines,
  collapse 3+ blank lines to one blank line, trim the ends.  Line
  STRUCTURE is deliberately preserved — ``linededup`` operates at line
  grain, so collapsing newlines away would destroy its unit of
  identity.
* **Unicode-form tier (``form="NFC"|"NFKC"``) — Arrow-batched
  ``mapInPandas``.**  Spark has no normal-form expression, so this is
  honest Python in the data path — the same trade the BMP/WAV codecs
  make (``multimodal.py``): per-partition batches over Arrow, zero
  shuffle, no driver involvement; ``unicodedata.normalize`` is a C
  call per string.  Skipped entirely (no Python stage in the plan)
  when ``form=None``.

Both tiers are row-local: deterministic at any parallelism, no
exchange anywhere (plan-asserted).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C0 controls except tab/newline, plus DEL and C1 controls — the
#: bytes that are never legitimate text content.  Carriage returns are
#: handled separately (CRLF → LF) before this class strips bare CR.
_CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]"


def normalize_whitespace_column(col: Column) -> Column:
    """The codegen whitespace/control canonicalization (see module
    docstring); NULL passes through as NULL."""
    out = F.regexp_replace(col, "\\r\\n?", "\n")  # CRLF / bare CR → LF
    out = F.regexp_replace(out, _CONTROL_CLASS, "")
    out = F.regexp_replace(out, "[ \\t\\x0B\\f]+", " ")
    out = F.regexp_replace(out, " ?\n ?", "\n")
    out = F.regexp_replace(out, "\n{3,}", "\n\n")
    return F.trim(out)


def normalize_text(
    corpus: DataFrame,
    text_col: str = "text",
    form: str | None = None,
) -> DataFrame:
    """The corpus with ``text_col`` canonicalized in place (same
    schema, same column order).  ``form`` adds the Unicode normal form
    tier (``"NFC"``/``"NFKC"``/``"NFD"``/``"NFKD"``) BEFORE the
    whitespace tier — NFKC itself introduces ASCII spaces (NBSP
    U+00A0, fullwidth space U+3000 and friends fold to U+0020), so
    form-last would leave fresh uncollapsed runs the whitespace pass
    already ran past (found in self-review; order is now
    form → whitespace, matching C4/CCNet practice).  ``None``
    (default) keeps the plan pure JVM."""
    cols = corpus.columns
    out = corpus
    if form is not None:
        if form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError(
                f"form must be NFC/NFKC/NFD/NFKD/None, got {form!r}"
            )
        schema = out.schema

        def run(batches: Iterator) -> Iterator:
            import unicodedata

            for b in batches:
                if len(b):
                    b[text_col] = [
                        unicodedata.normalize(form, t) if t is not None else None
                        for t in b[text_col]
                    ]
                yield b

        out = out.mapInPandas(run, schema)
    return out.withColumn(
        text_col, normalize_whitespace_column(F.col(text_col))
    ).select(*cols)
