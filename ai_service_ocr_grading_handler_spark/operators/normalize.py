"""Text normalization: mojibake repair and Unicode NFC — the cleanup pass
web-scale curation runs between extraction and quality gating (ftfy is the
reference tool for the first, every tokenizer recipe mandates the second).

Occupies the reference's text-cleanup position (the backslash/backtick
normalization family, /root/reference/engine/core/utils.py — T7/T8 in
SURVEY §2) generalized to the corruption actually found in web corpora:

- **Mojibake**: UTF-8 bytes decoded as Latin-1/Windows-1252 somewhere in
  a pipeline ("cafÃ©" for "café"). The repair is the exact
  inverse — re-encode the misdecoded string and decode it as UTF-8 — and
  is expressed ENTIRELY in native expressions (translate/encode/decode/
  rlike), zero Python, zero shuffle, whole-stage-codegen friendly.
- **NFC**: canonical composition (decomposed "e" + U+0301 -> "é").
  Spark SQL has no normalizer, so this is an Arrow-batched kernel
  (mapInPandas over `unicodedata`), never per-row Python.

Both are idempotent and pure per-row; batch-boundary invariance holds
trivially for the native form and is tested for the kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# The 27 printable Windows-1252 characters in the 0x80-0x9F block. Real
# mojibake is usually a cp1252 misread (0x93 -> U+201C smart quote), while
# a Latin-1 misread leaves raw C1 controls (U+0080-U+009F). Mapping the
# cp1252 forms BACK to their byte-value code points first makes the two
# misreads byte-identical, so one repair path serves both.
_CP1252 = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}
_CP1252_SRC = "".join(_CP1252.values())
_CP1252_DST = "".join(chr(b) for b in _CP1252)

# a UTF-8 lead byte (C2-F4) misread as Latin-1, followed by a misread
# continuation byte (80-BF) — the signature no clean Latin-script text has
_MOJIBAKE_SIG = "[\u00C2-\u00F4][\u0080-\u00BF]"


def fix_mojibake(text_col: str | Column = "text") -> Column:
    """Repair UTF-8-misdecoded-as-Latin-1/cp1252 text; pass everything
    else through unchanged. Native expression chain (scan speed).

    A row is repaired only when ALL hold, otherwise returned verbatim:
      1. after cp1252->C1 mapping it matches the mojibake signature,
      2. every code point is <= U+00FF (so Latin-1 re-encoding is lossless
         — a string with real non-Latin text alongside the signature is
         left alone rather than half-mangled), and
      3. the re-encoded bytes are valid UTF-8 (`is_valid_utf8`; Spark 4's
         `decode` THROWS on malformed input, so validity gates the lazy
         CASE branch rather than sniffing U+FFFD afterwards).

    The repair reverses exactly ONE misread (property-tested:
    fix(misread(t)) == t for arbitrary t). Output with real multibyte
    characters (> U+00FF) or no signature is a fixed point, so a second
    pass is the identity for single-misread input; DOUBLY-encoded text
    (misread twice upstream) needs one pass per layer — run to fixpoint
    if a pipeline is known to double-encode (ftfy's loop)."""
    s = F.col(text_col) if isinstance(text_col, str) else text_col
    mapped = F.translate(s, _CP1252_SRC, _CP1252_DST)
    sig = mapped.rlike(_MOJIBAKE_SIG)
    latin1_only = ~mapped.rlike("[^\u0000-\u00FF]")
    raw = F.encode(mapped, "ISO-8859-1")
    return F.when(
        sig & latin1_only & F.is_valid_utf8(raw),
        F.decode(raw, "UTF-8"),
    ).otherwise(s)


def is_mojibake(text_col: str | Column = "text") -> Column:
    """True iff `fix_mojibake` would change the row — the corpus-health
    metric (mojibake rate) a 100 TB run reports next to its drop counts."""
    s = F.col(text_col) if isinstance(text_col, str) else text_col
    mapped = F.translate(s, _CP1252_SRC, _CP1252_DST)
    return (
        mapped.rlike(_MOJIBAKE_SIG)
        & ~mapped.rlike("[^\u0000-\u00FF]")
        & F.is_valid_utf8(F.encode(mapped, "ISO-8859-1"))
    )


def nfc_normalize(df: DataFrame, cols: tuple[str, ...] = ("text",)) -> DataFrame:
    """NFC-normalize the named string columns, preserving the schema.

    Arrow-batched kernel (mapInPandas + `unicodedata.normalize`): one
    Arrow channel, a narrow transformation with NO shuffle; pass-through
    columns ride along untouched. Python is unavoidable here — Spark SQL
    exposes no Unicode normalizer — but the per-batch cost is one
    vectorized `.map` per column, and the kernel is a pushdown barrier
    like extract_pages: filter BEFORE calling this."""
    import pandas as pd  # noqa: F401  (type context for readers)

    names = list(cols)

    def kernel(batches: Iterator) -> Iterator:
        import unicodedata

        norm = unicodedata.normalize
        for pdf in batches:
            for c in names:
                col = pdf[c]
                mask = col.notna()
                pdf.loc[mask, c] = [norm("NFC", v) for v in col[mask]]
            yield pdf

    return df.mapInPandas(kernel, df.schema)
