"""Frozen text-normalization spec.

The reference normalizes DNA bytes before shingling
(``seq.normalize(false)``, ``/root/reference/src/sketcher.rs:93`` —
uppercase/canonicalize). For web text the analogous step must be fixed
and documented because both the byte-identical-text-per-url invariant
and dedup recall depend on it (SURVEY.md §7 hard-part 3).

THE SPEC (do not change without versioning ``SketchParams``):

1. Unicode NFC normalization.
2. Lowercase via ``str.lower()``.
3. Tokenize on Unicode whitespace via ``str.split()`` (no punctuation
   stripping — punctuation stays attached to its token, which keeps the
   spec trivial to reproduce in any language/runtime).
4. Tokens are encoded UTF-8 for hashing.

There is no reverse-complement analogue for text; the reference's
canonical-kmer step (``src/sketcher.rs:99-105``) is a genomics-only
concern and is explicitly dropped.

JVM-native mode (``algo='xxh64'``) — deliberate spec variant: Spark has
no NFC builtin, so that path applies steps 2-4 WITHOUT step 1 (NFC).
Tokenization there is ``lower()`` + split on the Unicode-whitespace
regex ``[\\p{IsWhite_Space}\\x1c-\\x1f]`` — exactly Python's
``str.split()`` class — and the pure-Python oracle for xxh64 mode
mirrors the no-NFC behavior (``oracle.sketch_text``), so parity holds on
non-ASCII text too. Consequence: two documents whose texts differ only
in Unicode normalization form dedup under xxh3 but not under xxh64.
"""

from __future__ import annotations

import unicodedata


def normalize_text(text: str) -> str:
    """NFC + lowercase. Step 1-2 of the frozen spec.

    NFC is the identity on pure-ASCII strings — ``str.isascii`` is a
    cheap C scan, and most web-text tokens are ASCII, so skipping the
    normalize call is a pure optimization with identical output."""
    if text.isascii():
        return text.lower()
    return unicodedata.normalize("NFC", text).lower()


def tokenize(text: str) -> list[str]:
    """Full spec: normalize then whitespace-split. Deterministic."""
    return normalize_text(text).split()


def tokenize_bytes(text: str) -> list[bytes]:
    return [t.encode("utf-8") for t in tokenize(text)]
