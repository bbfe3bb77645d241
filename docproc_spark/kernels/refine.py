"""Deterministic (mechanical) refinement — the invariant-safe subset of the
reference's LLM refine stage (/root/reference/docproc/refiners/llm_refine.py).

The reference refines via a chat model; its own tests disable it
(tests/conftest.py:22-23). We reproduce the MECHANICAL rules verbatim:

  - page-marker chunking for context limits (llm_refine.py:132-153,
    CHUNK_CHARS=80_000): split on the [Page N] regex, greedy-pack chunks,
    break only at page boundaries
  - page-marker removal (REFINE_SYSTEM rule 6)
  - unicode→LaTeX symbol normalization (REFINE_SYSTEM rule 2 table:
    α β ω θ ∑ ∫ √)

The LLM rewriting itself stays an optional, non-invariant stage behind the
provider interface.
"""

from __future__ import annotations

import re

import pandas as pd

CHUNK_CHARS = 80_000

_PAGE_MARKER_SPLIT = re.compile(r"(\[Page \d+\])")
_PAGE_MARKER = re.compile(r"\[Page \d+\]\n?")

# symbol → LaTeX (llm_refine.py:53-61)
SYMBOL_TABLE = (
    ("α", r"\alpha"),
    ("β", r"\beta"),
    ("ω", r"\omega"),
    ("θ", r"\theta"),
    ("∑", r"\sum"),
    ("∫", r"\int"),
    ("√", r"\sqrt{}"),
)


def chunk_by_pages(text: str, chunk_chars: int = CHUNK_CHARS) -> list[str]:
    """Greedy-pack page-delimited chunks ≤ chunk_chars (reference exact)."""
    parts = _PAGE_MARKER_SPLIT.split(text)
    chunks: list[str] = []
    current: list[str] = []
    current_len = 0
    for p in parts:
        if _PAGE_MARKER_SPLIT.match(p):
            if current and current_len + len(p) > chunk_chars and current_len > 0:
                chunks.append("".join(current))
                current = [p]
                current_len = len(p)
            else:
                current.append(p)
                current_len += len(p)
        else:
            current.append(p)
            current_len += len(p)
    if current:
        chunks.append("".join(current))
    return chunks if chunks else [text]


def strip_page_markers(text: str) -> str:
    return _PAGE_MARKER.sub("", text)


def normalize_symbols(text: str) -> str:
    for sym, latex in SYMBOL_TABLE:
        text = text.replace(sym, latex)
    return text


def refine_mechanical(text: str) -> str:
    """Marker strip + symbol normalization (scalar, oracle path)."""
    if text is None:
        return ""
    return normalize_symbols(strip_page_markers(text))


def refine_series(s: pd.Series) -> pd.Series:
    out = s.fillna("").str.replace(_PAGE_MARKER, "", regex=True)
    for sym, latex in SYMBOL_TABLE:
        out = out.str.replace(sym, latex, regex=False)
    return out
