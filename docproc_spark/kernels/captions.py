"""Deterministic caption stub for media spans.

The reference captions images with a vision LLM / Azure OCR
(/root/reference/docproc/extractors/vision_llm.py:85-126), but its own test
configuration disables vision (tests/conftest.py:22-23) so the correctness
path is deterministic. We keep the *structure* — content-hash dedupe, one
caption computed per unique image, context string fixed at the FIRST
sighting (vision_llm.py:390-409) — and stand in a pure function of
(media_ref, first-sighting context) for the model call. A real provider can
be plugged in behind the same signature later.
"""

from __future__ import annotations

import pandas as pd

CAPTION_TEMPLATE = "Figure {short}: {ctx}"


def caption_stub(media_ref: str, ctx: str) -> str:
    """Deterministic caption for one unique image.

    ``media_ref`` is the sha256 hex of the media bytes; ``ctx`` is the
    reference's first-sighting context string "Page {p}, image {i}.".
    """
    return CAPTION_TEMPLATE.format(short=media_ref[:12], ctx=ctx)


def caption_series(media_ref: pd.Series, ctx: pd.Series) -> pd.Series:
    """Vectorized caption stub (pandas-UDF path)."""
    return "Figure " + media_ref.str.slice(0, 12) + ": " + ctx


# ---------------------------------------------------------------------------
# Vision-output post-processing (reference vision_llm.py:107-123, 167-183)
# ---------------------------------------------------------------------------
_FENCE_RE = r"^```(?:json)?\s*\n?|\n?```\s*$"


def strip_md_fences_series(s: pd.Series) -> pd.Series:
    """Strip markdown ``` fences wrapping a model's JSON reply
    (vision_llm.py:107-118) — vectorized regex."""
    return s.fillna("").str.strip().str.replace(_FENCE_RE, "", regex=True).str.strip()


def flatten_extraction(d: dict) -> str:
    """Extraction dict → readable text, reference-exact field order and
    separators (vision_llm.py:167-183)."""
    parts = []
    if d.get("text"):
        parts.append(str(d["text"]))
    if d.get("equations"):
        eqs = d["equations"] if isinstance(d["equations"], list) else [d["equations"]]
        parts.append("Equations: " + " ; ".join(str(e) for e in eqs if e))
    if d.get("tables"):
        parts.append(str(d["tables"]))
    if d.get("figures_descriptions"):
        figs = (
            d["figures_descriptions"]
            if isinstance(d["figures_descriptions"], list)
            else [d["figures_descriptions"]]
        )
        parts.append("Figures: " + " ; ".join(str(f) for f in figs if f))
    if d.get("data_points") and isinstance(d["data_points"], dict):
        parts.append("Data: " + str(d["data_points"]))
    return "\n".join(parts) if parts else ""
