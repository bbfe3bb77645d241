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
