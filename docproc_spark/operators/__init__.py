"""Relational + dedup + similarity operators (DataFrame-first, scale-aware)."""
