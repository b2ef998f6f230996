"""Operator modules extending reference parity (SURVEY.md §2.5 gaps +
BASELINE.json north-star LLM-data operators)."""
