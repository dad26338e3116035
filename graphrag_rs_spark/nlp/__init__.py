"""Heuristic NLP operators (reference nlp/ family)."""
