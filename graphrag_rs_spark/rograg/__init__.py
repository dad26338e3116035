"""ROGRAG query-side operators (reference rograg/*, feature `rograg`)."""
