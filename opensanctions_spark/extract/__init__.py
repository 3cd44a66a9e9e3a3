"""Compat ``zavod.extract``: extraction-service boundaries (the LLM
machinery lives engine-side in ``sources/llm.py``; this package carries
the crawler-facing seams)."""
