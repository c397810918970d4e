"""Input sources: the ``pages`` table (fixture generator + testdata adapter)."""
