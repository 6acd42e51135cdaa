"""Extension query set: the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal) beyond
the declared P/X queries. Populated incrementally; every entry ships
with a DuckDB oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

EXTENSION_QUERIES: dict = {}
EXTENSION_ORACLES: dict = {}
