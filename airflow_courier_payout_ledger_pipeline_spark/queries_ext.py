"""Scale-extension operator queries (training-data-pipeline surface): dedup,
similarity search, text analysis, event-time windows. Populated operator by
operator; each entry has a DuckDB oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations
