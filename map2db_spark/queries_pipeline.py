"""Training-data-pipeline operator surface (dedup, similarity search,
text analysis, multimodal) — registered as queries over the
`documents` / `embeddings` tables.  Implementations live in
map2db_spark/functions/; this module declares the (plan, oracle) pairs.
"""

from __future__ import annotations
