"""Training-data-pipeline extension queries (dedup, similarity search,
text analysis, multimodal) over the documents/embeddings fixtures.

Populated incrementally; see operators/{dedup,similarity,textops}.py.
"""

from __future__ import annotations
