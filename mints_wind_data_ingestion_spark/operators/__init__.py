from . import dedup, discovery, retention, similarity, upsert  # noqa: F401

__all__ = ["upsert", "retention", "discovery", "dedup", "similarity"]
