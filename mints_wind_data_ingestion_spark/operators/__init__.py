from . import dedup, discovery, retention, similarity, skew, upsert  # noqa: F401

__all__ = ["upsert", "retention", "discovery", "dedup", "similarity", "skew"]
