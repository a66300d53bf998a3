"""Query surface: importing this package populates the registry."""

from .registry import REGISTRY, Query, query, tables  # noqa: F401

# side-effect imports: each module registers its queries
from . import core  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import relational  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "query", "tables"]
