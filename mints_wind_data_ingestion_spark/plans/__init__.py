"""Query surface: importing this package populates the registry."""

from .registry import (  # noqa: F401
    REGISTRY,
    Query,
    enable_plan_cache,
    query,
    resolve_oracle,
    tables,
)

# side-effect imports: each module registers its queries; composites
# must come last (their oracles embed component oracle SQL)
from . import core  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import composites  # noqa: F401,E402
from .composites import PROMOTED_SLOTS  # noqa: F401,E402
from .registry import driver_registry  # noqa: F401,E402

__all__ = [
    "PROMOTED_SLOTS",
    "REGISTRY",
    "Query",
    "query",
    "resolve_oracle",
    "tables",
    "driver_registry",
]
