"""Query-suite registry: importing this package registers all query
specs into ``REGISTRY`` (driver contract: __spark_entry__.py)."""

from .base import REGISTRY, QuerySpec

from . import archiver  # noqa: F401,E402
from . import relational  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec"]
