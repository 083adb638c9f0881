"""Source connectors: partitioned JDBC reads + file sources."""

from .dialects import Dialect, get_dialect
from .jdbc import JdbcSource

__all__ = ["Dialect", "get_dialect", "JdbcSource"]
