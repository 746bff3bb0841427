"""Table sources/sinks: the Iceberg-style snapshot catalog."""

from .catalog import Catalog  # noqa: F401
