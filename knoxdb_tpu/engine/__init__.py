"""Engine runtime core: catalog, MVCC transactions, tables, tasks
(SURVEY.md L8)."""

from .engine import Engine, Options, Tx  # noqa: F401
from .table import Table, TableMetrics, TableState  # noqa: F401
