"""Write-ahead log (SURVEY.md L7)."""

from .wal import Record, RecordType, RecoveryMode, Wal, WalError  # noqa: F401
