from .scans import TABLES, scan, scan_text
from .sinks import format_tokens, write_parquet, write_tokens

__all__ = ["TABLES", "scan", "scan_text", "format_tokens", "write_parquet", "write_tokens"]
