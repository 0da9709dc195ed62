from pandas_db_spark.sources.registry import (
    discover_tables,
    load_sqlite_tables,
    load_sql_script_tables,
    SUPPORTED_FILE_EXTENSIONS,
)

__all__ = [
    "discover_tables",
    "load_sqlite_tables",
    "load_sql_script_tables",
    "SUPPORTED_FILE_EXTENSIONS",
]
