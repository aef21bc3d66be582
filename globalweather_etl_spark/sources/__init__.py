from globalweather_etl_spark.sources.registry import Catalog, load_table
from globalweather_etl_spark.sources.constant import constant_rows
from globalweather_etl_spark.sources.snapshots import (
    ConcurrentTransactionError,
    SnapshotInfo,
    SnapshotTable,
)
from globalweather_etl_spark.sources.catalog import (
    SnapshotCatalog,
    Transaction,
)
from globalweather_etl_spark.sources.formats import (
    corrupt_count,
    drop_corrupt,
    read_csv,
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
)
from globalweather_etl_spark.sources.lakehouse_sql import (
    lakehouse_sql,
    lakehouse_sql_script,
    lakehouse_sql_txn,
)
from globalweather_etl_spark.sources.weather_from_events import (
    AS_OF_DATE,
    weather_staging_from_events,
)

__all__ = [
    "SnapshotInfo",
    "SnapshotTable",
    "SnapshotCatalog",
    "Transaction",
    "ConcurrentTransactionError",
    "Catalog",
    "load_table",
    "constant_rows",
    "lakehouse_sql",
    "lakehouse_sql_script",
    "lakehouse_sql_txn",
    "corrupt_count",
    "drop_corrupt",
    "read_csv",
    "read_jsonl",
    "read_orc",
    "write_jsonl",
    "write_orc",
    "AS_OF_DATE",
    "weather_staging_from_events",
]
