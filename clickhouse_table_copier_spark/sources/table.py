"""Table references — the engine's "server + database + table" abstraction.

The reference identifies a table by (connection, database, table) and builds
DSNs in ``/root/reference/database/database.go:64-151``; its config carries a
source and a destination endpoint (``/root/reference/config/config.go:11-21``).
Here a :class:`TableRef` names a table by storage location — a parquet
path/directory for the fixture harness, with a JDBC seam kept open so the
original cross-server use case (ClickHouse → ClickHouse) remains reachable
from the same plan code.

Scale note: reads stay fully declarative (``spark.read``), so Catalyst gets
predicate pushdown, column pruning and partition pruning on every downstream
plan. Nothing here collects data to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class TableRef:
    """A named table at a storage location.

    ``fmt='parquet'``: ``location`` is a file/dir path.
    ``fmt='jdbc'``: ``location`` is a JDBC URL and ``table`` must be set;
    options carry credentials/driver. (Parity seam for the reference's
    remote-server sources; not exercised by the local fixture harness.)
    """

    location: str
    fmt: str = "parquet"
    table: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    def name(self) -> str:
        return self.table or self.location.rstrip("/").rsplit("/", 1)[-1]


def load_table(spark: SparkSession, ref: TableRef) -> DataFrame:
    """Scan a table (SURVEY §2.1 S1). Declarative read → pushdown-friendly."""
    if ref.fmt == "parquet":
        return spark.read.parquet(ref.location)
    if ref.fmt == "jdbc":
        reader = spark.read.format("jdbc").option("url", ref.location)
        if ref.table:
            reader = reader.option("dbtable", ref.table)
        # pushDownPredicate/pushDownAggregate keep filtering on the remote
        # server — the Spark analogue of the reference baking WHERE into
        # `SELECT … FROM remote(…)` (database.go:488-489).
        reader = reader.option("pushDownPredicate", "true")
        for k, v in ref.options.items():
            reader = reader.option(k, v)
        return reader.load()
    raise ValueError(f"unsupported table format: {ref.fmt!r}")


def sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the fixture tables from a scale-factor directory."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
