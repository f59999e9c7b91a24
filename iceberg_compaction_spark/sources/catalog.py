"""A minimal warehouse catalog: named tables under one root.

The reference runs as a maintenance SERVICE over a catalog of tables
(maintainer catalog, ``LEARNING_AND_ARCHITECTURE.md:147-179``); this
gives the engine the same operational shape: create/load/list/drop by
name, plus ``maintain_all`` — the cron loop that sweeps every table
with ``run_maintenance``. Purely a naming layer over ``Table``: all
atomicity lives in the per-table commit protocol, so concurrent
maintenance of different tables needs no catalog-level lock. Listing
is a directory scan (a table = a child dir with ``meta/table.json``),
so the catalog itself holds no mutable state to corrupt.
"""

from __future__ import annotations

import os
import shutil

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.sources.table import Table


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    def _loc(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValidationError(f"invalid table name {name!r}")
        return os.path.join(self.warehouse, name)

    def create_table(self, name: str, schema_ddl: str, **kwargs) -> Table:
        loc = self._loc(name)
        if os.path.exists(os.path.join(loc, "meta", "table.json")):
            raise ValidationError(f"table {name} already exists")
        return Table.create(loc, schema_ddl, name=name, **kwargs)

    def load_table(self, name: str) -> Table:
        loc = self._loc(name)
        if not os.path.exists(os.path.join(loc, "meta", "table.json")):
            raise ValidationError(f"no such table {name}")
        return Table.load(loc)

    def table_exists(self, name: str) -> bool:
        try:
            return os.path.exists(os.path.join(self._loc(name), "meta", "table.json"))
        except ValidationError:
            return False

    def list_tables(self) -> list[str]:
        out = []
        for d in sorted(os.listdir(self.warehouse)):
            if os.path.exists(os.path.join(self.warehouse, d, "meta", "table.json")):
                out.append(d)
        return out

    def drop_table(self, name: str, purge: bool = False) -> None:
        """Unregister the table. ``purge=True`` also deletes its data;
        without it only the metadata dir goes (files become orphans a
        caller can archive or sweep)."""
        loc = self._loc(name)
        if not os.path.exists(os.path.join(loc, "meta", "table.json")):
            raise ValidationError(f"no such table {name}")
        if purge:
            shutil.rmtree(loc)
        else:
            shutil.rmtree(os.path.join(loc, "meta"))

    def maintain_all(self, spark, **kwargs) -> dict:
        """Run ``operators.maintenance.run_maintenance`` over every
        table → {name: per-step summary}. Tables maintain independently
        (separate commit locks); one table's failure doesn't block the
        sweep — it's reported in its summary."""
        from iceberg_compaction_spark.operators.maintenance import run_maintenance

        out = {}
        for name in self.list_tables():
            try:
                out[name] = run_maintenance(spark, self.load_table(name), **kwargs)
            except Exception as e:  # noqa: BLE001 - sweep must survive one bad table
                out[name] = {"error": f"{type(e).__name__}: {e}"}
        return out
