"""Forward-only result cursor with typed getters.

Reference: yupana-api/.../query/Result.scala (trait), SimpleResult.scala,
yupana-core/.../TsdbServerResult.scala:1-107 — ``res.next();
res.get[T]("alias")`` row cursor streamed from the engine.

Spark mapping: ``df.toLocalIterator()`` streams partitions to the driver one
at a time — the cursor never materializes the whole result (matches the
reference's lazy iterator contract).
"""

from __future__ import annotations

import datetime as _dt
from decimal import Decimal
from typing import Any, Iterator, List, Optional, Union

from pyspark.sql import DataFrame


class YupanaResult:
    """``while r.next(): r.get("alias")`` cursor over a query result."""

    def __init__(self, df: DataFrame):
        self.field_names: List[str] = list(df.columns)
        self._index = {n: i for i, n in enumerate(self.field_names)}
        self.data_types = [f.dataType.simpleString() for f in df.schema.fields]
        self._iter: Iterator = df.toLocalIterator()
        self._row = None

    # -- cursor ------------------------------------------------------------
    def next(self) -> bool:
        try:
            self._row = next(self._iter)
            return True
        except StopIteration:
            self._row = None
            return False

    def _pos(self, key: Union[str, int]) -> int:
        if isinstance(key, int):
            return key
        if key not in self._index:
            raise KeyError(f"no field {key!r}; have {self.field_names}")
        return self._index[key]

    # -- getters (name or 0-based index) -----------------------------------
    def get(self, key: Union[str, int]) -> Any:
        if self._row is None:
            raise RuntimeError("call next() before get()")
        return self._row[self._pos(key)]

    def is_null(self, key: Union[str, int]) -> bool:
        return self.get(key) is None

    def get_string(self, key) -> Optional[str]:
        v = self.get(key)
        return None if v is None else str(v)

    def get_long(self, key) -> Optional[int]:
        v = self.get(key)
        return None if v is None else int(v)

    def get_double(self, key) -> Optional[float]:
        v = self.get(key)
        return None if v is None else float(v)

    def get_decimal(self, key) -> Optional[Decimal]:
        v = self.get(key)
        return None if v is None else (v if isinstance(v, Decimal)
                                       else Decimal(str(v)))

    def get_timestamp(self, key) -> Optional[_dt.datetime]:
        return self.get(key)

    def __iter__(self):
        while self.next():
            yield self._row
