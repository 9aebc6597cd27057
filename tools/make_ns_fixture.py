#!/usr/bin/env python3
"""Regenerate src/test/resources/events_ns/events.parquet — a 25-row
INT64 TIMESTAMP(NANOS,false) copy of the first sf0.001 events rows with a
+829 ns sub-microsecond remainder (dev tooling, driver-side python like
parity.py; the shipped library never depends on it).

Why a committed binary fixture: the round-10 testdata regeneration removed
the only NANOS-annotated parquet in the environment, and no JVM-side
writer available here can produce one (Spark has no ns timestamp type;
DuckDB's TIMESTAMP_NS coerces to µs on parquet write). Without this file
the `nanosAsLong` footer handling in Tables/EventStream — the SURVEY §1.2
landmine — would be dead code no test can reach (EventsGenerationSpec).
"""
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = pq.read_table("/root/testdata/sf0.001/events.parquet").slice(0, 25)
us = src.column("ts").cast(pa.int64())
ns = pc.add(pc.multiply(us, 1000), 829).cast(pa.timestamp("ns"))
tbl = src.set_column(src.schema.get_field_index("ts"),
                     pa.field("ts", pa.timestamp("ns")), ns)
pq.write_table(tbl, "src/test/resources/events_ns/events.parquet",
               version="2.6", coerce_timestamps=None)
print(pq.ParquetFile(
    "src/test/resources/events_ns/events.parquet").metadata.schema.column(1))
