"""Arrow IPC file (Feather v2) vector format.

Semantics re-derived from the reference driver
(/root/reference/ogr/ogrsf_frmts/arrow/ogrfeatherwriterlayer.cpp:288-292
schema-level "geo" key-value metadata, identical JSON layout to
GeoParquet's; /root/reference/ogr/ogrsf_frmts/arrow_common/
ograrrowlayer.hpp:1011-1013 recognises field-level
ARROW:extension:name in {ogc.wkb, geoarrow.wkb}).  Geometry travels
as a binary WKB column flagged BOTH ways the reference reader
accepts: the schema `geo` JSON and the field extension name.

Writer: streamed single-file sink — toLocalIterator feeds bounded
RecordBatches through pa.ipc.new_file (constant driver memory, same
contract as the other single-file sinks).

Reader: an IPC *file* (as opposed to a stream) carries a footer that
indexes every record batch, so the scan distributes BY BATCH: each
task opens the file and materialises only its own batch
(pa.ipc.open_file(...).get_batch(i)) — the same split-by-offset
pattern as the NetCDF/Zarr byte-range readers.  The path must be
visible to executors (shared storage on a real cluster; trivially
true in local mode), like every single-file source in this repo.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_arrow_ipc", "read_arrow_ipc",
           "write_arrow_stream", "read_arrow_stream"]

_SPARK_TO_ARROW = {
    "long": "int64", "bigint": "int64", "int": "int32",
    "integer": "int32", "double": "float64", "float": "float32",
    "string": "string", "binary": "binary", "boolean": "bool",
}
_ARROW_TO_SPARK = {
    "int64": T.LongType(), "int32": T.IntegerType(),
    "double": T.DoubleType(), "float": T.FloatType(),
    "string": T.StringType(), "large_string": T.StringType(),
    "binary": T.BinaryType(), "large_binary": T.BinaryType(),
    "bool": T.BooleanType(),
}


def _pa_schema(df: DataFrame, geom_col: str):
    import pyarrow as pa

    fields = []
    for f in df.schema.fields:
        ss = f.dataType.simpleString()
        if ss not in _SPARK_TO_ARROW:
            raise ValueError(f"arrow ipc: unsupported column type {ss}")
        typ = getattr(pa, _SPARK_TO_ARROW[ss])()
        md = None
        if f.name == geom_col:
            if ss != "binary":
                raise ValueError("arrow ipc: geometry column must be WKB binary")
            # ograrrowlayer.hpp:1013 — geoarrow.wkb extension name
            md = {b"ARROW:extension:name": b"geoarrow.wkb"}
        fields.append(pa.field(f.name, typ, metadata=md))
    geo = {
        "version": "1.1.0",
        "primary_column": geom_col,
        "columns": {geom_col: {"encoding": "WKB",
                               "geometry_types": []}},
    }
    return pa.schema(fields, metadata={b"geo": json.dumps(geo).encode()})


def write_arrow_ipc(df: DataFrame, path: str,
                    geom_col: str = "geometry",
                    batch_rows: int = 4096) -> None:
    import pandas as pd
    import pyarrow as pa

    schema = _pa_schema(df, geom_col)
    names = [f.name for f in df.schema.fields]
    tmp = path + ".tmp"
    with pa.OSFile(tmp, "wb") as sink:
        with pa.ipc.new_file(sink, schema) as writer:
            buf: list[tuple] = []

            def flush():
                pdf = pd.DataFrame(buf, columns=names)
                writer.write_batch(
                    pa.RecordBatch.from_pandas(
                        pdf, schema=schema, preserve_index=False
                    )
                )
                buf.clear()

            for row in df.toLocalIterator():
                buf.append(tuple(row[n] for n in names))
                if len(buf) >= batch_rows:
                    flush()
            if buf:
                flush()
    os.replace(tmp, path)


def _detect_geom(pa_schema) -> str:
    """Geometry column per the reference's two accepted markers;
    loud error when neither is present (like read_geoparquet)."""
    md = pa_schema.metadata or {}
    if b"geo" in md:
        geo = json.loads(md[b"geo"])
        geom_col = geo["primary_column"]
        enc = geo["columns"][geom_col]["encoding"]
        if enc != "WKB":
            raise ValueError(f"unsupported geometry encoding {enc!r}")
        return geom_col
    for f in pa_schema:
        ext = (f.metadata or {}).get(b"ARROW:extension:name")
        if ext in (b"ogc.wkb", b"geoarrow.wkb"):
            return f.name
    raise ValueError("arrow ipc: no geo metadata / wkb extension")


def _spark_fields(pa_schema, geom_col: str, geom_out: str):
    out_fields = []
    for f in pa_schema:
        st = _ARROW_TO_SPARK.get(str(f.type))
        if st is None:
            raise ValueError(f"arrow ipc: unsupported arrow type {f.type}")
        name = geom_out if f.name == geom_col else f.name
        out_fields.append(T.StructField(name, st))
    return out_fields


def write_arrow_stream(df: DataFrame, path: str,
                       geom_col: str = "geometry",
                       batch_rows: int = 4096) -> None:
    """Arrow IPC STREAM variant (the pipe format the reference's
    WriteArrowBatch path also speaks): same schema/metadata contract
    as the file writer, no footer."""
    import pandas as pd
    import pyarrow as pa

    schema = _pa_schema(df, geom_col)
    names = [f.name for f in df.schema.fields]
    tmp = path + ".tmp"
    with pa.OSFile(tmp, "wb") as sink:
        with pa.ipc.new_stream(sink, schema) as writer:
            buf: list[tuple] = []

            def flush():
                pdf = pd.DataFrame(buf, columns=names)
                writer.write_batch(
                    pa.RecordBatch.from_pandas(
                        pdf, schema=schema, preserve_index=False
                    )
                )
                buf.clear()

            for row in df.toLocalIterator():
                buf.append(tuple(row[n] for n in names))
                if len(buf) >= batch_rows:
                    flush()
            if buf:
                flush()
    os.replace(tmp, path)


def read_arrow_stream(spark: SparkSession, path: str,
                      geom_out: str = "geometry") -> DataFrame:
    """Distributed scan of an Arrow IPC STREAM file.

    The stream format has no footer index, so a driver-side indexing
    pass walks the length-prefixed encapsulated messages once
    (streaming IO, constant memory) to record each record-batch's
    byte span; the DECODE then distributes — every task re-reads only
    its own [start, end) span and reconstructs the batch against the
    broadcast schema (pa.ipc.read_record_batch).  At cluster scale
    prefer the footer-indexed FILE format; this path exists for
    pipe-produced data."""
    import pyarrow as pa

    with pa.OSFile(path, "rb") as fh:
        pa_schema = pa.ipc.read_schema(fh)
    spans = []
    with pa.OSFile(path, "rb") as fh:
        mr = pa.ipc.MessageReader.open_stream(fh)
        while True:
            pos0 = fh.tell()
            try:
                msg = mr.read_next_message()
            except StopIteration:
                break
            if msg is None:
                break
            if msg.type == "record batch":
                spans.append((pos0, fh.tell()))

    geom_col = _detect_geom(pa_schema)
    out_fields = _spark_fields(pa_schema, geom_col, geom_out)
    schema = T.StructType(out_fields)
    cols = [f.name for f in pa_schema]
    schema_bytes = pa_schema.serialize().to_pybytes()

    def load(batches):
        sch = pa.ipc.read_schema(pa.BufferReader(schema_bytes))
        for pdf in batches:
            with pa.OSFile(path, "rb") as fh:
                for start, end in zip(pdf["s"], pdf["e"]):
                    fh.seek(int(start))
                    raw = fh.read(int(end) - int(start))
                    m = pa.ipc.read_message(raw)
                    out = pa.ipc.read_record_batch(m, sch).to_pandas()[cols]
                    out.columns = [f.name for f in out_fields]
                    yield out

    ids = spark.createDataFrame(spans, "s long, e long")
    ids = ids.repartition(min(len(spans), 32) or 1)
    return ids.mapInPandas(load, schema)


def read_arrow_ipc(spark: SparkSession, path: str,
                   geom_out: str = "geometry") -> DataFrame:
    """Distributed by-record-batch scan of an Arrow IPC file.

    Raises when neither the schema `geo` metadata nor a geometry
    field extension name is present, or the encoding is not WKB
    (loud, like read_geoparquet)."""
    import pyarrow as pa

    with pa.OSFile(path, "rb") as fh:
        rdr = pa.ipc.open_file(fh)
        pa_schema = rdr.schema
        n_batches = rdr.num_record_batches

    geom_col = _detect_geom(pa_schema)
    out_fields = _spark_fields(pa_schema, geom_col, geom_out)
    schema = T.StructType(out_fields)
    cols = [f.name for f in pa_schema]

    def load(batches):
        for pdf in batches:
            with pa.OSFile(path, "rb") as fh:
                rdr = pa.ipc.open_file(fh)
                for i in pdf["bi"]:
                    out = rdr.get_batch(int(i)).to_pandas()[cols]
                    out.columns = [f.name for f in out_fields]
                    yield out

    ids = spark.range(n_batches).select(F.col("id").alias("bi"))
    ids = ids.repartition(min(n_batches, 32) or 1)
    return ids.mapInPandas(load, schema)
