"""External UDF server over Arrow Flight.

Reference: ``src/meta/app/src/principal/user_defined_function.rs:31``
(UDFServer: address/handler/arg types/return type) executed by
``src/query/service/src/pipelines/processors/transforms/
transform_udf_server.rs`` — each data block's argument columns are
shipped to the server as one Arrow batch over Flight ``do_exchange``
(descriptor = handler name) and the returned batch's single column is
the result.

Spark-first shape: the client is an Arrow-batched ``pandas_udf`` — the
same batch-level exchange, except Spark hands us the Arrow batches.
Rows never cross the boundary one at a time; throughput is bounded by
Flight, not Python. At 1000-executor scale each task opens its own
connection to the (horizontally scalable) UDF service, matching the
reference's per-pipeline client.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

__all__ = ["register_udf_server", "serve_udf"]


def register_udf_server(
    spark: SparkSession,
    name: str,
    address: str,
    handler: str,
    return_type: str,
) -> None:
    """CREATE FUNCTION ... AS (…) RETURNS … LANGUAGE python HANDLER=…
    ADDRESS='http://host:port' — registers a Spark UDF that proxies
    each Arrow batch to the Flight server."""
    addr = address.replace("http://", "grpc://").replace(
        "https://", "grpc+tls://"
    )
    spark_ret = T._parse_datatype_string(return_type)

    from pyspark.sql.pandas.functions import pandas_udf

    def _proxy(*cols):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.flight as fl

        client = fl.connect(addr)
        batch = pa.RecordBatch.from_arrays(
            [pa.Array.from_pandas(c) for c in cols],
            names=[f"arg{i}" for i in range(len(cols))],
        )
        descriptor = fl.FlightDescriptor.for_path(handler)
        writer, reader = client.do_exchange(descriptor)
        writer.begin(batch.schema)
        writer.write_batch(batch)
        writer.done_writing()
        out = reader.read_all()
        client.close()
        return out.column(0).to_pandas()

    spark.udf.register(name, pandas_udf(_proxy, spark_ret))


def serve_udf(handlers: dict, port: int = 0):
    """Minimal Flight UDF server for tests/examples: handlers maps a
    name to fn(pyarrow.Table) -> pyarrow.Array. Returns the started
    server (serve in a thread; .port gives the bound port)."""
    import pyarrow as pa
    import pyarrow.flight as fl

    class _Server(fl.FlightServerBase):
        def __init__(self):
            super().__init__(f"grpc://127.0.0.1:{port}")

        def do_exchange(self, context, descriptor, reader, writer):
            name = descriptor.path[0].decode()
            fn = handlers[name]
            tbl = reader.read_all()
            result = fn(tbl)
            out = pa.Table.from_arrays([result], names=["result"])
            writer.begin(out.schema)
            writer.write_table(out)

    return _Server()
