"""External UDF server (Arrow Flight) round-trip.

Reference: UDFServer principal (user_defined_function.rs:31) +
transform_udf_server.rs — argument blocks ship to the server as Arrow
batches over Flight do_exchange; the response column is the result.
"""

import threading

import pytest


@pytest.fixture(scope="module")
def flight_gcd_server():
    pa = pytest.importorskip("pyarrow")
    pytest.importorskip("pyarrow.flight")
    import math

    from databend_spark.functions.udf_server import serve_udf

    def gcd(tbl):
        a = tbl.column(0).to_pylist()
        b = tbl.column(1).to_pylist()
        return pa.array(
            [None if x is None or y is None else math.gcd(x, y)
             for x, y in zip(a, b)],
            type=pa.int64(),
        )

    server = serve_udf({"gcd": gcd})
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    yield server
    server.shutdown()


def test_udf_server_roundtrip(spark, flight_gcd_server):
    from databend_spark.functions.udf_server import register_udf_server

    port = flight_gcd_server.port
    register_udf_server(
        spark, "gcd_ext", f"http://127.0.0.1:{port}", "gcd", "bigint"
    )
    rows = spark.sql(
        "SELECT id, gcd_ext(id * 6, id * 9) g FROM range(1, 5)"
    ).collect()
    assert [(r.id, r.g) for r in rows] == [
        (1, 3), (2, 6), (3, 9), (4, 12),
    ]
    # batch-level exchange: NULLs survive, arrow types preserved
    row = spark.sql(
        "SELECT gcd_ext(CAST(NULL AS BIGINT), 4) g"
    ).first()
    assert row.g is None
