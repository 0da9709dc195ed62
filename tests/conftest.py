import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pandas_db_spark.session import get_spark

    spark = get_spark(app_name="pandas-db-spark-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def db(spark):
    from pandas_db_spark import Database

    return Database(SF_DIR, spark=spark)


@pytest.fixture(scope="session")
def duck(spark):
    """DuckDB connection with the same tables registered as views — the local
    mirror of the driver's oracle harness."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con
