"""JDBC external sources (VERDICT r5 missing-item 2): a `connection:`
block on a schema.yml source registers it through spark.read.jdbc —
the Spark-native read side of the reference's per-warehouse externals
(reference: A/src/dbt/adapters/fal_experimental/support/postgres.py:13-30
reads a live relation through a DBAPI engine into pandas; here the scan
stays lazy/distributed). Uses Spark's bundled embedded Derby so the test
needs no network.
"""

from __future__ import annotations

import textwrap
from pathlib import Path

import pytest

from dbt_fal_spark.api import FalSpark
from dbt_fal_spark.project.loader import load_project

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _make_derby_db(spark, db_dir: str) -> str:
    """Create and populate an embedded Derby database via the JVM."""
    url = f"jdbc:derby:{db_dir};create=true"
    dm = spark._jvm.java.sql.DriverManager
    conn = dm.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE accounts (id INT, name VARCHAR(32), balance DOUBLE)")
    st.execute("INSERT INTO accounts VALUES (1, 'ada', 10.5), (2, 'bob', -3.25), (3, 'cyd', 0.0)")
    st.close()
    conn.close()
    return f"jdbc:derby:{db_dir}"


@pytest.fixture()
def jdbc_project(spark, tmp_path: Path) -> Path:
    url = _make_derby_db(spark, str(tmp_path / "derbydb"))
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: jdbcproj\n")
    (proj / "models" / "schema.yml").write_text(
        textwrap.dedent(
            f"""
            version: 2
            sources:
              - name: warehouse
                meta:
                  connection:
                    url: {url}
                    driver: {DERBY_DRIVER}
                tables:
                  - name: accounts
                  - name: accounts_caps
                    meta:
                      connection:
                        dbtable: accounts
                        fetchsize: 2
            """
        )
    )
    (proj / "models" / "rich.sql").write_text(
        "SELECT id, name FROM {{ source('warehouse', 'accounts') }} WHERE balance > 0"
    )
    return proj


def test_connection_meta_inherited(jdbc_project):
    manifest = load_project(jdbc_project)
    src = manifest.source_by_name("warehouse", "accounts")
    assert src.meta["connection"]["driver"] == DERBY_DRIVER
    # table-level keys override / extend the inherited source-level block
    caps = manifest.source_by_name("warehouse", "accounts_caps")
    assert caps.meta["connection"]["dbtable"] == "accounts"
    assert caps.meta["connection"]["url"] == src.meta["connection"]["url"]
    assert caps.meta["connection"]["fetchsize"] == 2


def test_source_reads_via_jdbc(spark, jdbc_project):
    fal = FalSpark(jdbc_project, spark=spark)
    df = fal.source("warehouse", "accounts")
    rows = {(r["ID"], r["NAME"]) for r in df.collect()}
    assert rows == {(1, "ada"), (2, "bob"), (3, "cyd")}
    # the dbtable override resolves to the same relation
    assert fal.source("warehouse", "accounts_caps").count() == 3


def test_sql_model_refs_jdbc_source(spark, jdbc_project):
    fal = FalSpark(jdbc_project, spark=spark)
    df = fal.execute_sql(
        "SELECT count(*) AS n FROM {{ source('warehouse', 'accounts') }} WHERE balance >= 0"
    )
    assert df.collect()[0]["n"] == 2


def test_write_to_jdbc_source_rejected(spark, jdbc_project):
    fal = FalSpark(jdbc_project, spark=spark)
    df = spark.range(1)
    with pytest.raises(NotImplementedError, match="JDBC external"):
        fal.write_to_source(df, "warehouse", "accounts")


def test_jdbc_partitioned_read(spark, jdbc_project, tmp_path):
    """The 100 TB on-ramp: partitionColumn/bounds/numPartitions in the
    connection block must produce a multi-partition parallel scan, not a
    single-connection pull, with no row loss or duplication at the
    partition seams."""
    import textwrap

    schema = jdbc_project / "models" / "schema.yml"
    schema.write_text(
        schema.read_text()
        + textwrap.indent(
            textwrap.dedent(
                """\
                - name: accounts_parallel
                  meta:
                    connection:
                      dbtable: accounts
                      partitionColumn: id
                      lowerBound: 1
                      upperBound: 3
                      numPartitions: 2
                """
            ),
            "      ",  # align with the existing `tables:` entries
        )
    )
    fal = FalSpark(jdbc_project, spark=spark)
    df = fal.source("warehouse", "accounts_parallel")
    assert df.rdd.getNumPartitions() == 2
    assert sorted(r["ID"] for r in df.collect()) == [1, 2, 3]


def test_jdbc_writeback_roundtrip(spark, jdbc_project):
    """VERDICT r6 item 5: `writable: true` on the connection block
    enables df.write.jdbc append/overwrite; the written rows come back
    through the read path. Read-only sources keep rejecting."""
    import textwrap

    schema = jdbc_project / "models" / "schema.yml"
    schema.write_text(
        schema.read_text()
        + textwrap.indent(
            textwrap.dedent(
                """\
                - name: scratch
                  meta:
                    connection:
                      dbtable: scratch
                      writable: true
                      numPartitions: 1
                """
            ),
            "      ",
        )
    )
    fal = FalSpark(jdbc_project, spark=spark)
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, tag string")

    # overwrite creates the table through JDBC (Spark quotes the column
    # names, so Derby keeps them lowercase — read positionally)
    fal.write_to_source(df, "warehouse", "scratch", mode="overwrite")
    got = {tuple(r) for r in fal.source("warehouse", "scratch").collect()}
    assert got == {(1, "x"), (2, "y")}

    # append accumulates
    fal.write_to_source(
        spark.createDataFrame([(3, "z")], "id long, tag string"),
        "warehouse", "scratch", mode="append",
    )
    assert fal.source("warehouse", "scratch").count() == 3

    # unsupported mode is a clear error, not a silent JDBC surprise
    with pytest.raises(ValueError, match="append/overwrite"):
        fal.write_to_source(df, "warehouse", "scratch", mode="ignore")

    # sources without the opt-in stay read-only with the hint
    with pytest.raises(NotImplementedError, match="writable: true"):
        fal.write_to_source(df, "warehouse", "accounts")
