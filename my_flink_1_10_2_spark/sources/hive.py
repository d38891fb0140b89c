"""Hive catalog connector (ref: flink-connectors/flink-connector-hive/
src/main/java/org/apache/flink/table/catalog/hive/HiveCatalog.java).

The reference mounts a Hive metastore as a Flink catalog
(``new HiveCatalog(name, defaultDatabase, hiveConfDir)``); Spark has the
same integration built in (``enableHiveSupport`` — persistent metastore,
SQL DDL against it, hive-layout partitioned tables).  This shim maps the
reference's constructor surface onto a hive-enabled SparkSession.

Unlike the option-translation shims (Kafka/ES/Kinesis), this path is
fully functional in-sandbox: with no ``metastore_uris`` Spark runs an
embedded Derby metastore under ``warehouse_dir`` — the local-mode analog
of a real metastore; on a cluster, point ``metastore_uris`` at the
thrift endpoint and every table becomes visible to all sessions.

Caveat (same as Spark's own): ``enableHiveSupport`` must be set before
the JVM's first SparkSession is created — an existing in-memory-catalog
session cannot be upgraded in place.  ``hive_catalog`` raises if it
detects that situation rather than silently returning a non-Hive session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hive_catalog_conf(
    warehouse_dir: str | None = None,
    metastore_uris: str | None = None,
) -> dict[str, str]:
    """Catalog-mount configuration as a pure map (unit-testable without
    a JVM): embedded-Derby mode sets only the warehouse location; the
    cluster mode adds the thrift ``hive.metastore.uris`` — exactly the
    two deployment shapes of the reference's HiveCatalog (hiveConfDir
    with/without a remote metastore)."""
    conf: dict[str, str] = {}
    if warehouse_dir is not None:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    if metastore_uris is not None:
        if not metastore_uris.startswith("thrift://"):
            raise ValueError(
                f"metastore_uris must be a thrift:// URI, got {metastore_uris!r}"
            )
        conf["hive.metastore.uris"] = metastore_uris
    return conf


def hive_catalog(
    name: str = "hive",
    default_database: str = "default",
    *,
    warehouse_dir: str | None = None,
    metastore_uris: str | None = None,
    master: str | None = None,
) -> SparkSession:
    """Mount a Hive metastore as the session catalog (ref:
    HiveCatalog.java constructor — name + defaultDatabase + conf
    location; the thrift URI plays the role of hive-site.xml here)."""
    from my_flink_1_10_2_spark.session import _LOCAL_CPUS, _apply_engine_conf

    active = SparkSession.getActiveSession()
    if (
        active is not None
        and active.conf.get("spark.sql.catalogImplementation", "in-memory") != "hive"
    ):
        raise RuntimeError(
            "a non-Hive SparkSession already owns this JVM; start the "
            "Hive catalog in a fresh process (enableHiveSupport cannot "
            "be applied retroactively)"
        )
    builder = SparkSession.builder.appName(f"hive_catalog_{name}")
    builder = _apply_engine_conf(builder)
    for key, val in hive_catalog_conf(warehouse_dir, metastore_uris).items():
        builder = builder.config(key, val)
    builder = builder.master(master or f"local[{_LOCAL_CPUS}]")
    spark = builder.enableHiveSupport().getOrCreate()
    if default_database != "default":
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {default_database}")
        spark.catalog.setCurrentDatabase(default_database)
    return spark
