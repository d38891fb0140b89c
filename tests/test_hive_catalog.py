"""Hive catalog shim (ref: HiveCatalog.java).  The functional path needs a
fresh JVM (enableHiveSupport is first-session-only), so it runs in a
subprocess; the in-process test covers the guard."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from my_flink_1_10_2_spark.sources.hive import hive_catalog


def test_hive_catalog_refuses_non_hive_jvm(spark):
    """An existing in-memory-catalog session can't be upgraded — the shim
    must fail loudly, not hand back a non-Hive session."""
    with pytest.raises(RuntimeError, match="fresh process"):
        hive_catalog()


def test_hive_catalog_end_to_end_subprocess(tmp_path):
    """Fresh JVM: mount the (embedded-metastore) Hive catalog, create a
    database + partitioned table, insert, read back, list partitions."""
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {str(tmp_path)!r})
        sys.path.insert(0, "/root/repo")
        from my_flink_1_10_2_spark.sources.hive import hive_catalog
        spark = hive_catalog(
            "h1", "analytics",
            warehouse_dir={str(tmp_path / "wh")!r},
            master="local[2]",
        )
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        assert spark.catalog.currentDatabase() == "analytics"
        spark.sql(
            "CREATE TABLE sales (amount DOUBLE, region STRING) "
            "USING parquet PARTITIONED BY (region)"
        )
        spark.sql(
            "INSERT OVERWRITE sales VALUES (1.0,'eu'),(2.0,'eu'),(3.0,'us')"
        )
        parts = sorted(r.partition for r in spark.sql("SHOW PARTITIONS sales").collect())
        assert parts == ["region=eu", "region=us"], parts
        total = spark.sql("SELECT sum(amount) s FROM sales WHERE region='eu'").collect()[0].s
        assert total == 3.0, total
        print("HIVE_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # keep derby's metastore_db out of the repo
    )
    assert "HIVE_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_hive_catalog_thrift_branch_config():
    """Cluster deployment shape: a thrift metastore URI must land in
    hive.metastore.uris (and be validated), the embedded-Derby branch
    must NOT set it — both branches of the reference HiveCatalog
    constructor surface covered at config level."""
    import pytest

    from my_flink_1_10_2_spark.sources.hive import hive_catalog_conf

    conf = hive_catalog_conf(
        warehouse_dir="/wh", metastore_uris="thrift://ms-1:9083,thrift://ms-2:9083"
    )
    assert conf["hive.metastore.uris"].startswith("thrift://ms-1")
    assert conf["spark.sql.warehouse.dir"] == "/wh"
    assert "hive.metastore.uris" not in hive_catalog_conf(warehouse_dir="/wh")
    with pytest.raises(ValueError, match="thrift://"):
        hive_catalog_conf(metastore_uris="ms-1:9083")
