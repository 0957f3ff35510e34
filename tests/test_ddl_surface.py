"""Round-11 DDL surface: the reference parser's last ALTER/CATALOG nodes.

Covers SqlAddPartitions / SqlDropPartitions / SqlChangeColumn /
SqlAlterTableAddConstraint / SqlAlterTableDropConstraint /
SqlAlterFunction / SqlCreateCatalog / SqlDropCatalog
(flink-table/flink-sql-parser/.../ddl/) plus the FLIP-68 module veneer
(flink-table-api-java/.../module/ModuleManager.java).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from flink_parent_spark.api.table_env import TableEnvironment


def _fs_table(env, name, base, cols, partitions=None):
    pb = f" PARTITIONED BY ({', '.join(partitions)})" if partitions else ""
    env.execute_sql(
        f"CREATE TABLE {name} ({cols}){pb} WITH ("
        f"'connector' = 'filesystem', 'path' = '{base}/{name}', "
        f"'format' = 'parquet')"
    )


def test_partitioned_filesystem_ddl_roundtrip(spark):
    """CREATE ... PARTITIONED BY -> INSERT (static + dynamic partition) ->
    ADD/DROP PARTITION -> SHOW PARTITIONS, with a pruned read of a named
    partition returning its rows (the SqlAddPartitions/SqlDropPartitions
    done-criterion)."""
    base = tempfile.mkdtemp(prefix="fps_ddl_part_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "pt", base, "id INT, d STRING", partitions=["d"])
        assert env.catalog["pt"].partitions == ["d"]
        # static partition spec (SqlInsert staticPartitions)
        env.execute_sql("INSERT INTO pt PARTITION (d='2024-01-01') SELECT 10 AS id")
        # dynamic partition from the query's own column
        env.execute_sql("INSERT INTO pt SELECT 20 AS id, '2024-01-02' AS d")
        parts = sorted(
            r["partition"]
            for r in env.execute_sql("SHOW PARTITIONS pt").collect()
        )
        assert parts == ["d=2024-01-01", "d=2024-01-02"]

        env.execute_sql("ALTER TABLE pt ADD PARTITION (d='2024-01-03')")
        parts = sorted(
            r["partition"]
            for r in env.execute_sql("SHOW PARTITIONS pt").collect()
        )
        assert parts == ["d=2024-01-01", "d=2024-01-02", "d=2024-01-03"]
        # duplicate add: error without IF NOT EXISTS, no-op with
        with pytest.raises(ValueError, match="already exists"):
            env.execute_sql("ALTER TABLE pt ADD PARTITION (d='2024-01-03')")
        env.execute_sql(
            "ALTER TABLE pt ADD IF NOT EXISTS PARTITION (d='2024-01-03')"
        )
        # data lands in the added partition and a pruned read returns it
        env.execute_sql("INSERT INTO pt PARTITION (d='2024-01-03') SELECT 30 AS id")
        got = env.sql_query("SELECT id FROM pt WHERE d = '2024-01-03'").collect()
        assert [r["id"] for r in got] == [30]
        # the partition filter reaches the scan (pruned, not post-filtered)
        plan = env.sql_query(
            "SELECT id FROM pt WHERE d = '2024-01-03'"
        ).to_df()._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "2024-01-03" in plan

        env.execute_sql("ALTER TABLE pt DROP PARTITION (d='2024-01-01')")
        parts = sorted(
            r["partition"]
            for r in env.execute_sql("SHOW PARTITIONS pt").collect()
        )
        assert parts == ["d=2024-01-02", "d=2024-01-03"]
        assert not os.path.isdir(f"{base}/pt/d=2024-01-01")
        with pytest.raises(ValueError, match="does not exist"):
            env.execute_sql("ALTER TABLE pt DROP PARTITION (d='2024-01-01')")
        env.execute_sql("ALTER TABLE pt DROP IF EXISTS PARTITION (d='2024-01-01')")
        # non-key spec is rejected (catalog partition-key validation)
        with pytest.raises(ValueError, match="not a partition key"):
            env.execute_sql("ALTER TABLE pt ADD PARTITION (id=5)")
        # SHOW CREATE TABLE round-trips the PARTITIONED BY clause
        ddl = env.execute_sql("SHOW CREATE TABLE pt").collect()[0][0]
        assert "PARTITIONED BY (d)" in ddl
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_partitioned_insert_overwrite_is_dynamic(spark):
    """INSERT OVERWRITE on a PARTITIONED BY table replaces only the
    partitions present in the new data (FileSystemTableSink's dynamic
    overwrite), not the whole table."""
    base = tempfile.mkdtemp(prefix="fps_ddl_ovw_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "po", base, "id INT, d STRING", partitions=["d"])
        env.execute_sql("INSERT INTO po SELECT 1 AS id, 'a' AS d")
        env.execute_sql("INSERT INTO po SELECT 2 AS id, 'b' AS d")
        env.execute_sql("INSERT OVERWRITE po SELECT 9 AS id, 'b' AS d")
        got = sorted(
            (r["d"], r["id"]) for r in env.sql_query("SELECT * FROM po").collect()
        )
        assert got == [("a", 1), ("b", 9)]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_change_column_retype_rename_reorder(spark):
    """ALTER TABLE CHANGE [COLUMN] (SqlChangeColumn.java): retype in
    place, rename, AFTER reorder; renames of watermark/computed anchors
    are rejected like the reference's schema re-validation."""
    base = tempfile.mkdtemp(prefix="fps_ddl_chg_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "ct", base, "id INT, v DOUBLE, tag STRING")
        env.execute_sql("INSERT INTO ct SELECT 1, 2.5, 'x'")
        # retype: DOUBLE -> STRING surfaces the catalog type on scan
        env.execute_sql("ALTER TABLE ct CHANGE COLUMN v v DOUBLE COMMENT 'amt'")
        assert "v DOUBLE" in env.catalog["ct"].schema_ddl
        # rename tag -> label
        env.execute_sql("ALTER TABLE ct CHANGE tag label STRING")
        cols = [c.strip().split()[0] for c in env.catalog["ct"].schema_ddl.split(",")]
        assert cols == ["id", "v", "label"]
        # reorder: move v after label
        env.execute_sql("ALTER TABLE ct CHANGE v v DOUBLE AFTER label")
        cols = [c.strip().split()[0] for c in env.catalog["ct"].schema_ddl.split(",")]
        assert cols == ["id", "label", "v"]
        env.execute_sql("ALTER TABLE ct CHANGE id id INT FIRST")
        cols = [c.strip().split()[0] for c in env.catalog["ct"].schema_ddl.split(",")]
        assert cols[0] == "id"
        with pytest.raises(ValueError, match="no column"):
            env.execute_sql("ALTER TABLE ct CHANGE nope nope INT")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_change_column_with_parameterized_types(spark):
    """Schema manipulation must split column definitions on TOP-LEVEL
    commas only — DECIMAL(10,2) in a neighbor's type must not corrupt a
    CHANGE/constraint/positional-INSERT pass."""
    base = tempfile.mkdtemp(prefix="fps_ddl_dec_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "dt", base, "amt DECIMAL(10,2), id INT, tag STRING")
        env.execute_sql("INSERT INTO dt SELECT CAST(1.25 AS DECIMAL(10,2)), 1, 'x'")
        env.execute_sql("ALTER TABLE dt CHANGE tag label STRING")
        cols = [
            c.strip().split()[0]
            for c in env.catalog["dt"].schema_ddl.split(", ")
        ]
        assert cols == ["amt", "id", "label"]
        # the DECIMAL column's definition survived intact
        assert "amt DECIMAL(10,2)" in env.catalog["dt"].schema_ddl
        env.execute_sql(
            "ALTER TABLE dt ADD CONSTRAINT pk_dt PRIMARY KEY (id) NOT ENFORCED"
        )
        # rename is metadata-only (Hive semantics): parquet maps columns
        # by NAME, so pre-rename files read the renamed column as null;
        # rows written after the rename carry it
        row = env.sql_query("SELECT id, label, amt FROM dt").collect()[0]
        assert (row["id"], row["label"]) == (1, None)
        assert float(row["amt"]) == 1.25  # neighbor type intact end-to-end
        env.execute_sql(
            "INSERT INTO dt SELECT CAST(2.50 AS DECIMAL(10,2)), 2, 'y'"
        )
        got = {
            r["id"]: r["label"]
            for r in env.sql_query("SELECT id, label FROM dt").collect()
        }
        assert got == {1: None, 2: "y"}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_replace_columns(spark):
    """ALTER TABLE REPLACE COLUMNS (SqlAddReplaceColumns.java:39 with
    replace=true): the new list replaces the physical schema wholesale;
    dropping a watermark-anchor column is rejected."""
    base = tempfile.mkdtemp(prefix="fps_ddl_rep_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "rt", base, "id INT, v DOUBLE, tag STRING")
        env.execute_sql("INSERT INTO rt SELECT 1, 2.5, 'x'")
        env.execute_sql("ALTER TABLE rt REPLACE COLUMNS (id INT, score DOUBLE)")
        cols = [c.strip().split()[0] for c in env.catalog["rt"].schema_ddl.split(",")]
        assert cols == ["id", "score"]
        # dropped column gone from the scan; new one reads as typed null
        row = env.sql_query("SELECT * FROM rt").collect()[0]
        assert row["id"] == 1 and row["score"] is None
        assert "tag" not in row.asDict() and "v" not in row.asDict()

        env.execute_sql(
            f"""CREATE TABLE rwm (ts TIMESTAMP, v INT,
                WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
                WITH ('connector' = 'filesystem', 'path' = '{base}/rwm',
                      'format' = 'parquet')"""
        )
        with pytest.raises(ValueError, match="anchors the table watermark"):
            env.execute_sql("ALTER TABLE rwm REPLACE COLUMNS (v INT)")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_change_column_rename_blocked_by_watermark(spark):
    base = tempfile.mkdtemp(prefix="fps_ddl_wm_")
    env = TableEnvironment.create(spark=spark)
    try:
        env.execute_sql(
            f"""CREATE TABLE wt (ts TIMESTAMP, v INT,
                WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
                WITH ('connector' = 'filesystem', 'path' = '{base}/wt',
                      'format' = 'parquet')"""
        )
        with pytest.raises(ValueError, match="anchors the table watermark"):
            env.execute_sql("ALTER TABLE wt CHANGE ts event_ts TIMESTAMP")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_add_drop_constraint_metadata_only(spark):
    """ALTER TABLE ADD/DROP CONSTRAINT (SqlAlterTableAddConstraint /
    SqlAlterTableDropConstraint): NOT ENFORCED primary keys are catalog
    metadata; enforced ones are rejected exactly like the reference."""
    base = tempfile.mkdtemp(prefix="fps_ddl_pk_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "kt", base, "id INT, v DOUBLE")
        env.execute_sql(
            "ALTER TABLE kt ADD CONSTRAINT pk_kt PRIMARY KEY (id) NOT ENFORCED"
        )
        assert env.catalog["kt"].props["__primary_key"] == "id"
        with pytest.raises(ValueError, match="already has a primary key"):
            env.execute_sql(
                "ALTER TABLE kt ADD CONSTRAINT pk2 PRIMARY KEY (v) NOT ENFORCED"
            )
        with pytest.raises(ValueError, match="no constraint named"):
            env.execute_sql("ALTER TABLE kt DROP CONSTRAINT nope")
        env.execute_sql("ALTER TABLE kt DROP CONSTRAINT pk_kt")
        assert "__primary_key" not in env.catalog["kt"].props
        # enforced constraints are rejected (reference parity)
        with pytest.raises(ValueError, match="NOT ENFORCED"):
            env.execute_sql("ALTER TABLE kt ADD CONSTRAINT p PRIMARY KEY (id)")
        # unknown column is rejected
        with pytest.raises(ValueError, match="not in table schema"):
            env.execute_sql(
                "ALTER TABLE kt ADD CONSTRAINT p PRIMARY KEY (zz) NOT ENFORCED"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_alter_function_ddl(spark):
    """ALTER FUNCTION f AS '<ref>' (SqlAlterFunction.java): replaces the
    registration in place; unknown names error unless IF EXISTS."""
    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION mulfn AS "
        "'flink_parent_spark.functions.udf.double_value' LANGUAGE PYTHON"
    )
    spark.createDataFrame([(2.0,)], "v double").createOrReplaceTempView(
        "alter_fn_src"
    )
    assert env.sql_query("SELECT mulfn(v) AS r FROM alter_fn_src").collect()[0][
        "r"
    ] == 4.0
    env.execute_sql(
        "ALTER FUNCTION mulfn AS "
        "'flink_parent_spark.functions.udf.triple_value' LANGUAGE PYTHON"
    )
    assert env.sql_query("SELECT mulfn(v) AS r FROM alter_fn_src").collect()[0][
        "r"
    ] == 6.0
    with pytest.raises(ValueError, match="unknown function"):
        env.execute_sql(
            "ALTER FUNCTION no_such_fn AS "
            "'flink_parent_spark.functions.udf.triple_value' LANGUAGE PYTHON"
        )
    # IF EXISTS tolerates the missing function (no-op)
    env.execute_sql(
        "ALTER FUNCTION IF EXISTS no_such_fn AS "
        "'flink_parent_spark.functions.udf.triple_value' LANGUAGE PYTHON"
    )


def test_create_table_if_not_exists_semantics(spark):
    """TableEnvironmentImpl createTable: duplicate CREATE TABLE raises
    (TableAlreadyExistException parity), IF NOT EXISTS is a no-op that
    preserves the existing definition — never a silent replace."""
    base = tempfile.mkdtemp(prefix="fps_ddl_ine_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "it", base, "a INT")
        with pytest.raises(ValueError, match="already exists"):
            _fs_table(env, "it", base, "b DOUBLE")
        env.execute_sql(
            f"CREATE TABLE IF NOT EXISTS it (c STRING) WITH ("
            f"'connector' = 'filesystem', 'path' = '{base}/other', "
            f"'format' = 'parquet')"
        )
        # original definition intact
        assert env.catalog["it"].schema_ddl == "a INT"
        assert env.catalog["it"].path == f"{base}/it"
        # LIKE derivation honors the same contract
        with pytest.raises(ValueError, match="already exists"):
            env.execute_sql(
                f"CREATE TABLE it WITH ('path' = '{base}/x') "
                "LIKE it (OVERWRITING OPTIONS)"
            )
        env.execute_sql(
            f"CREATE TABLE IF NOT EXISTS it WITH ('path' = '{base}/x') "
            "LIKE it (OVERWRITING OPTIONS)"
        )
        assert env.catalog["it"].path == f"{base}/it"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_drop_function_and_create_view_over_temp(spark):
    """SqlDropFunction: env-registered temporary functions drop through
    DROP FUNCTION (with IF EXISTS tolerated); SqlCreateView: CREATE
    [OR REPLACE] VIEW maps to a session (temporary) view so it can
    reference DDL-catalog tables, which are temp views themselves."""
    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION ddl_drop_fn AS "
        "'flink_parent_spark.functions.udf.double_value' LANGUAGE PYTHON"
    )
    assert "ddl_drop_fn" in env.list_functions()
    env.execute_sql("DROP FUNCTION ddl_drop_fn")
    assert "ddl_drop_fn" not in env.list_functions()
    env.execute_sql("DROP FUNCTION IF EXISTS ddl_drop_fn")  # no-op

    # duplicate CREATE FUNCTION: error / IF NOT EXISTS no-op / OR REPLACE
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION dup_fn AS "
        "'flink_parent_spark.functions.udf.double_value' LANGUAGE PYTHON"
    )
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql(
            "CREATE TEMPORARY FUNCTION dup_fn AS "
            "'flink_parent_spark.functions.udf.triple_value' LANGUAGE PYTHON"
        )
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION IF NOT EXISTS dup_fn AS "
        "'flink_parent_spark.functions.udf.triple_value' LANGUAGE PYTHON"
    )
    assert env._functions["dup_fn"].endswith("double_value")  # unchanged
    env.execute_sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dup_fn AS "
        "'flink_parent_spark.functions.udf.triple_value' LANGUAGE PYTHON"
    )
    assert env._functions["dup_fn"].endswith("triple_value")
    env.execute_sql("DROP FUNCTION dup_fn")

    # DROP TABLE of a missing name: error without IF EXISTS, no-op with
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP TABLE never_created_table")
    env.execute_sql("DROP TABLE IF EXISTS never_created_table")

    spark.createDataFrame([(5,)], "v int").createOrReplaceTempView(
        "ddl_view_src"
    )
    env.execute_sql("CREATE VIEW ddl_v AS SELECT v FROM ddl_view_src")
    assert env.sql_query("SELECT v FROM ddl_v").collect()[0]["v"] == 5
    env.execute_sql(
        "CREATE OR REPLACE VIEW ddl_v AS SELECT v * 2 AS v FROM ddl_view_src"
    )
    assert env.sql_query("SELECT v FROM ddl_v").collect()[0]["v"] == 10
    # ALTER VIEW SET (AlterViewPropertiesOperation): metadata-only props
    env.execute_sql("ALTER VIEW ddl_v SET ('comment' = 'doubled')")
    assert env._view_props["ddl_v"] == {"comment": "doubled"}
    env.execute_sql("ALTER VIEW ddl_v RENAME TO ddl_v2")
    assert env._view_props["ddl_v2"] == {"comment": "doubled"}
    with pytest.raises(ValueError, match="unknown view"):
        env.execute_sql("ALTER VIEW ddl_gone SET ('k' = 'v')")
    spark.catalog.dropTempView("ddl_v2")
    spark.catalog.dropTempView("ddl_view_src")


def test_create_catalog_jdbc_sql_flow(spark):
    """CREATE CATALOG ... WITH ('type'='jdbc') -> USE CATALOG -> query:
    the r5 JdbcCatalog pytest flow expressed entirely in SQL texts
    (SqlCreateCatalog.java done-criterion)."""
    db = os.path.join(tempfile.gettempdir(), "fps_ddl_cat_db")
    shutil.rmtree(db, ignore_errors=True)
    url = f"jdbc:derby:{db};create=true"
    spark.range(0, 7).selectExpr("id", "CAST(id * 2 AS DOUBLE) AS v") \
        .write.format("jdbc").option("url", url) \
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver") \
        .option("dbtable", "products").mode("overwrite").save()

    env = TableEnvironment.create(spark=spark)
    env.execute_sql(
        f"CREATE CATALOG derby_sql_cat WITH ('type' = 'jdbc', "
        f"'base-url' = '{url}')"  # driver inferred from the derby url
    )
    cats = {r["catalog_name"] for r in env.execute_sql("SHOW CATALOGS").collect()}
    assert "derby_sql_cat" in cats
    env.execute_sql("USE CATALOG derby_sql_cat")
    n = env.sql_query("SELECT COUNT(*) AS n FROM products").collect()[0]["n"]
    assert n == 7
    # current catalog cannot be dropped (CatalogManager parity)
    with pytest.raises(ValueError, match="current catalog"):
        env.execute_sql("DROP CATALOG derby_sql_cat")
    env.execute_sql("USE CATALOG default_catalog")
    env.execute_sql("DROP CATALOG derby_sql_cat")
    assert "derby_sql_cat" not in {
        r["catalog_name"] for r in env.execute_sql("SHOW CATALOGS").collect()
    }
    with pytest.raises(ValueError, match="unknown catalog"):
        env.execute_sql("DROP CATALOG derby_sql_cat")
    env.execute_sql("DROP CATALOG IF EXISTS derby_sql_cat")
    # a missing catalog whose NAME contains 'if' must still error
    # without the IF EXISTS clause (no substring sniffing)
    with pytest.raises(ValueError, match="unknown catalog"):
        env.execute_sql("DROP CATALOG gift_cat")
    # duplicate create / unsupported type are rejected
    env.execute_sql("CREATE CATALOG mem_cat WITH ('type' = 'generic_in_memory')")
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("CREATE CATALOG mem_cat WITH ('type' = 'generic_in_memory')")
    with pytest.raises(ValueError, match="unsupported type"):
        env.execute_sql("CREATE CATALOG x_cat WITH ('type' = 'iceberg')")
    # DESCRIBE CATALOG (SqlDescribeCatalog.java): info rows
    info = {
        r["info_name"]: r["info_value"]
        for r in env.execute_sql("DESCRIBE CATALOG mem_cat").collect()
    }
    assert info == {"name": "mem_cat", "type": "session"}
    info = {
        r["info_name"]: r["info_value"]
        for r in env.execute_sql("DESCRIBE CATALOG default_catalog").collect()
    }
    assert info["type"] == "generic_in_memory"
    with pytest.raises(ValueError, match="unknown catalog"):
        env.execute_sql("DESCRIBE CATALOG nope_cat")


def test_like_partitions_strategy_and_partial_show(spark):
    """CREATE TABLE ... LIKE inherits/excludes PARTITIONED BY per the
    PARTITIONS feature option (SqlTableLike.java:150; OVERWRITING is an
    invalid combination, invalidCombinations:193), and SHOW PARTITIONS
    accepts a partial spec filter over a two-key layout."""
    base = tempfile.mkdtemp(prefix="fps_ddl_like_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(
            env, "lp", base, "id INT, region STRING, d STRING",
            partitions=["region", "d"],
        )
        env.execute_sql("INSERT INTO lp SELECT 1, 'us', '2024-01-01'")
        env.execute_sql("INSERT INTO lp SELECT 2, 'us', '2024-01-02'")
        env.execute_sql("INSERT INTO lp SELECT 3, 'eu', '2024-01-01'")
        parts = sorted(
            r["partition"]
            for r in env.execute_sql("SHOW PARTITIONS lp").collect()
        )
        assert parts == [
            "region=eu/d=2024-01-01",
            "region=us/d=2024-01-01",
            "region=us/d=2024-01-02",
        ]
        # partial spec: only one key bound
        us_parts = sorted(
            r["partition"]
            for r in env.execute_sql(
                "SHOW PARTITIONS lp PARTITION (region='us')"
            ).collect()
        )
        assert us_parts == ["region=us/d=2024-01-01", "region=us/d=2024-01-02"]
        d_parts = sorted(
            r["partition"]
            for r in env.execute_sql(
                "SHOW PARTITIONS lp PARTITION (d='2024-01-01')"
            ).collect()
        )
        assert d_parts == ["region=eu/d=2024-01-01", "region=us/d=2024-01-01"]
        with pytest.raises(ValueError, match="not a partition key"):
            env.execute_sql("SHOW PARTITIONS lp PARTITION (nope='x')")

        # mixed static+dynamic INSERT: region bound statically, d dynamic
        env.execute_sql(
            "INSERT INTO lp PARTITION (region='sa') SELECT 7, '2024-03-01'"
        )
        got = env.sql_query(
            "SELECT id FROM lp WHERE region = 'sa' AND d = '2024-03-01'"
        ).collect()
        assert [r["id"] for r in got] == [7]

        # LIKE inherits the partition keys by default (INCLUDING ALL);
        # repointing 'path' needs OVERWRITING OPTIONS (INCLUDING rejects
        # the conflicting duplicate key, reference parity)
        with pytest.raises(ValueError, match="conflicting keys"):
            env.execute_sql(
                f"CREATE TABLE lp_dup WITH ('path' = '{base}/lp_dup') LIKE lp"
            )
        env.execute_sql(
            f"CREATE TABLE lp_inc WITH ('path' = '{base}/lp_inc') "
            "LIKE lp (OVERWRITING OPTIONS)"
        )
        assert env.catalog["lp_inc"].partitions == ["region", "d"]
        env.execute_sql("INSERT INTO lp_inc SELECT 9, 'ap', '2024-02-01'")
        got = sorted(
            r["partition"]
            for r in env.execute_sql("SHOW PARTITIONS lp_inc").collect()
        )
        assert got == ["region=ap/d=2024-02-01"]
        # EXCLUDING PARTITIONS drops the keys
        env.execute_sql(
            f"CREATE TABLE lp_exc WITH ('path' = '{base}/lp_exc') "
            "LIKE lp (OVERWRITING OPTIONS, EXCLUDING PARTITIONS)"
        )
        assert env.catalog["lp_exc"].partitions == []
        # OVERWRITING PARTITIONS / OVERWRITING ALL are invalid combinations
        with pytest.raises(ValueError, match="not a valid combination"):
            env.execute_sql(
                f"CREATE TABLE lp_bad WITH ('path' = '{base}/b') "
                "LIKE lp (OVERWRITING OPTIONS, OVERWRITING PARTITIONS)"
            )
        with pytest.raises(ValueError, match="OVERWRITING ALL"):
            env.execute_sql(
                f"CREATE TABLE lp_bad2 WITH ('path' = '{base}/b2') "
                "LIKE lp (OVERWRITING ALL)"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_module_system_veneer(spark):
    """FLIP-68 loadModule/unloadModule/listModules (ModuleManager.java:
    64,85,100): load order preserved, duplicate load and missing unload
    raise, and the core module's function set is the live registry."""
    env = TableEnvironment.create(spark=spark)
    assert env.list_modules() == ["core"]
    env.load_module("hive")  # marker: Spark's built-ins subsume HiveQL's
    assert env.list_modules() == ["core", "hive"]
    with pytest.raises(ValueError, match="already exists"):
        env.load_module("hive")
    fns = env.list_module_functions()
    assert "abs" in fns and "concat" in fns  # registry-backed core module
    env.unload_module("hive")
    assert env.list_modules() == ["core"]
    with pytest.raises(ValueError, match="No module with name"):
        env.unload_module("hive")
    # a custom module contributes its functions to the union
    class M:
        def list_functions(self):
            return ["my_special_fn"]

    env.load_module("custom", M())
    assert "my_special_fn" in env.list_module_functions()


def test_drop_table_spark_catalog_passthrough(spark):
    """DROP TABLE on a table known only to Spark's catalog (not the DDL
    catalog) must actually drop the object — r11 took the catalog.pop +
    dropTempView no-op path, so metastore/temp-view tables survived a
    statement that reported success (ADVICE r11)."""
    env = TableEnvironment.create(spark=spark)
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("dtp_v")
    assert spark.catalog.tableExists("dtp_v")
    env.execute_sql("DROP TABLE dtp_v")
    assert not spark.catalog.tableExists("dtp_v")
    # IF EXISTS on a genuinely-missing name stays a silent no-op
    env.execute_sql("DROP TABLE IF EXISTS dtp_missing")
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP TABLE dtp_missing")


def test_drop_temporary_system_function_if_exists(spark):
    """DROP TEMPORARY SYSTEM FUNCTION IF EXISTS f: Spark cannot parse the
    SYSTEM keyword, so r11 silently skipped the drop on the IF EXISTS
    branch; the SYSTEM token must be stripped before pass-through so the
    function is really gone (SqlDropFunction / ADVICE r11)."""
    env = TableEnvironment.create(spark=spark)
    spark.udf.register("dtsf_fn", lambda x: x + 1, "int")
    assert spark.sql("SELECT dtsf_fn(1) AS v").collect()[0]["v"] == 2
    env.execute_sql("DROP TEMPORARY SYSTEM FUNCTION IF EXISTS dtsf_fn")
    with pytest.raises(Exception):
        spark.sql("SELECT dtsf_fn(1)").collect()
    # and the IF EXISTS path on a missing name still no-ops cleanly
    env.execute_sql("DROP TEMPORARY SYSTEM FUNCTION IF EXISTS dtsf_missing")


def test_like_overwriting_constraints_rejected(spark):
    """SqlTableLike invalidCombinations:194-195 also lists OVERWRITING
    CONSTRAINTS; r11 silently treated it as INCLUDING (ADVICE r11)."""
    base = tempfile.mkdtemp(prefix="fps_like_con_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "lcon", base, "id INT, v STRING")
        with pytest.raises(ValueError, match="OVERWRITING CONSTRAINTS"):
            env.execute_sql(
                f"CREATE TABLE lcon2 WITH ('path' = '{base}/lcon2') "
                "LIKE lcon (OVERWRITING CONSTRAINTS)"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_insert_positional_arity_mismatch_raises(spark):
    """INSERT with a column count different from the declared schema is a
    validation error in the reference (SqlInsert column-count check);
    r11 silently fell back to by-name writes (ADVICE r11)."""
    base = tempfile.mkdtemp(prefix="fps_ins_arity_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "ia", base, "id INT, v STRING, w DOUBLE")
        with pytest.raises(ValueError, match="3 are\\s+expected|expected"):
            env.execute_sql("INSERT INTO ia SELECT 1 AS id, 'a' AS v")
        # the exact-arity insert still works positionally
        env.execute_sql("INSERT INTO ia SELECT 1, 'a', 2.5")
        row = env.execute_sql("SELECT * FROM ia").collect()[0]
        assert (row["id"], row["v"], row["w"]) == (1, "a", 2.5)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_alter_view_set_rejects_table(spark):
    """ALTER VIEW ... SET against a DDL table must be rejected — DDL
    tables are temp-view-backed so tableExists() alone cannot tell a
    view from a table (reference rejects ALTER VIEW on non-views)."""
    base = tempfile.mkdtemp(prefix="fps_av_tbl_")
    env = TableEnvironment.create(spark=spark)
    try:
        _fs_table(env, "avt", base, "id INT")
        with pytest.raises(ValueError, match="is a table"):
            env.execute_sql("ALTER VIEW avt SET ('k' = 'v')")
        # a real view still accepts SET
        env.execute_sql("CREATE VIEW avt_v AS SELECT 1 AS one")
        env.execute_sql("ALTER VIEW avt_v SET ('k' = 'v')")
        assert env._view_props["avt_v"]["k"] == "v"
    finally:
        shutil.rmtree(base, ignore_errors=True)
