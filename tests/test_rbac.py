"""RBAC emulation unit tests (testkit/rbac.py).

Shapes follow the reference account suites (05_ddl / 06_show): role
inheritance with cycle detection, privilege merge order, ownership
transfer, and the SSH-style public-key fingerprint.
"""

import pytest

from databend_spark.testkit.rbac import RBAC


def test_role_cycle_detection(spark):
    r = RBAC()
    r.handle(spark, "create role a")
    r.handle(spark, "create role b")
    r.handle(spark, "grant role a to role b")
    with pytest.raises(ValueError, match="cycle"):
        r.handle(spark, "grant role b to role a")


def test_reserved_role_names(spark):
    r = RBAC()
    for bad in ("account_admin", "Public"):
        with pytest.raises(ValueError, match="2217"):
            r.handle(spark, f"create role '{bad}'")


def test_grant_merge_renders_in_bit_order(spark):
    r = RBAC()
    r.handle(spark, "create role a")
    r.handle(spark, "grant insert on *.* to role a")
    r.handle(spark, "grant select on *.* to role a")
    rows = r._grant_rows("role", "a")
    # SELECT (bit 2) renders before INSERT (bit 3)
    assert any("GRANT SELECT,INSERT ON *.*" in x[5] for x in rows)


def test_ownership_moves_between_roles(spark):
    r = RBAC()
    r.handle(spark, "create role a")
    r.handle(spark, "create role b")
    r.handle(spark, "grant ownership on default.t to role a")
    assert r.owners[("table", "default", "t")] == "a"
    r.handle(spark, "grant ownership on default.t to role b")
    assert r.owners[("table", "default", "t")] == "b"


def test_user_lifecycle_and_roles(spark):
    r = RBAC()
    r.handle(spark, "create user 'u1' identified by 'pw'")
    r.handle(spark, "create role r1")
    r.handle(spark, "grant role r1 to u1")
    assert "r1" in r.users["u1"]["roles"]
    r.handle(spark, "drop role if exists r1")
    assert "r1" not in r.users["u1"]["roles"]
    with pytest.raises(ValueError, match="2202"):
        r.handle(spark, "create user 'u1' identified by 'pw'")


def test_current_role_falls_back_to_public(spark):
    r = RBAC()
    r.handle(spark, "create role s1")
    r.handle(spark, "set role s1")
    assert r.current_role == "s1"
    r.handle(spark, "drop role s1")
    assert r.current_role == "public"
    assert r.preprocess("select current_role()") == "select 'public'"
