"""User management + role permissions (SURVEY.md §2.11, r16).

≙ reference `yupana-core/src/test/scala/.../auth/PermissionServiceTest.scala`
plus the UserManager semantics exercised by `QueryEngineRouter` — the role
matrix, the registry CRUD with the reference's exact error strings, the
grammar's quoting rules, credential validation, persistence across engine
instances over one warehouse root, and the SQL dispatch's per-statement
permission checks."""

import pytest

from yupana_spark.auth import (ANONYMOUS, AuthError, PermissionService,
                               UserManager, YupanaUser, hash_password,
                               role_by_name, verify_password)


def test_role_matrix_matches_reference():
    """TsdbRole.scala:17-52: DISABLED nothing; READ_ONLY table/meta/query
    reads (meta is All); READ_WRITE adds table write; ADMIN everything —
    and the put_enabled correction only ever gates table writes."""
    ps = PermissionService(put_enabled=True)

    def allowed(role, subject, action):
        return ps.has_permission(YupanaUser("u", None, role), subject, action)

    for subject in ("table", "user", "metadata", "queries"):
        for action in ("read", "write"):
            assert not allowed("DISABLED", subject, action)
            assert allowed("ADMIN", subject, action)
    assert allowed("READ_ONLY", "table", "read")
    assert not allowed("READ_ONLY", "table", "write")
    assert allowed("READ_ONLY", "metadata", "write")   # meta = All
    assert allowed("READ_ONLY", "queries", "read")
    assert not allowed("READ_ONLY", "queries", "write")
    assert not allowed("READ_ONLY", "user", "read")
    assert allowed("READ_WRITE", "table", "write")
    assert not allowed("READ_WRITE", "user", "write")
    # the putEnabled correction (PermissionService.scala:36-41)
    ps_ro = PermissionService(put_enabled=False)
    assert not ps_ro.has_permission(YupanaUser("u", None, "ADMIN"),
                                    "table", "write")
    assert ps_ro.has_permission(YupanaUser("u", None, "ADMIN"),
                                "table", "read")
    # ANONYMOUS ≙ YupanaUser.ANONYMOUS: read-only
    assert ps.has_permission(ANONYMOUS, "table", "read")
    assert not ps.has_permission(ANONYMOUS, "table", "write")
    # unknown role object -> nothing (defensive, not reachable via SQL)
    assert not ps.has_permission(YupanaUser("u", None, "BOGUS"),
                                 "table", "read")
    assert role_by_name("read_only") == "READ_ONLY"
    assert role_by_name("nope") is None


def test_password_hashing_roundtrip():
    h = hash_password("s3cret")
    assert h.startswith("pbkdf2$") and h != hash_password("s3cret")  # salted
    assert verify_password("s3cret", h)
    assert not verify_password("wrong", h)
    assert not verify_password("s3cret", "garbage")
    assert not verify_password("s3cret", "")


def test_user_manager_crud_and_errors(tmp_path):
    um = UserManager(str(tmp_path), superuser="anonymous")
    u = um.create_user("alice", "pw", "READ_ONLY")
    assert (u.name, u.role) == ("alice", "READ_ONLY")
    # default role is DISABLED (UserManager.scala:28: getOrElse(Disabled))
    assert um.create_user("bob", None, None).role == "DISABLED"
    with pytest.raises(AuthError, match="User already exists"):
        um.create_user("alice", None, None)
    with pytest.raises(AuthError, match="User already exists"):
        um.create_user("anonymous", None, None)      # superuser collision
    with pytest.raises(AuthError, match="Invalid role name 'SUPER'"):
        um.create_user("eve", None, "SUPER")
    with pytest.raises(AuthError, match="User not found"):
        um.update_user("ghost", "pw", None)
    with pytest.raises(AuthError, match="Invalid role name"):
        um.update_user("alice", None, "SUPER")
    um.update_user("alice", "pw2", "ADMIN")
    assert um.find_user("alice").role == "ADMIN"
    assert um.validate_user("alice", "pw") is None
    assert um.validate_user("alice", "pw2").role == "ADMIN"
    assert um.validate_user("ghost", "pw") is None
    # the config superuser validates on the raw pair, never stored
    assert um.validate_user("anonymous", None).role == "ADMIN"
    assert um.validate_user("anonymous", "wrong") is None
    assert [x.name for x in um.list_users()] == ["alice", "bob"]
    assert um.delete_user("bob") and not um.delete_user("bob")
    # persistence: a second manager over the same root sees the registry
    um2 = UserManager(str(tmp_path), superuser="anonymous")
    assert um2.find_user("alice").role == "ADMIN"
    assert um2.count() == 1


def test_sql_user_ddl_roundtrip(tsdb):
    """The full SQL surface: CREATE/ALTER/DROP USER + SHOW USERS through
    Tsdb.sql, with the reference's STATUS='OK' single-row answers and
    error strings, leaving the registry as found."""
    assert [tuple(r) for r in tsdb.sql("SHOW USERS").collect()] \
        == [("anonymous", "ADMIN")]
    try:
        out = tsdb.sql("CREATE USER 'carla' WITH PASSWORD 'p1' "
                       "WITH ROLE 'READ_WRITE'")
        assert [tuple(r) for r in out.collect()] == [("OK",)]
        tsdb.sql("CREATE USER 'dan' WITH ROLE 'read_only' "
                 "WITH PASSWORD 'p2'")
        assert [tuple(r) for r in tsdb.sql("SHOW USERS").collect()] == [
            ("anonymous", "ADMIN"), ("carla", "READ_WRITE"),
            ("dan", "READ_ONLY")]
        tsdb.sql("ALTER USER 'dan' SET ROLE = 'ADMIN' SET PASSWORD = 'p3'")
        assert tsdb.user_manager.validate_user("dan", "p3").role == "ADMIN"
        with pytest.raises(AuthError, match="already exists"):
            tsdb.sql("CREATE USER 'carla'")
        with pytest.raises(AuthError, match="User not found"):
            tsdb.sql("ALTER USER 'ghost' SET PASSWORD = 'x'")
        with pytest.raises(AuthError, match="User not found"):
            tsdb.sql("DROP USER 'ghost'")
    finally:
        tsdb.sql("DROP USER 'carla'")
        tsdb.sql("DROP USER 'dan'")
    assert [tuple(r) for r in tsdb.sql("SHOW USERS").collect()] \
        == [("anonymous", "ADMIN")]


def test_sql_permission_enforcement(tsdb):
    """Tsdb.sql(user=...) scopes every statement kind to the role matrix
    (QueryEngineRouter.scala:64-118's subject/action pairs)."""
    ro = YupanaUser("ro", None, "READ_ONLY")
    off = YupanaUser("off", None, "DISABLED")
    # READ_ONLY: selects + metadata fine, queries read fine
    assert tsdb.sql("SELECT 1 AS x", user=ro).count() == 1
    assert tsdb.sql("SHOW TABLES", user=ro).count() > 0
    tsdb.sql("SHOW QUERIES", user=ro)
    for denied in ("CREATE USER 'zz9'", "SHOW USERS",
                   "KILL QUERY WHERE QUERY_ID = 'x'",
                   "DELETE QUERIES WHERE QUERY_ID = 'x'"):
        with pytest.raises(AuthError, match="enough permissions"):
            tsdb.sql(denied, user=ro)
    with pytest.raises(AuthError, match="enough permissions"):
        tsdb.sql("SELECT 1 AS x", user=off)
    with pytest.raises(AuthError, match="enough permissions"):
        tsdb.sql("SHOW TABLES", user=off)


def test_user_ddl_grammar_rejects():
    """The reference's quoting rules are parse-time errors
    (SqlParser.scala:107-108): unquoted names, one-char names, names not
    starting with a letter, and bare ALTER without SET all reject."""
    from yupana_spark.sql.parser import SqlParseError, parse

    for bad in ("CREATE USER foo", "CREATE USER 'x'", "CREATE USER '1ab'",
                "DROP USER bob", "ALTER USER 'ab'",
                "CREATE USER 'ab' WITH", "CREATE TABLE t (x int)"):
        with pytest.raises(SqlParseError):
            parse(bad)
    # role strings parse with the username rule — quoted, letter-first
    with pytest.raises(SqlParseError):
        parse("CREATE USER 'ab' WITH ROLE READ_ONLY")


def test_auth_error_sqlstates(tmp_path):
    """AuthError carries the PostgreSQL error class the wire front-end
    sends (review r16): permission denials are 42501, a duplicate
    create is 42710 duplicate_object, a missing user 42704
    undefined_object, a bad role 22023 invalid_parameter_value."""
    um = UserManager(str(tmp_path))
    um.create_user("alice", "pw", "READ_ONLY")
    with pytest.raises(AuthError) as e:
        um.create_user("alice", None, None)
    assert e.value.sqlstate == "42710"
    with pytest.raises(AuthError) as e:
        um.update_user("ghost", "pw", None)
    assert e.value.sqlstate == "42704"
    with pytest.raises(AuthError) as e:
        um.create_user("eve", None, "SUPER")
    assert e.value.sqlstate == "22023"
    with pytest.raises(AuthError) as e:
        PermissionService().check(YupanaUser("u", None, "READ_ONLY"),
                                  "user", "write")
    assert e.value.sqlstate == "42501"


def test_set_is_admin_gated(tsdb):
    """SET applies the (session-global) Spark conf for ADMIN only; any
    lower role gets the reference wire server's acknowledged-no-op
    (MessageHandler.scala:230 never applies SET at all) — review r16:
    a READ_ONLY login must not flip shared session state."""
    key = "yupana.test.set_gate"
    ro = YupanaUser("ro", None, "READ_ONLY")
    out = tsdb.sql(f"SET {key}='ro_value'", user=ro)
    assert [tuple(r) for r in out.collect()] == [(key, "ro_value")]
    assert tsdb.spark.conf.get(key, None) is None      # echo only
    tsdb.sql(f"SET {key}='admin_value'")                 # engine = ADMIN
    assert tsdb.spark.conf.get(key) == "admin_value"
    tsdb.sql(f"SET {key}='ro_again'", user=ro)
    assert tsdb.spark.conf.get(key) == "admin_value"   # unchanged
    tsdb.spark.conf.unset(key)


def test_validate_user_superuser_override_and_unknown_cost(tmp_path):
    """validate_user's superuser_password override (the wire server's
    bootstrap credential) matches constant-time against the engine
    identity without mutating the manager; unknown users still verify
    against a dummy hash so the miss is not a free timing probe."""
    um = UserManager(str(tmp_path), superuser="anonymous")
    assert um.validate_user("anonymous", "boot",
                            superuser_password="boot").role == "ADMIN"
    assert um.validate_user("anonymous", "wrong",
                            superuser_password="boot") is None
    # the override is per-call: the instance pair is unchanged (None)
    assert um.validate_user("anonymous", None).role == "ADMIN"
    assert um.validate_user("anonymous", "boot") is None
    assert um.validate_user("ghost", "anything") is None


def test_cross_instance_registry_freshness(tmp_path):
    """Two managers over one root (two engines sharing a warehouse):
    each mutation re-reads the authoritative file under the cross-
    process flock, so same-second interleaved writes never lose an
    update and a revoked password is observed immediately."""
    a = UserManager(str(tmp_path))
    b = UserManager(str(tmp_path))
    a.create_user("u1", "pw", "READ_ONLY")
    b.create_user("u2", "pw", "READ_ONLY")     # must not clobber u1
    a.update_user("u2", "pw9", "ADMIN")        # a sees b's user
    assert {u.name for u in a.list_users()} == {"u1", "u2"}
    assert b.validate_user("u2", "pw") is None          # revoked
    assert b.validate_user("u2", "pw9").role == "ADMIN"
    assert b.delete_user("u1")
    assert a.find_user("u1") is None


# -- grammar round-trip law (hypothesis) -------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_uname = st.from_regex(r"[A-Za-z][A-Za-z0-9_\-]{1,15}", fullmatch=True)
_pw = st.text(min_size=0, max_size=30).filter(lambda s: "\x00" not in s)
_role = st.sampled_from(["ADMIN", "READ_ONLY", "READ_WRITE", "DISABLED",
                         "admin", "read_only"])


def _q(s: str) -> str:
    """Render a SQL string literal for the lexer's '\\.'|[^'\\] rule."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


@settings(max_examples=120, deadline=None)
@given(name=_uname, pw=_pw, role=_role, order=st.booleans(),
       which=st.sampled_from(["create", "alter", "drop"]))
def test_user_ddl_grammar_roundtrip_law(name, pw, role, order, which):
    """Any valid (name, password, role) rendered in either clause order
    parses back to exactly the intended AST — the grammar neither drops
    nor reorders nor mangles operands (passwords round-trip arbitrary
    text through the literal escapes)."""
    from yupana_spark.sql import ast as A
    from yupana_spark.sql.parser import parse

    if which == "drop":
        assert parse(f"DROP USER {_q(name)}") == A.DropUser(name)
    elif which == "create":
        stmt = (f"CREATE USER {_q(name)} WITH PASSWORD {_q(pw)} "
                f"WITH ROLE {_q(role)}" if order else
                f"CREATE USER {_q(name)} WITH ROLE {_q(role)} "
                f"WITH PASSWORD {_q(pw)}")
        assert parse(stmt) == A.CreateUser(name, pw, role)
    else:
        stmt = (f"ALTER USER {_q(name)} SET PASSWORD = {_q(pw)} "
                f"SET ROLE = {_q(role)}" if order else
                f"ALTER USER {_q(name)} SET ROLE = {_q(role)} "
                f"SET PASSWORD = {_q(pw)}")
        assert parse(stmt) == A.AlterUser(name, pw, role)


def test_concurrent_mutations_no_lost_updates(tmp_path):
    """12 creates racing across 4 manager instances (4 in-process locks,
    one shared registry file — the shape of a threaded wire server on a
    shared warehouse): the per-mutation flock + fresh reload must
    serialize the read-modify-writes so no create is lost and no
    spurious 'already exists' fires."""
    import threading

    mgrs = [UserManager(str(tmp_path)) for _ in range(4)]
    errs = []

    def work(i):
        try:
            mgrs[i % 4].create_user(f"u{i:02d}", None, "READ_ONLY")
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errs.append(e)

    ts = [threading.Thread(target=work, args=(i,)) for i in range(12)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert {u.name for u in mgrs[0].list_users()} \
        == {f"u{i:02d}" for i in range(12)}
    # racing deletes of ONE name across all four instances (actually on
    # threads — review r16: a sequential loop never exercises the
    # delete path's read-modify-write): exactly one wins
    oks = []
    dts = [threading.Thread(target=lambda m=m: oks.append(
        m.delete_user("u00"))) for m in mgrs]
    for t in dts:
        t.start()
    for t in dts:
        t.join()
    assert sorted(oks) == [False, False, False, True]
    assert mgrs[3].find_user("u00") is None
