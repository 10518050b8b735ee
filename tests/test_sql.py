"""SQL frontend (arrow_tpu/sql.py) — every clause lowers onto engine
kernels; results checked against hand-computed/pyarrow expectations."""

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.errors import ArrowInvalid
from arrow_tpu.sql import execute_sql


@pytest.fixture()
def db():
    orders = at.Table.from_pydict({
        "id": np.arange(10, dtype=np.int64),
        "cust": np.array([1, 2, 1, 3, 2, 1, 3, 3, 2, 1], np.int64),
        "amount": np.array([10.0, 20.5, 5.0, 7.25, 100.0, 1.0, 8.0,
                            9.5, 30.0, 2.5]),
        "tag": ["aa", "ab", "ba", "bb", "aa", "ab", "ba", "bb",
                "aa", "cc"],
    })
    custs = at.Table.from_pydict({
        "cid": np.array([1, 2, 3, 4], np.int64),
        "name": ["ann", "bob", "cat", "dan"],
    })
    return {"orders": orders, "custs": custs}


def q(db, sql):
    return execute_sql(db, sql).to_pydict()


def test_select_star_where_and_or(db):
    r = q(db, "SELECT * FROM orders WHERE cust = 1 AND amount > 2 "
             "OR id = 3")
    assert r["id"] == [0, 2, 3, 9]


def test_expressions_and_aliases(db):
    r = q(db, "SELECT id, amount * 2 + 1 AS x, -id AS neg FROM orders "
             "WHERE id < 3")
    assert r["x"] == [21.0, 42.0, 11.0]
    assert r["neg"] == [0, -1, -2]


def test_in_between_like_isnull(db):
    r = q(db, "SELECT id FROM orders WHERE cust IN (2, 3)")
    assert r["id"] == [1, 3, 4, 6, 7, 8]
    r = q(db, "SELECT id FROM orders WHERE amount BETWEEN 5 AND 10")
    assert r["id"] == [0, 2, 3, 6, 7]
    r = q(db, "SELECT id FROM orders WHERE tag LIKE 'a%'")
    assert r["id"] == [0, 1, 4, 5, 8]
    r = q(db, "SELECT id FROM orders WHERE tag NOT LIKE '%b'")
    assert r["id"] == [0, 2, 4, 6, 8, 9]
    r = q(db, "SELECT id FROM orders WHERE tag IS NOT NULL LIMIT 2")
    assert r["id"] == [0, 1]


def test_group_by_aggregates(db):
    r = q(db, "SELECT cust, SUM(amount) AS total, COUNT(*) AS n, "
             "MIN(amount) AS lo, AVG(amount) AS mean FROM orders "
             "GROUP BY cust ORDER BY cust")
    assert r["cust"] == [1, 2, 3]
    assert r["total"] == [18.5, 150.5, 24.75]
    assert r["n"] == [4, 3, 3]
    assert r["lo"] == [1.0, 20.5, 7.25]
    assert [round(x, 4) for x in r["mean"]] == [4.625,
                                                round(150.5 / 3, 4),
                                                8.25]


def test_global_aggregates(db):
    r = q(db, "SELECT COUNT(*) AS n, SUM(amount) AS s, MAX(id) AS m "
             "FROM orders WHERE cust <> 1")
    assert r["n"] == [6] and r["m"] == [8]
    assert abs(r["s"][0] - 175.25) < 1e-9


def test_agg_expression_argument(db):
    r = q(db, "SELECT cust, SUM(amount * 2) AS d FROM orders "
             "GROUP BY cust ORDER BY cust")
    assert r["d"] == [37.0, 301.0, 49.5]


def test_having(db):
    r = q(db, "SELECT cust, SUM(amount) AS total FROM orders "
             "GROUP BY cust HAVING total > 20 ORDER BY total DESC")
    assert r["cust"] == [2, 3]


def test_join_inner_and_left(db):
    r = q(db, "SELECT name, amount FROM orders "
             "JOIN custs ON cust = cid WHERE amount > 20 "
             "ORDER BY amount")
    assert r["name"] == ["bob", "bob", "bob"]
    assert r["amount"] == [20.5, 30.0, 100.0]
    r = q(db, "SELECT cid, COUNT(id) AS n FROM custs "
             "LEFT JOIN orders ON cid = cust GROUP BY cid "
             "ORDER BY cid")
    assert r["cid"] == [1, 2, 3, 4]
    assert r["n"] == [4, 3, 3, 0]


def test_order_limit_offset(db):
    r = q(db, "SELECT id FROM orders ORDER BY amount DESC, id "
             "LIMIT 3 OFFSET 1")
    assert r["id"] == [8, 1, 0]


def test_distinct(db):
    r = q(db, "SELECT DISTINCT cust FROM orders ORDER BY cust")
    assert r["cust"] == [1, 2, 3]


def test_functions(db):
    r = q(db, "SELECT UPPER(tag) AS u, LENGTH(tag) AS l, "
             "ABS(id - 5) AS a, CAST(amount AS int) AS i, "
             "COALESCE(NULL, id) AS co FROM orders WHERE id < 2")
    assert r["u"] == ["AA", "AB"]
    assert r["l"] == [2, 2]
    assert r["a"] == [5, 4]
    assert r["i"] == [10, 20]


def test_join_column_collision_qualified(db):
    """Both tables carry a column named v: qualified refs resolve the
    left side to v and the right side to the join-suffixed v_right."""
    t1 = at.Table.from_pydict({"k": np.array([1, 2], np.int64),
                               "v": np.array([10, 20], np.int64)})
    t2 = at.Table.from_pydict({"k": np.array([1, 2], np.int64),
                               "v": np.array([100, 200], np.int64)})
    r = execute_sql({"t1": t1, "t2": t2},
                    "SELECT t1.v AS a, t2.v AS b FROM t1 "
                    "JOIN t2 ON t1.k = t2.k ORDER BY a").to_pydict()
    assert r["a"] == [10, 20]
    assert r["b"] == [100, 200]


def test_errors(db):
    with pytest.raises(ArrowInvalid):
        q(db, "SELECT FROM orders")
    with pytest.raises(ArrowInvalid):
        q(db, "SELECT nosuch FROM orders")
    with pytest.raises(ArrowInvalid):
        q(db, "SELECT id FROM nosuch")
    with pytest.raises(ArrowInvalid):
        q(db, "SELECT cust, id FROM orders GROUP BY cust")


def test_flightsql_uses_sql_engine(db):
    from arrow_tpu.io.flightsql import simple_sql_executor
    r = simple_sql_executor(
        db, "SELECT cust, SUM(amount) AS s FROM orders "
            "GROUP BY cust HAVING s > 100").to_pydict()
    assert r["cust"] == [2]


def test_join_on_qualified_sides():
    """ON t2.a = t1.b must join by QUALIFIER, not name membership."""
    t1 = at.Table.from_pydict({"a": [1, 2, 3], "b": [10, 20, 30]})
    t2 = at.Table.from_pydict({"a": [10, 20, 99], "b": [7, 8, 9]})
    r = execute_sql({"t1": t1, "t2": t2},
                    "SELECT t1.a, t2.b FROM t1 JOIN t2 ON t2.a = t1.b")
    assert r.to_pydict() == {"a": [1, 2], "b": [7, 8]}


def test_aggregate_qualified_arg_after_join():
    """SUM(t4.x) after a join aggregates the RIGHT x, not the left."""
    t3 = at.Table.from_pydict({"k": [1, 1, 2], "x": [100, 100, 100]})
    t4 = at.Table.from_pydict({"k": [1, 2], "x": [5, 7]})
    r = execute_sql(
        {"t3": t3, "t4": t4},
        "SELECT t3.k, SUM(t4.x) AS s FROM t3 JOIN t4 ON t3.k = t4.k "
        "GROUP BY t3.k ORDER BY k")
    assert r.to_pydict() == {"k": [1, 2], "s": [10, 7]}


def test_having_aggregate_expression():
    """HAVING over an aggregate expr computes hidden aggregates and
    drops them from the output."""
    t = at.Table.from_pydict({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    r = execute_sql({"t": t},
                    "SELECT k, SUM(v) AS s FROM t GROUP BY k "
                    "HAVING COUNT(*) > 1")
    assert r.to_pydict() == {"k": ["a"], "s": [3]}
    # reuse of a SELECT aggregate (no hidden column needed)
    r2 = execute_sql({"t": t},
                     "SELECT k, COUNT(*) AS c FROM t GROUP BY k "
                     "HAVING COUNT(*) > 1")
    assert r2.to_pydict() == {"k": ["a"], "c": [2]}


def test_bare_select_alias():
    t = at.Table.from_pydict({"v": [1, 2]})
    r = execute_sql({"t": t}, "SELECT v total FROM t")
    assert r.column_names == ["total"]
    assert r.to_pydict() == {"total": [1, 2]}


def test_global_aggregates_all_null_are_null():
    """SUM/MIN/MAX/AVG over zero non-null rows are NULL, not 0
    (Scalar.valid is the null flag)."""
    t = at.Table.from_pydict({"x": [None, None],
                              "y": [1, 2]})
    out = execute_sql({"t": t},
                      "SELECT sum(x) AS s, avg(x) AS a, min(x) AS m, "
                      "count(x) AS c FROM t")
    d = out.to_pydict()
    assert d["s"] == [None] and d["a"] == [None] and d["m"] == [None]
    assert d["c"] == [0]
    empty = execute_sql({"t": t}, "SELECT max(y) AS m FROM t WHERE y > 99")
    assert empty.to_pydict()["m"] == [None]


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sql_where_agg(seed):
    """Random WHERE + aggregate queries vs a numpy oracle."""
    rng = np.random.default_rng(700 + seed)
    n = int(rng.integers(10, 500))
    a = rng.integers(-50, 50, n)
    b = rng.normal(0, 10, n)
    mask = rng.random(n) < 0.2
    t = at.Table.from_pydict({
        "a": at.column(a, validity=~mask),
        "b": at.column(b),
    })
    av = np.where(~mask, a, 0)
    thr = int(rng.integers(-40, 40))
    op, npop = rng.choice([(">", np.greater), ("<", np.less),
                           (">=", np.greater_equal), ("=", np.equal)])
    sel = npop(av, thr) & ~mask
    out = execute_sql({"t": t},
                      f"SELECT count(a) AS c, sum(a) AS s, min(b) AS m "
                      f"FROM t WHERE a {op} {thr}")
    d = out.to_pydict()
    assert d["c"] == [int(sel.sum())], (seed, op, thr)
    if sel.any():
        assert d["s"] == [int(av[sel].sum())]
        assert abs(d["m"][0] - float(b[sel].min())) < 1e-9
    else:
        assert d["s"] == [None] and d["m"] == [None]
    # GROUP BY path
    g = execute_sql({"t": t},
                    "SELECT a, count(*) AS c FROM t "
                    "GROUP BY a ORDER BY a LIMIT 5")
    gd = g.to_pydict()
    import collections
    cnt = collections.Counter(
        [None if m_ else int(x) for x, m_ in zip(a, mask)])
    want_keys = sorted([k for k in cnt], key=lambda x: (x is not None, x))[:5]
    assert gd["a"] == want_keys, seed
    assert gd["c"] == [cnt[k] for k in want_keys]


# ---- DML / DDL executor (the application side of FlightSQL
# CommandStatementUpdate; sql/server.rs:399 delegates SQL to the app) --------

def test_sql_update_statements():
    from arrow_tpu.sql import execute_sql_update
    t = {"x": at.Table.from_pydict({"a": [1, 2, 3],
                                    "s": ["p", "q", "r"]})}
    mut, n = execute_sql_update(t, "INSERT INTO x VALUES (4, 'w')")
    assert n == 1
    t["x"] = mut["x"]
    assert t["x"].to_pydict()["a"] == [1, 2, 3, 4]
    mut, n = execute_sql_update(
        t, "UPDATE x SET a = a + 100, s = 'z' WHERE a >= 3")
    assert n == 2
    assert mut["x"].to_pydict() == {"a": [1, 2, 103, 104],
                                    "s": ["p", "q", "z", "z"]}
    mut, n = execute_sql_update(t, "DELETE FROM x WHERE s = 'q'")
    assert n == 1 and mut["x"].to_pydict()["a"] == [1, 3, 4]
    mut, n = execute_sql_update(t, "DELETE FROM x")
    assert n == 4 and mut["x"].num_rows == 0
    # column-subset insert fills missing columns with NULL
    mut, n = execute_sql_update(t, "INSERT INTO x (s) VALUES ('only')")
    assert n == 1 and mut["x"].to_pydict()["a"][-1] is None
    # INSERT ... SELECT
    mut, n = execute_sql_update(
        t, "INSERT INTO x (a) SELECT a * 10 FROM x WHERE a > 1")
    assert n == 3 and mut["x"].to_pydict()["a"][-3:] == [20, 30, 40]


def test_sql_ddl_statements():
    from arrow_tpu.sql import execute_sql_update
    from arrow_tpu.errors import ArrowInvalid
    t = {"x": at.Table.from_pydict({"a": [1, 2, 3]})}
    mut, n = execute_sql_update(
        t, "CREATE TABLE y (k BIGINT, v VARCHAR, f DOUBLE)")
    assert n == 0 and mut["y"].num_rows == 0
    assert [f.dtype.name for f in mut["y"].schema.fields] == \
        ["int64", "utf8", "float64"]
    t.update(mut)
    with pytest.raises(ArrowInvalid):
        execute_sql_update(t, "CREATE TABLE y (k INT)")
    assert execute_sql_update(
        t, "CREATE TABLE IF NOT EXISTS y (k INT)") == ({}, 0)
    mut, n = execute_sql_update(
        t, "CREATE TABLE z AS SELECT a FROM x WHERE a > 1")
    assert n == 2 and mut["z"].to_pydict() == {"a": [2, 3]}
    mut, n = execute_sql_update(t, "DROP TABLE x")
    assert mut == {"x": None}
    with pytest.raises(ArrowInvalid):
        execute_sql_update(t, "DROP TABLE nope")
    assert execute_sql_update(t, "DROP TABLE IF EXISTS nope") == ({}, 0)


def test_sql_string_predicates():
    # string literals in WHERE were broken pre-r5 (make_scalar cannot
    # infer utf8); cmp kernels take raw str scalars
    t = {"x": at.Table.from_pydict({"a": [1, 2, 3],
                                    "s": ["p", "q", "r"]})}
    assert execute_sql(t, "SELECT a FROM x WHERE s = 'q'") \
        .to_pydict() == {"a": [2]}
    assert execute_sql(t, "SELECT a FROM x WHERE s <> 'q'") \
        .to_pydict() == {"a": [1, 3]}
    assert execute_sql(t, "SELECT a FROM x WHERE s >= 'q'") \
        .to_pydict() == {"a": [2, 3]}


def test_sql_bind_params():
    from arrow_tpu.sql import bind_sql_params
    assert bind_sql_params("SELECT * FROM t WHERE a = ? AND s = ?",
                           [5, "it's"]) == \
        "SELECT * FROM t WHERE a = 5 AND s = 'it''s'"
    assert bind_sql_params("WHERE s = '?' AND a = ?", [None]) == \
        "WHERE s = '?' AND a = NULL"
    assert bind_sql_params("a = ?", [True]) == "a = TRUE"


def test_sql_expressions_over_empty_table():
    """Literals in expressions over EMPTY tables build typed empties
    (make_col([]) would infer null and break arithmetic — found by the
    r5 DML fuzz)."""
    import numpy as np
    t = {"e": at.Table.from_pydict({
        "a": at.column(np.array([], np.int64)),
        "v": at.column(np.array([], np.float64))})}
    assert execute_sql(t, "SELECT a FROM e WHERE a >= -8") \
        .num_rows == 0
    assert execute_sql(t, "SELECT a + 1, v * -2.5 FROM e").num_rows == 0
    from arrow_tpu.sql import execute_sql_update
    mut, n = execute_sql_update(t, "UPDATE e SET v = v + 3 WHERE a >= -1")
    assert n == 0 and mut["e"].num_rows == 0
    mut, n = execute_sql_update(t, "DELETE FROM e WHERE a < -5")
    assert n == 0
