"""Replica of the reference's TPC-H benchmark runner, executed VERBATIM
through ``Engine.execute_statement``.

The reference's runner (benchmarking/_tpch/incresql_runner.rs) is the
switch-over path for a real user: CREATE TABLE statements
(incresql_runner.rs:54-177) followed by the Q1/Q3/Q5/Q6/Q10 SQL texts
(incresql_runner.rs:352-497), all in its MySQL-flavoured dialect (comma
joins, ``date '...'`` literals, ``date_sub(date, int)``, decimal
arithmetic).  This test feeds the *unmodified* strings through our engine
over a tiny hand-computable dataset and checks every query's values, so a
reference user's scripts run as-is."""

from __future__ import annotations

import pytest

from incresql_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "warehouse"))
    for ddl in CREATE_TABLES:
        e.execute_statement(ddl)
    for ins in INSERTS:
        e.execute_statement(ins)
    return e


# incresql_runner.rs:54-177, verbatim (partsupp included even though the
# five queries never touch it — the runner creates it).
CREATE_TABLES = [
    """CREATE TABLE part
(
    p_partkey       BIGINT,
    p_name          TEXT,
    p_mfgr          TEXT,
    p_brand         TEXT,
    p_type          TEXT,
    p_size          INTEGER,
    p_container     TEXT,
    p_retailprice   DECIMAL(12,2),
    p_comment       TEXT
)""",
    """CREATE TABLE supplier
(
    s_suppkey     BIGINT,
    s_name        TEXT,
    s_address     TEXT,
    s_nationkey   INTEGER,
    s_phone       TEXT,
    s_acctbal     DECIMAL(12,2),
    s_comment     TEXT
)""",
    """CREATE TABLE partsupp
(
    ps_partkey     BIGINT,
    ps_suppkey     BIGINT,
    ps_availqty    INTEGER,
    ps_supplycost  DECIMAL(12,2),
    ps_comment     TEXT
)""",
    """CREATE TABLE customer
(
    c_custkey    BIGINT,
    c_name       TEXT,
    c_address    TEXT,
    c_nationkey  INTEGER,
    c_phone      TEXT,
    c_acctbal    DECIMAL(12,2),
    c_mktsegment TEXT,
    c_comment    TEXT
)""",
    """CREATE TABLE orders
(
    o_orderkey       BIGINT,
    o_custkey        BIGINT,
    o_orderstatus    TEXT,
    o_totalprice     DECIMAL(12,2),
    o_orderdate      DATE,
    o_orderpriority  TEXT,
    o_clerk          TEXT,
    o_shippriority   INTEGER,
    o_comment        TEXT
)""",
    """CREATE TABLE lineitem
(
    l_orderkey       BIGINT,
    l_partkey        BIGINT,
    l_suppkey        BIGINT,
    l_linenumber     INTEGER,
    l_quantity       DECIMAL(12,2),
    l_extendedprice  DECIMAL(12,2),
    l_discount       DECIMAL(12,2),
    l_tax            DECIMAL(12,2),
    l_returnflag     TEXT,
    l_linestatus     TEXT,
    l_shipdate       DATE,
    l_commitdate     DATE,
    l_receiptdate    DATE,
    l_shipinstruct   TEXT,
    l_shipmode       TEXT,
    l_comment        TEXT
)""",
    """CREATE TABLE nation
(
    n_nationkey   INTEGER,
    n_name        TEXT,
    n_regionkey   INTEGER,
    n_comment     TEXT
)""",
    """CREATE TABLE region
(
    r_regionkey   INTEGER,
    r_name        TEXT,
    r_comment     TEXT
)""",
]

# Hand-crafted micro-dataset: every query returns at least one row whose
# arithmetic is checkable by hand.
INSERTS = [
    "INSERT INTO region VALUES (0,'ASIA','x'),(1,'AMERICA','x')",
    "INSERT INTO nation VALUES (10,'JAPAN',0,'x'),(11,'BRAZIL',1,'x')",
    "INSERT INTO supplier VALUES (100,'S1','sa',10,'sp',100.00,'sc'),"
    "(101,'S2','sb',11,'sp',50.00,'sc')",
    "INSERT INTO customer VALUES "
    "(1,'C1','addr1',10,'phone1',1000.00,'BUILDING','cc1'),"
    "(2,'C2','addr2',11,'phone2',500.00,'AUTO','cc2')",
    # o1000: inside Q5's 1994 window; o1001: inside Q10's 1993-10..12
    # window; o1002: Q3 (BUILDING, orderdate < 1995-03-15).
    "INSERT INTO orders VALUES "
    "(1000,1,'O',100.00, date '1994-06-01','P','clerk',0,'oc'),"
    "(1001,1,'F',50.00,  date '1993-11-01','P','clerk',0,'oc'),"
    "(1002,1,'O',80.00,  date '1995-03-01','P','clerk',0,'oc')",
    # L1 -> Q5 (ASIA supplier+customer, rev 95) and Q6 (100*0.05);
    # L2 -> Q10 (returnflag R, rev 180); L3 -> Q3 (ship after 1995-03-15).
    "INSERT INTO lineitem VALUES "
    "(1000,200,100,1,10.00,100.00,0.05,0.02,'N','O',"
    " date '1994-02-01', date '1994-02-01', date '1994-02-05','DELIVER','AIR','lc'),"
    "(1001,201,100,1,5.00,200.00,0.10,0.00,'R','F',"
    " date '1993-11-15', date '1993-11-15', date '1993-11-20','DELIVER','MAIL','lc'),"
    "(1002,202,101,1,1.00,50.00,0.00,0.00,'N','O',"
    " date '1995-04-01', date '1995-04-01', date '1995-04-05','DELIVER','SHIP','lc')",
]


Q1 = """
select
    l_returnflag,
    l_linestatus,
    sum(l_quantity) as sum_qty,
    sum(l_extendedprice) as sum_base_price,
    sum(l_extendedprice*(1-l_discount)) as sum_disc_price,
    sum(l_extendedprice*(1-l_discount)*(1+l_tax)) as sum_charge,
    avg(l_quantity) as avg_qty,
    avg(l_extendedprice) as avg_price,
    avg(l_discount) as avg_disc,
    count(*) as count_order
from
    lineitem
where
    l_shipdate <= date_sub(date '1998-12-01', 90)
group by
    l_returnflag,
    l_linestatus
order by
    l_returnflag,
    l_linestatus
    """

Q3 = """
select
  l_orderkey,
  sum(l_extendedprice*(1-l_discount)) as revenue,
  o_orderdate,
  o_shippriority
from
  customer,
  orders,
  lineitem
where
  c_mktsegment = 'BUILDING'
  and c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and o_orderdate < date '1995-03-15'
  and l_shipdate > date '1995-03-15'
group by
  l_orderkey,
  o_orderdate,
  o_shippriority
order by
  revenue desc,
  o_orderdate
limit 10
    """

Q5 = """
select
  n_name,
  sum(l_extendedprice * (1 - l_discount)) as revenue
from
  customer,
  orders,
  lineitem,
  supplier,
  nation,
  region
where
  c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and l_suppkey = s_suppkey
  and c_nationkey = s_nationkey
  and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey
  and r_name = 'ASIA'
  and o_orderdate >= date '1994-01-01'
  and o_orderdate < date '1995-01-01'
group by
  n_name
order by
  revenue desc
    """

Q6 = """
select
  sum(l_extendedprice*l_discount) as revenue
from
  lineitem
where
  l_shipdate >= date '1994-01-01'
  and l_shipdate < date '1995-01-01'
  and l_discount between 0.06 - 0.01 and 0.06 + 0.01
  and l_quantity < 24
    """

Q10 = """
select
  c_custkey,
  c_name,
  sum(l_extendedprice * (1 - l_discount)) as revenue,
  c_acctbal,
  n_name,
  c_address,
  c_phone,
  c_comment
from
  customer,
  orders,
  lineitem,
  nation
where
  c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and o_orderdate >= date '1993-10-01'
  and o_orderdate < date '1994-01-01'
  and l_returnflag = 'R'
  and c_nationkey = n_nationkey
group by
  c_custkey,
  c_name,
  c_acctbal,
  c_phone,
  n_name,
  c_address,
  c_comment
order by
  revenue desc
limit 20
    """


def rows(e: Engine, sql: str) -> list[list[str]]:
    return [p.strip("|").split("|") for p in e.execute_statement(sql).pipes()]


def test_runner_verbatim_part_load(engine, tmp_path):
    """The runner's load script, verbatim (incresql_runner.rs:185-205):
    lowercase ``directory``/``with(delimiter=...)``, ``->>`` extraction,
    CAST-per-column, followed by COMPACT TABLE."""
    d = tmp_path / "tbl"
    d.mkdir()
    (d / "part.tbl").write_text(
        "1|green part|M1|B1|small|7|JUMBO|12.50|pc1\n"
        "2|red part|M2|B2|large|14|BOX|99.99|pc2\n"
    )
    engine.execute_statement(
        f"""
INSERT INTO part
SELECT
  CAST(data->>"$[0]" AS BIGINT) as p_partkey,
  data->>"$[1]" as p_name,
  data->>"$[2]" as p_mfgr,
  data->>"$[3]" as p_brand,
  data->>"$[4]" as p_type,
  CAST(data->>"$[5]" AS INTEGER) as p_size,
  data->>"$[6]" as p_container,
  CAST(data->>"$[7]" AS DECIMAL(12,2)) as p_retailprice,
  data->>"$[8]" as p_comment
FROM directory "{d}" with(delimiter="|")
    """
    )
    engine.execute_statement("COMPACT TABLE part")
    got = rows(engine, "SELECT p_partkey, p_name, p_size, p_retailprice FROM part ORDER BY p_partkey")
    assert got == [
        ["1", "green part", "7", "12.50"],
        ["2", "red part", "14", "99.99"],
    ]


def test_runner_q1(engine):
    got = rows(engine, Q1)
    assert len(got) == 2  # (N,O) and (R,F)
    no, rf = got[0], got[1]
    assert no[0:2] == ["N", "O"] and rf[0:2] == ["R", "F"]
    # N/O group = L1 + L3: qty 11, base 150, disc_price 95+50, charge 96.9+50
    assert float(no[2]) == pytest.approx(11.0)
    assert float(no[3]) == pytest.approx(150.0)
    assert float(no[4]) == pytest.approx(145.0)
    assert float(no[5]) == pytest.approx(146.9)
    assert float(no[6]) == pytest.approx(5.5)
    assert float(no[7]) == pytest.approx(75.0)
    assert float(no[8]) == pytest.approx(0.025)
    assert no[9] == "2"  # count_order: L1+L3
    # R/F group = L2 alone
    assert float(rf[2]) == pytest.approx(5.0)
    assert float(rf[4]) == pytest.approx(180.0)
    assert rf[9] == "1"


def test_runner_q3(engine):
    got = rows(engine, Q3)
    assert len(got) == 1
    (r,) = got
    assert r[0] == "1002"
    assert float(r[1]) == pytest.approx(50.0)
    assert r[2].startswith("1995-03-01")
    assert r[3] == "0"


def test_runner_q5(engine):
    got = rows(engine, Q5)
    assert len(got) == 1
    assert got[0][0] == "JAPAN"
    assert float(got[0][1]) == pytest.approx(95.0)


def test_runner_q6(engine):
    got = rows(engine, Q6)
    assert len(got) == 1
    assert float(got[0][0]) == pytest.approx(5.0)


def test_runner_q10(engine):
    got = rows(engine, Q10)
    assert len(got) == 1
    r = got[0]
    assert r[0] == "1" and r[1] == "C1"
    assert float(r[2]) == pytest.approx(180.0)
    assert r[4] == "JAPAN" and r[6] == "phone1"
