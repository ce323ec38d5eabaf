"""Scratch: empirical Spark-vs-DuckDB parity checks used to design oracle_sql()."""
import duckdb

from duckdb_dbt_finance_warehouse_spark.session import get_spark

SF = "/root/testdata/sf0.01"

spark = get_spark("parity_scratch")
con = duckdb.connect()
from duckdb_dbt_finance_warehouse_spark.sources.tables import load_testdata

dfs = load_testdata(spark, SF, "lineitem", "orders", "events", "embeddings", "documents", "customer")
for t, df in dfs.items():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    df.createOrReplaceTempView(t)

def cmp(name, spark_sql, duck_sql=None):
    duck_sql = duck_sql or spark_sql
    s = [tuple(r) for r in spark.sql(spark_sql).collect()]
    d = con.execute(duck_sql).fetchall()
    ok = sorted(map(repr, s)) == sorted(map(repr, d))
    print(f"{'OK ' if ok else 'DIFF'} {name}")
    if not ok:
        print("  spark:", sorted(map(repr, s))[:3])
        print("  duck :", sorted(map(repr, d))[:3])

# 1. month name
cmp("monthname",
    "SELECT DISTINCT date_format(o_orderdate, 'MMMM') AS mn FROM orders",
    "SELECT DISTINCT strftime(o_orderdate, '%B') AS mn FROM orders")

# 2. month sequence
cmp("month_seq",
    "SELECT explode(sequence(to_date('2024-01-01'), to_date('2024-05-01'), interval 1 month)) AS m",
    "SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-05-01', INTERVAL 1 MONTH))::DATE AS m")

# 3. exact decimal sum
cmp("decimal_sum",
    "SELECT l_returnflag, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS rev FROM lineitem GROUP BY l_returnflag",
    "SELECT l_returnflag, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS rev FROM lineitem GROUP BY l_returnflag")

# 3b. raw double sum for contrast
cmp("double_sum_raw",
    "SELECT CAST(SUM(l_extendedprice) AS DOUBLE) AS s FROM lineitem",
    "SELECT SUM(l_extendedprice) AS s FROM lineitem")

# 4. month index
cmp("month_index",
    "SELECT DISTINCT CAST(months_between(trunc(o_orderdate,'month'), DATE '1970-01-01') AS INT) AS mi FROM orders",
    "SELECT DISTINCT datediff('month', DATE '1970-01-01', date_trunc('month', o_orderdate))::INT AS mi FROM orders")

# 5. json extract
cmp("json",
    "SELECT event_id, get_json_object(props, '$.k') AS k FROM events WHERE event_id < 20",
    "SELECT event_id, json_extract_string(props, '$.k') AS k FROM events WHERE event_id < 20")

# 6. md5 with double->decimal canonical string
cmp("md5_hash",
    "SELECT c_custkey, md5(concat_ws('|', coalesce(CAST(c_custkey AS STRING),''), coalesce(c_name,''), coalesce(CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS STRING),''))) AS h FROM customer WHERE c_custkey < 30",
    "SELECT c_custkey, md5(concat_ws('|', coalesce(CAST(c_custkey AS VARCHAR),''), coalesce(c_name,''), coalesce(CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS VARCHAR),''))) AS h FROM customer WHERE c_custkey < 30")

# 7. cosine similarity, rounded
cmp("cosine",
    """SELECT a.vec_id, round(
         aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
         / (sqrt(aggregate(transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
          * sqrt(aggregate(transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))), 6) AS cos
       FROM embeddings a JOIN embeddings b ON b.vec_id = 0 WHERE a.vec_id < 20""",
    """SELECT a.vec_id, round(
         list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos
       FROM embeddings a JOIN embeddings b ON b.vec_id = 0 WHERE a.vec_id < 20""")

# 8. duckdb sum(int) type
print(con.execute("SELECT typeof(SUM(1)) FROM lineitem LIMIT 1").fetchall(), "<- duckdb sum(int) type")

# 9. last_day / trunc / add_months
cmp("datekit",
    "SELECT DISTINCT CAST(o_orderdate AS DATE) AS d, last_day(o_orderdate) AS eom, add_months(trunc(o_orderdate,'month'), 1) AS nm FROM orders WHERE o_orderkey < 50",
    "SELECT DISTINCT o_orderdate::DATE AS d, (date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY)::DATE AS eom, (date_trunc('month', o_orderdate) + INTERVAL 1 MONTH)::DATE AS nm FROM orders WHERE o_orderkey < 50")

# 10. timestamps round trip
cmp("ts",
    "SELECT event_id, ts FROM events WHERE event_id < 10",
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_id < 10")

# 11. ntile/stddev parity check (population vs sample)
cmp("stddev",
    "SELECT round(stddev_samp(l_quantity), 6) AS sd FROM lineitem",
    "SELECT round(stddev_samp(l_quantity), 6) AS sd FROM lineitem")

# 12. regexp token count
cmp("tokens",
    "SELECT doc_id, size(split(trim(text), '\\\\s+')) AS n_ws FROM documents WHERE doc_id < 20",
    "SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_ws FROM documents WHERE doc_id < 20")

spark.stop()
