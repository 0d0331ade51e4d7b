{{ config(materialized='table') }}
SELECT
  c.c_custkey AS customer_id,
  c.c_name AS customer_name,
  c.c_mktsegment AS segment,
  array_sort(collect_set(o.o_orderpriority)) AS priorities,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
    AS total_sales,
  COUNT(*) AS n_orders
FROM {{ ref('stg_customer') }} c
JOIN {{ ref('stg_orders') }} o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
