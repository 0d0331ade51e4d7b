{{ config(materialized='table') }}
SELECT
  o.o_orderkey AS order_id,
  o.o_orderdate AS order_date,
  o.o_orderpriority AS priority,
  c.c_custkey AS customer_id,
  c.c_name AS customer_name,
  n.n_name AS nation,
  r.r_name AS region,
  l.l_linenumber AS line_number,
  l.l_quantity AS quantity,
  CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)) AS net_price
FROM {{ ref('stg_lineitem') }} l
JOIN {{ ref('stg_orders') }} o ON l.l_orderkey = o.o_orderkey
LEFT JOIN {{ ref('stg_customer') }} c ON o.o_custkey = c.c_custkey
LEFT JOIN {{ ref('stg_nation') }} n ON c.c_nationkey = n.n_nationkey
LEFT JOIN {{ ref('stg_region') }} r ON n.n_regionkey = r.r_regionkey
