{{ config(materialized='table', schema='analytics') }}
SELECT n_nationkey AS nation_id, upper(n_name) AS nation
FROM {{ ref('stg_nation') }}
