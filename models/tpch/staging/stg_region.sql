SELECT * FROM {{ source('tpch', 'region') }}
