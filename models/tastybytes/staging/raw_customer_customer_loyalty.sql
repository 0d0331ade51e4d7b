SELECT * FROM {{ source('tb_101', 'customer_loyalty') }}
