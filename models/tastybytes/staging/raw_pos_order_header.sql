SELECT * FROM {{ source('tb_101', 'order_header') }}
