SELECT * FROM {{ source('tb_101', 'truck') }}
