SELECT * FROM {{ source('corpus', 'documents') }}
