SELECT * FROM {{ source('corpus', 'embeddings') }}
