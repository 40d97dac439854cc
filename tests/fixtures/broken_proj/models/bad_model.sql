select nonexistent_column from {{ ref('ok_orders') }}
