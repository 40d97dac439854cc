{{ config(materialized='view') }}

select order_id, customer_id, order_total
from {{ ref('stg_orders') }}
where order_total > {{ var('min_order_total') }}
