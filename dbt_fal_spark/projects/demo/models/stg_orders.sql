{{ config(materialized='view') }}

select
    o_orderkey as order_id,
    o_custkey as customer_id,
    o_orderstatus as status,
    o_totalprice as order_total
from {{ source('testdata', 'orders') }}
