{{ config(materialized='view') }}

select
    o_orderkey as order_id,
    o_custkey as customer_id,
    o_orderstatus as status,
    cast(o_orderdate as date) as order_date,
    o_totalprice as order_total
from {{ source('testdata', 'orders') }}
