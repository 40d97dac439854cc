{{ config(materialized='table') }}

select
    cast(o_orderdate as date) as order_date,
    count(*) as n_orders,
    count(case when o_orderpriority = '1-URGENT' then 1 end) as n_urgent
from {{ source('testdata', 'orders') }}
group by order_date
