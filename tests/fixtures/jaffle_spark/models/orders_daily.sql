{{ config(materialized='table', tags=['daily']) }}

{% set statuses = ['O', 'F', 'P'] %}

select
    order_date,
    count(*) as n_orders,
    {% for s in statuses %}
    count(case when status = '{{ s }}' then 1 end) as n_status_{{ s }},
    {% endfor %}
    cast(sum(cast(order_total as decimal(18,4))) as double) as total_amount
from {{ ref('stg_orders') }}
group by order_date
