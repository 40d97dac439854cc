with customers as (
    select * from {{ ref('stg_customers') }}
),
orders as (
    select * from {{ ref('stg_orders') }}
),
customer_orders as (
    select
        customer_id,
        min(order_date) as first_order,
        max(order_date) as most_recent_order,
        count(order_id) as number_of_orders,
        cast(sum(cast(order_total as decimal(18,4))) as double) as customer_lifetime_value
    from orders
    group by customer_id
)
select
    customers.customer_id,
    customers.customer_name,
    customers.segment,
    customer_orders.first_order,
    customer_orders.most_recent_order,
    coalesce(customer_orders.number_of_orders, 0) as number_of_orders,
    customer_orders.customer_lifetime_value
from customers
left join customer_orders on customers.customer_id = customer_orders.customer_id
