{{ config(materialized='view') }}

select
    c_custkey as customer_id,
    c_name as customer_name,
    c_mktsegment as segment
from {{ source('testdata', 'customer') }}
