select o_orderkey, o_totalprice from {{ source('testdata', 'orders') }}
