"""SQL over engine tables (the application layer the reference leaves
to its users; arrow_tpu/sql.py lowers every clause onto the compute
kernels)."""

import arrow_tpu as at
from arrow_tpu.sql import execute_sql
from arrow_tpu.utils.display import pretty_format_table


def main():
    orders = at.Table.from_pydict({
        "id": [1, 2, 3, 4, 5, 6],
        "customer": ["ada", "bob", "ada", "cid", "bob", "ada"],
        "amount": [10.0, 20.0, 7.5, 99.0, 3.25, 12.0],
    })
    customers = at.Table.from_pydict({
        "name": ["ada", "bob", "cid"],
        "region": ["eu", "us", "eu"],
    })
    out = execute_sql(
        {"orders": orders, "customers": customers},
        """
        SELECT c.region, SUM(o.amount) AS total, COUNT(*) AS n
        FROM orders o JOIN customers c ON o.customer = c.name
        WHERE o.amount > 5
        GROUP BY c.region
        ORDER BY total DESC
        """)
    print(pretty_format_table(out))


if __name__ == "__main__":
    main()
