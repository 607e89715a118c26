"""DataFrame API example (reference: examples/src/bin/dataframe.rs).

Builds a query with the DataFrame API instead of SQL.
Run:  PYTHONPATH=. python examples/dataframe.py
"""

import pyarrow as pa

from ballista_tpu.client import SessionContext
from ballista_tpu.client.dataframe import col, lit
from ballista_tpu.exec.aggregate import AggExpr


def main():
    ctx = SessionContext()
    ctx.register_arrow("t", pa.table({
        "a": [1, 2, 3, 4, 5],
        "b": [10.0, 20.0, 5.0, 40.0, 2.5],
        "tag": ["x", "y", "x", "y", "x"],
    }))

    df = (ctx.table("t")
          .filter(col("b") > lit(4.0))
          .aggregate([col("tag")],
                     [AggExpr("sum", col("a"), "sum_a"),
                      AggExpr("count_star", alias="n")])
          .sort(col("tag")))
    print(df.to_pandas())


if __name__ == "__main__":
    main()
