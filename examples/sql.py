"""SQL example (reference: examples/src/bin/sql.rs:23-50).

Registers a CSV as an external table and runs SQL against the engine.
Run:  PYTHONPATH=. python examples/sql.py
"""

import os
import tempfile

from ballista_tpu.client import SessionContext


def main():
    ctx = SessionContext()

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "test.csv")
        with open(path, "w") as f:
            f.write("c1,c2,c3\n")
            for i in range(10):
                f.write(f"{i},{i * 2},{i * i}\n")

        ctx.sql(
            f"CREATE EXTERNAL TABLE test STORED AS CSV WITH HEADER ROW "
            f"LOCATION '{path}'; SELECT 1 as ok")
        df = ctx.sql(
            "SELECT c1, MIN(c3) as min_c3, MAX(c3) as max_c3 FROM test "
            "WHERE c2 >= 4 GROUP BY c1 ORDER BY c1 LIMIT 5")
        print(df.to_pandas())


if __name__ == "__main__":
    main()
