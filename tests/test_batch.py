from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

from ballista_tpu import batch as B
from ballista_tpu.schema import TypeKind


def make_table():
    return pa.table({
        "a": pa.array([1, 2, None, 4], type=pa.int64()),
        "b": pa.array([1.5, 2.5, 3.5, None], type=pa.float32()),
        "s": pa.array(["x", "zebra", None, "apple"], type=pa.string()),
        "d": pa.array([18000, 18001, 18002, 18003], type=pa.int32()).cast(pa.date32()),
        "m": pa.array([None, Decimal("12.34"), Decimal("-0.50"), Decimal("0")],
                      type=pa.decimal128(15, 2)),
    })


def test_arrow_roundtrip():
    t = make_table()
    b, schema = B.from_arrow(t)
    assert int(b.num_rows) == 4
    assert b.capacity == 128  # rounded to lane multiple
    out = B.to_numpy(b, schema)
    a_data, a_valid = out["a"]
    assert list(a_valid) == [True, True, False, True]
    assert a_data[0] == 1 and a_data[3] == 4
    s_data, s_valid = out["s"]
    assert list(s_data[:2]) == ["x", "zebra"]
    assert s_data[2] is None
    # sorted dictionary -> code order is lexicographic
    d = schema.dictionary("s")
    assert list(d) == ["apple", "x", "zebra"]
    m_data, _ = out["m"]
    assert m_data[1] == 1234 and m_data[2] == -50  # scaled int64 cents
    assert schema.field("m").dtype.kind is TypeKind.DECIMAL
    assert schema.field("m").dtype.scale == 2


def test_to_pandas():
    t = make_table()
    b, schema = B.from_arrow(t)
    df = B.to_pandas(b, schema)
    assert len(df) == 4
    assert df["m"][1] == pytest.approx(12.34)
    assert df["s"][1] == "zebra"


def test_div_scaled_exact():
    """Exact decimal division (reference: Arrow decimal128 avg/division);
    base-10 long division must match bigint math for int64-scale sums."""
    import jax.numpy as jnp
    import numpy as np
    from ballista_tpu.exprs import _div_scaled

    rng = np.random.default_rng(7)
    a = rng.integers(-2 * 10**18, 2 * 10**18, size=500)
    b = rng.integers(1, 6 * 10**8, size=500)
    for m in (1, 4, 10):
        got = np.asarray(_div_scaled(jnp.asarray(a), jnp.asarray(b), m))
        for x, y, g in zip(a.tolist(), b.tolist(), got.tolist()):
            sign = 1 if (x < 0) == (y < 0) else -1
            exp = sign * ((abs(x) * 10**m + abs(y) // 2) // abs(y))
            if abs(exp) < 2**63 - 1:
                assert g == exp, (x, y, m)
