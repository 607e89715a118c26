import numpy as np
import jax.numpy as jnp

from ballista_tpu.batch import Batch, Column
from ballista_tpu.ops import compact, hash as H, sort


def mk_batch(cols, n):
    cap = 128
    out = []
    for data, valid in cols:
        d = np.zeros(cap, dtype=np.asarray(data).dtype)
        d[:len(data)] = data
        v = np.zeros(cap, dtype=bool)
        v[:len(valid)] = valid
        out.append(Column(jnp.asarray(d), jnp.asarray(v)))
    return Batch(tuple(out), jnp.int32(n))


def test_group_codes_basic():
    keys = np.array([5, 7, 5, 9, 7, 5, 11, 9], dtype=np.int64)
    valid = np.ones(8, dtype=bool)
    cap = 128
    kd = np.zeros(cap, dtype=np.int64); kd[:8] = keys
    kv = np.zeros(cap, dtype=bool); kv[:8] = valid
    live = np.zeros(cap, dtype=bool); live[:8] = True
    gt = H.group_codes((jnp.asarray(kd),), (jnp.asarray(kv),), jnp.asarray(live), 16)
    rs = np.asarray(gt.row_slot)[:8]
    assert not bool(gt.overflow)
    # equal keys share slots
    assert rs[0] == rs[2] == rs[5]
    assert rs[1] == rs[4]
    assert rs[3] == rs[7]
    assert len({rs[0], rs[1], rs[3], rs[6]}) == 4
    assert int(np.asarray(gt.slot_used).sum()) == 4


def test_group_codes_nulls_group_together():
    cap = 128
    kd = np.zeros(cap, dtype=np.int64); kd[:4] = [1, 0, 1, 0]
    kv = np.zeros(cap, dtype=bool); kv[:4] = [True, False, True, False]
    live = np.zeros(cap, dtype=bool); live[:4] = True
    gt = H.group_codes((jnp.asarray(kd),), (jnp.asarray(kv),), jnp.asarray(live), 8)
    rs = np.asarray(gt.row_slot)
    assert rs[0] == rs[2]
    assert rs[1] == rs[3]
    assert rs[0] != rs[1]


def test_filter_compact():
    b = mk_batch([(np.array([1, 2, 3, 4, 5], dtype=np.int64), [True] * 5)], 5)
    mask = np.zeros(128, dtype=bool); mask[:5] = [True, False, True, False, True]
    mvalid = np.zeros(128, dtype=bool); mvalid[:5] = True
    out = compact.filter_batch(b, Column(jnp.asarray(mask), jnp.asarray(mvalid)))
    assert int(out.num_rows) == 3
    assert list(np.asarray(out.columns[0].data)[:3]) == [1, 3, 5]


def test_sort_multi_key():
    a = np.array([3, 1, 2, 1, 2], dtype=np.int64)
    c = np.array([9, 8, 7, 6, 5], dtype=np.int64)
    b = mk_batch([(a, [True] * 5), (c, [True] * 5)], 5)
    out = sort.sort_batch(b, [sort.SortKeySpec(0, ascending=True),
                              sort.SortKeySpec(1, ascending=True)])
    got_a = list(np.asarray(out.columns[0].data)[:5])
    got_c = list(np.asarray(out.columns[1].data)[:5])
    assert got_a == [1, 1, 2, 2, 3]
    assert got_c == [6, 8, 5, 7, 9]


def test_sort_nulls_last_asc():
    a = np.array([3, 1, 2], dtype=np.int64)
    valid = [True, False, True]
    b = mk_batch([(a, valid)], 3)
    out = sort.sort_batch(b, [sort.SortKeySpec(0, ascending=True)])
    got = np.asarray(out.columns[0].data)[:3]
    gv = np.asarray(out.columns[0].validity)[:3]
    assert list(got[:2]) == [2, 3]
    assert not gv[2]


def test_join_build_probe():
    cap = 128
    bk = np.zeros(cap, dtype=np.int64); bk[:4] = [10, 20, 30, 40]
    bv = np.zeros(cap, dtype=bool); bv[:4] = True
    blive = np.zeros(cap, dtype=bool); blive[:4] = True
    jt = H.build_join_table((jnp.asarray(bk),), (jnp.asarray(bv),), jnp.asarray(blive), 16)
    assert not bool(jt.dup_keys)

    pk = np.zeros(cap, dtype=np.int64); pk[:5] = [20, 99, 10, 40, 20]
    pv = np.zeros(cap, dtype=bool); pv[:5] = True
    plive = np.zeros(cap, dtype=bool); plive[:5] = True
    m = H.probe_join_table(jt.slot_used, jt.slot_row,
                           (jnp.asarray(bk),), (jnp.asarray(bv),),
                           (jnp.asarray(pk),), (jnp.asarray(pv),),
                           jnp.asarray(plive), 16)
    got = list(np.asarray(m)[:5])
    assert got == [1, -1, 0, 3, 1]


def test_join_null_keys_never_match():
    cap = 128
    bk = np.zeros(cap, dtype=np.int64); bk[:2] = [0, 5]
    bv = np.zeros(cap, dtype=bool); bv[0] = False; bv[1] = True
    blive = np.zeros(cap, dtype=bool); blive[:2] = True
    jt = H.build_join_table((jnp.asarray(bk),), (jnp.asarray(bv),), jnp.asarray(blive), 8)
    pk = np.zeros(cap, dtype=np.int64); pk[:2] = [0, 5]
    pv = np.zeros(cap, dtype=bool); pv[0] = False; pv[1] = True
    plive = np.zeros(cap, dtype=bool); plive[:2] = True
    m = H.probe_join_table(jt.slot_used, jt.slot_row,
                           (jnp.asarray(bk),), (jnp.asarray(bv),),
                           (jnp.asarray(pk),), (jnp.asarray(pv),),
                           jnp.asarray(plive), 8)
    got = list(np.asarray(m)[:2])
    assert got[0] == -1  # NULL = NULL is not a match
    assert got[1] == 1


def test_packed_sort_key_edges():
    """Bounded-key packing (ops/sort.py): int32 extremes, desc dict codes,
    and null slots must order exactly like the unpacked rank path."""
    import numpy as np
    import jax.numpy as jnp
    from ballista_tpu.batch import Batch, Column
    from ballista_tpu.ops.sort import SortKeySpec, sort_batch

    n = 128
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 5, n).astype(np.int32)
    cvalid = rng.random(n) > 0.2
    ints = rng.choice(np.array([-2**31, -1, 0, 7, 2**31 - 1]), n).astype(np.int32)
    ivalid = rng.random(n) > 0.2
    rows = np.arange(n, dtype=np.int64)
    b = Batch((Column(jnp.asarray(codes), jnp.asarray(cvalid)),
               Column(jnp.asarray(ints), jnp.asarray(ivalid)),
               Column(jnp.asarray(rows), jnp.ones(n, bool))),
              jnp.int32(n))

    packed = [SortKeySpec(0, False, None, code_bound=5),
              SortKeySpec(1, True, None, narrow=True)]
    plain = [SortKeySpec(0, False, None), SortKeySpec(1, True, None)]
    got = sort_batch(b, packed)
    exp = sort_batch(b, plain)
    assert np.array_equal(np.asarray(got.columns[2].data),
                          np.asarray(exp.columns[2].data))
