"""Hunt the 64x layout blowup: which op materializes s64[N] as
u32[N,2]{1,0:T(8,128)} (pair dim lane-padded, 64x memory) instead of the
compact T(8,128)(2,1) subtiled form?

Evidence (bench_logs/sf10_r3.log:18): q5/q8 SF10 died AT COMPILE with
`Allocation (size=34359738368) ... shape = 'u32[67108864,2]{1,0:T(8,128)}'`
— one int64 array over lineitem's 2^26-row capacity costing 32 GiB. The
same hazard at SF1 (4 GiB padded buffers that FIT) would also explain the
0.3-8 GiB/s per-operator roofline: the data rides 64x-padded tiles.

This script AOT-compiles minimal candidate programs (no execution — the
axon compile helper is chipless) and prints each one's
`compiled.memory_analysis().temp_size_in_bytes` + argument/output sizes.
A candidate whose temp size is ~64x the logical bytes is the culprit.

Run on the axon backend when the chip/compile service is free:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/layout_probe.py --n 26
CPU smoke (layouts differ; only checks the harness itself):
  JAX_PLATFORMS=cpu python scripts/layout_probe.py --n 20
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def candidates(N):
    import jax
    import jax.numpy as jnp

    i64 = jax.ShapeDtypeStruct((N,), jnp.int64)
    i32 = jax.ShapeDtypeStruct((N,), jnp.int32)
    f64 = jax.ShapeDtypeStruct((N,), jnp.float64)
    b = jax.ShapeDtypeStruct((N,), jnp.bool_)

    def sort1_i64(x):
        (s,) = jax.lax.sort((x,), num_keys=1, is_stable=False)
        return s

    def sort2_i64(x, y):
        return jax.lax.sort((x, y), num_keys=1, is_stable=False)

    def sort_mixed(x, y):
        return jax.lax.sort((x, y), num_keys=1, is_stable=False)

    def pack_limb(lo32, hi32):
        return (hi32.astype(jnp.int64) << 32) | (
            lo32.astype(jnp.int64) & jnp.int64(0xFFFFFFFF))

    def unpack_limb(x):
        return (x >> 32).astype(jnp.int32), x.astype(jnp.int32)

    def take_i64(x, idx):
        return jnp.take(x, idx, mode="clip")

    def cummax_i64(x):
        return jax.lax.cummax(x)

    def cumsum_i64(x):
        return jnp.cumsum(x)

    def where_i64(m, x):
        return jnp.where(m, x, jnp.int64(0))

    def shift_or(x):
        return (x << 1) | 1

    def concat_sort(x, y):
        (s,) = jax.lax.sort((jnp.concatenate([x, y]),), num_keys=1,
                            is_stable=False)
        return s

    def astype_up(x32):
        return x32.astype(jnp.int64) * jnp.int64(3)

    def iota_pack(x):
        pos = jnp.arange(x.shape[0], dtype=jnp.int64)
        return (x << 27) | pos

    def scatter_i64(x, idx):
        return jnp.zeros_like(x).at[idx].max(x)

    def bitcast_f64(x):
        # the known-dangerous one: s64 -> u32 bitcast yields (N, 2)
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    return [
        ("sort1_i64", sort1_i64, (i64,)),
        ("sort2_i64_i64", sort2_i64, (i64, i64)),
        ("sort_i64_key_i32_pay", sort_mixed, (i64, i32)),
        ("pack_limb", pack_limb, (i32, i32)),
        ("unpack_limb", unpack_limb, (i64,)),
        ("take_i64", take_i64, (i64, i32)),
        ("cummax_i64", cummax_i64, (i64,)),
        ("cumsum_i64", cumsum_i64, (i64,)),
        ("where_i64", where_i64, (b, i64)),
        ("shift_or_i64", shift_or, (i64,)),
        ("concat_sort_i64", concat_sort, (i64, i64)),
        ("astype_i32_to_i64", astype_up, (i32,)),
        ("iota_pack_i64", iota_pack, (i64,)),
        ("scatter_max_i64", scatter_i64, (i64, i32)),
        ("bitcast_s64_to_u32x2", bitcast_f64, (i64,)),
        ("sort_f64_pay", sort_mixed, (i64, f64)),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=26,
                    help="log2 of the probe array length")
    ap.add_argument("--only", default=None,
                    help="comma-separated candidate names")
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    N = 1 << args.n
    logical = 8 * N
    only = set(args.only.split(",")) if args.only else None
    print(f"# N=2^{args.n}={N}  logical 8B/elem = {logical/2**30:.2f} GiB "
          f"per i64 operand; padded pair layout would be "
          f"{N*128*4/2**30:.0f} GiB")
    for name, fn, specs in candidates(N):
        if only and name not in only:
            continue
        try:
            compiled = jax.jit(fn).lower(*specs).compile()
            m = compiled.memory_analysis()
            tmp = getattr(m, "temp_size_in_bytes", -1)
            outb = getattr(m, "output_size_in_bytes", -1)
            argb = getattr(m, "argument_size_in_bytes", -1)
            flag = "  <-- PADDED" if max(tmp, outb) > 4 * logical else ""
            print(f"{name:24s} temp={tmp/2**30:8.2f} GiB  "
                  f"out={outb/2**30:8.2f} GiB  arg={argb/2**30:8.2f} GiB"
                  f"{flag}")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:24s} ERROR {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
