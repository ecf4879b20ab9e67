"""Gather-rate microbench: what sets TPU table-gather throughput?

The round-4 trace says the frame spends ~8 ms/frame in row gathers
(matmap 1.9, ESM 1.9, env pair 1.8, bins 1.4, spot 0.9) at a measured
~2-3.5 ns/row regardless of row width.  This sweep isolates what the
rate depends on: row width, dtype, table size, index order, op split,
and one-hot-matmul alternatives for small tables.

Run on an otherwise idle TPU; the axon tunnel memoizes identical
dispatches, so every timed call varies its input indices.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_varying(fn, table, idx_list, chain=8):
    """Median time of one call, each timed call on FRESH indices (the
    axon tunnel memoizes identical dispatches and unblocks
    block_until_ready early — identical-args loops time ~0).  Each
    timed sample runs an N-call chain where call k's indices are
    perturbed by a scalar derived from call k-1's output, serializing
    the chain on device; one dispatch + one readback amortize over N."""

    def chained(t, i):
        def body(k, carry):
            acc, ii = carry
            out = fn(t, ii)
            s = jnp.sum(out[:8].astype(jnp.float32))
            # next indices depend on this call's result (serializes)
            ii = (ii + (s.astype(jnp.int32) & 1) + 1) % jnp.int32(
                t.shape[0] if out.ndim else 1)
            return acc + s, ii
        acc, _ = jax.lax.fori_loop(0, chain, body,
                                   (jnp.float32(0.0), i))
        return acc

    fn_j = jax.jit(chained)
    _ = float(fn_j(table, idx_list[0]))     # compile
    ts = []
    for ii in idx_list[1:]:
        t0 = time.perf_counter()
        _ = float(fn_j(table, ii))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3 / chain


def main():
    P = 512 * 1024                      # rows gathered (~opaque half-res)
    rng = np.random.default_rng(0)

    print(f"gather {P} rows; times in ms (and ns/row)")

    def run(label, table, idx, fn=None):
        if fn is None:
            fn = lambda t, i: t[i]
        tt = jax.device_put(table)
        idxs = [jax.device_put((idx + 7 * r) % table.shape[0])
                for r in range(4)]
        ms = timeit_varying(fn, tt, idxs)
        print(f"  {label:48s} {ms:7.3f} ms  {ms * 1e6 / P:6.2f} ns/row",
              flush=True)
        return ms

    # --- row width sweep, u8 rows (matmap-like: R = 1M texel quads)
    R = 1 << 20
    idx = rng.integers(0, R, P).astype(np.int32)
    for wbytes in (16, 48, 64, 128, 256):
        t = rng.integers(0, 255, (R, wbytes), dtype=np.uint8)
        run(f"(1M, {wbytes:3d}) u8 rows, random idx", t, idx)

    # --- same bytes, f32 rows
    for wf in (4, 12, 16, 32):
        t = rng.standard_normal((R, wf)).astype(np.float32)
        run(f"(1M, {wf:3d}) f32 rows, random idx", t, idx)

    # --- scalar gather (ESM-like): 1 f32 per row
    t = rng.standard_normal((R,)).astype(np.float32)
    run("(1M,) f32 scalars, random idx", t, idx)

    # --- table size sweep at fixed 48B rows
    for RR in (1 << 12, 1 << 16, 1 << 20, 1 << 23):
        t = rng.integers(0, 255, (RR, 48), dtype=np.uint8)
        ii = rng.integers(0, RR, P).astype(np.int32)
        run(f"({RR >> 10:5d}K, 48) u8 rows, random idx", t, ii)

    # --- index order
    t = rng.integers(0, 255, (R, 48), dtype=np.uint8)
    run("(1M, 48) u8, SORTED idx", t, np.sort(idx))
    run("(1M, 48) u8, COHERENT idx (blocks of 64)", t,
        np.repeat(rng.integers(0, R, P // 64).astype(np.int32), 64))

    # --- one gather vs two half gathers (op overhead)
    half = idx[: P // 2]
    run("(1M, 48) u8, TWO gathers of P/2", t, half,
        fn=lambda tt, ii: jnp.concatenate([tt[ii], tt[ii + 1]], -1))

    # --- THE dtype lever: same f32 payload gathered as bitcast u8 rows
    # (u8 width sweep above is flat ~15 ns/row while f32 scales with
    # element count — so ship f32 tables as u8 and bitcast back)
    for wf in (4, 12, 16, 32):
        tf = rng.standard_normal((R, wf)).astype(np.float32)
        run(f"(1M, {wf:3d}) f32 via u8 BITCAST rows", tf, idx,
            fn=lambda tt, ii, w=wf: jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(
                    tt, jnp.uint8).reshape(R, w * 4)[ii].reshape(
                        -1, w, 4), jnp.float32))
    # bf16 rows (half the bytes; is it element-count or bytes?)
    for wf in (12, 32):
        tb = rng.standard_normal((R, wf)).astype(np.float32)
        run(f"(1M, {wf:3d}) bf16 rows, random idx",
            tb.astype(jnp.bfloat16), idx)
    # i32 rows (bins-gather-like)
    t32 = rng.integers(0, 1 << 20, (R, 8)).astype(np.int32)
    run("(1M,   8) i32 rows, random idx", t32, idx)
    run("(1M,   8) i32 via u8 BITCAST rows", t32, idx,
        fn=lambda tt, ii: jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                tt, jnp.uint8).reshape(R, 32)[ii].reshape(-1, 8, 4),
            jnp.int32))

    # --- one-hot matmul for a SMALL table (4K rows): MXU gather
    RR = 1 << 12
    ts = rng.standard_normal((RR, 16)).astype(np.float32)
    ii = rng.integers(0, RR, P).astype(np.int32)

    def onehot_mm(tt, i):
        oh = jax.nn.one_hot(i, RR, dtype=jnp.bfloat16)
        return oh @ tt.astype(jnp.bfloat16)

    run("( 4K, 16) f32 via one-hot bf16 matmul", ts, ii, fn=onehot_mm)
    run("( 4K, 16) f32 native gather", ts, ii)

    # --- gather expressed as take_along_axis on flattened table
    t48 = rng.integers(0, 255, (R * 48,), dtype=np.uint8)

    def flat_take(tt, i):
        off = i[:, None].astype(jnp.int32) * 48 + jnp.arange(48)[None, :]
        return jnp.take(tt, off.reshape(-1)).reshape(-1, 48)

    run("(48M,) u8 flat take, random idx", t48, idx, fn=flat_take)

    # --- dynamic-slice loop rate reference: 8 rows per slice
    def blocked(tt, i):
        # gather 8-row aligned blocks (coherence upper bound)
        return tt[(i >> 3) << 3]

    run("(1M, 48) u8, 8-row-aligned idx", t, idx, fn=blocked)

    # --- Pallas: table resident in VMEM, vector gather in-kernel
    # (does Mosaic lower a vectorized take?  wrapped: may not compile)
    try:
        import functools

        from jax.experimental import pallas as pl

        RR = 1 << 14                     # 16K x 16 f32 = 1 MB, fits VMEM
        ts = rng.standard_normal((RR, 16)).astype(np.float32)
        ii = rng.integers(0, RR, P).astype(np.int32)
        BLK = 8 * 1024

        def gather_kernel(idx_ref, tab_ref, out_ref):
            out_ref[...] = tab_ref[idx_ref[...]]

        @jax.jit
        def pallas_gather(tab, i):
            return pl.pallas_call(
                gather_kernel,
                grid=(P // BLK,),
                in_specs=[pl.BlockSpec((BLK,), lambda g: (g,)),
                          pl.BlockSpec((RR, 16), lambda g: (0, 0))],
                out_specs=pl.BlockSpec((BLK, 16), lambda g: (g, 0)),
                out_shape=jax.ShapeDtypeStruct((P, 16), jnp.float32),
            )(i, tab)

        run("(16K, 16) f32 PALLAS vmem-resident gather", ts, ii,
            fn=pallas_gather)
        run("(16K, 16) f32 native gather (same shapes)", ts, ii)
    except Exception as e:  # noqa: BLE001
        print(f"  pallas vmem gather: UNSUPPORTED ({type(e).__name__}: "
              f"{str(e)[:120]})")


if __name__ == "__main__":
    main()
