"""Fused HMC sampling loop as a Pallas TPU kernel.

SURVEY.md §7 M4: "Pallas fused leapfrog (fuse momentum half-steps +
position update + grad call to kill HBM round-trips for small n)" plus
the second half — per-observation data resident on-chip (the TPU
replacement for the reference's row loop, ir/DataFunction.scala:48-84).

The XLA scan path writes (q, p, grad) back to HBM after every fused scan
step; for small-n models (funnel: 10 dims) the hot loop is therefore HBM-
bandwidth-bound.  This kernel keeps the whole chain-block state resident
in VMEM for the *entire* sampling run — leapfrog steps, Metropolis
accepts, and the per-iteration RNG (on-core PRNG + Box-Muller) never
touch HBM; collected draws stream out via async DMA.

Layout: state is (dim_pad, C) with the chain axis on lanes (C a multiple
of 128) and dim padded to the f32 sublane tile (8), so every elementwise
op vectorizes across chains on the VPU and reductions over `dim` are
cheap sublane reductions.

Data columns: pass per-observation arrays via ``columns=(...)``; each is
held VMEM-resident for the whole run (every grid block sees the full
array) and forwarded to ``lp_fn(q_block, *columns)``.  A (100k, p)
design matrix in f32 is p·400 KB — comfortably inside the ~16 MB/core
VMEM budget — and X @ q_block is an (n,p)·(p,C) matmul the MXU eats
natively.  For datasets beyond the VMEM budget use the XLA scan path
(which shards columns over the mesh instead).

RNG: ``host_rng=False`` (default) uses the on-core PRNG — zero HBM
traffic, TPU only.  ``host_rng=True`` precomputes all momenta/uniforms
with jax.random and streams them in as inputs: runs under
``interpret=True`` on CPU (CI correctness tests) and compiled on TPU,
with identical trajectories in both — the kernel's cross-backend oracle.

The target log-density is a traceable ``lp_fn(q: (dim, C), *columns) ->
(C,)`` in jnp ops — it must not close over device arrays (pallas kernels
reject captured constants; data goes through `columns`); its gradient is
taken with jax.grad *inside* the kernel body (traced before Mosaic
lowering) — any model expressible on a (dim, C) block works, no
hand-written adjoint.  Mass-matrix preconditioning is applied by running
in standardized coordinates (q' = q/√Σ̂ with the density
reparameterized), so the kernel itself always integrates with identity
mass — same trajectories, fewer in-kernel ops.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi

# v5e/v5p cores carry 128 MiB of physical VMEM but Mosaic's default
# scoped limit is 16 MiB; we raise the kernel's limit and keep the column
# budget below it so state + activations + compiler scratch still fit
VMEM_LIMIT = 100 * 1024 * 1024
VMEM_COLUMN_BUDGET = 48 * 1024 * 1024


def _uniform_from_bits(bits):
    """uint32 → float32 uniform in (0, 1): force exponent to [1,2)."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0 + 1.1920929e-7  # strictly > 0 for log()


def _rand_uniform(shape):
    return _uniform_from_bits(
        pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))


def _normals(shape):
    """Box–Muller from the on-core PRNG."""
    u1 = _rand_uniform(shape)
    u2 = _rand_uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fused_hmc(lp_fn: Callable, q0, *, step_size, n_steps: int,
              n_iterations: int, seed: int, inv_mass_diag=None,
              collect_every: int = 0, block_chains: int = 512,
              interpret: bool = False, columns: Sequence = (),
              host_rng: bool = False, row_tile: int = 0,
              prior_fn: Callable = None, stream_columns: bool = None):
    """HMC with `n_steps` leapfrog steps × `n_iterations`, state resident
    in VMEM.

    q0: (dim, n_chains), n_chains % block_chains == 0.
    step_size: scalar, or (n_chains,) per-chain adapted step sizes — each
    chain lane integrates with its own ε (the reference samples every
    chain with its own adapted step size, sampler/Driver.scala:92-119).
    inv_mass_diag: Σ̂ diagonal as adapted by the driver — (dim,) shared,
    or (n_chains, dim) per-chain — or None (identity mass).
    collect_every: 0 → return only final q; k → also stream every k-th
    draw to HBM.
    columns: data arrays forwarded to lp_fn, VMEM-resident for the run.
    host_rng: precompute noise with jax.random (CPU-interpretable oracle)
    instead of the on-core PRNG.
    row_tile: 0 → lp_fn sees all rows at once (reverse-mode residuals are
    (n_rows, C) — fine for small data).  R > 0 → the density+gradient is
    accumulated over n_rows/R row tiles: per tile, a forward+reverse pass
    over an (R, C) slice of every column, so activation VMEM is O(R·C)
    regardless of dataset size (the reference's DataFunction row loop,
    ir/DataFunction.scala:48-84, recast as a tiled in-kernel reduction).
    Requires prior_fn: with tiling, lp_fn(q, *cols_tile) must return ONLY
    the likelihood partial sum for the tile, and prior_fn(q) -> (C,) the
    column-free prior total (evaluated once per density call).
    stream_columns: None (auto: stream iff tiled AND columns exceed the
    VMEM budget) / True / False.  Streamed columns stay in HBM and each
    row tile is DMAed into a double-buffered VMEM scratch slot — the next
    tile's fetch overlaps the current tile's compute — so dataset size is
    bounded by HBM, not VMEM (the full TPU equivalent of the reference's
    out-of-cache DataFunction row loop, ir/DataFunction.scala:48-84).
    Requires row_tile.

    Returns (final_q (dim, n_chains),
             samples (n_out, dim, n_chains) or None,
             accept_rate (n_chains,),
             divergences (n_chains,)).
    """
    dim, n_chains = q0.shape
    q0 = jnp.asarray(q0, jnp.float32)
    # lane padding: Mosaic requires 128-aligned lane slices (the collect
    # DMA slices the output on the chain axis), so tiny chain counts are
    # padded up to a full 128-lane tile — padded lanes replicate chain 0
    # and are trimmed from every output
    n_true_chains = n_chains
    n_lanes = _round_up(n_chains, 128)
    eps_arr = jnp.broadcast_to(
        jnp.asarray(step_size, jnp.float32).reshape(-1), (n_chains,))
    if n_lanes != n_chains:
        pad = n_lanes - n_chains
        q0 = jnp.concatenate(
            [q0, jnp.broadcast_to(q0[:, :1], (dim, pad))], axis=1)
        eps_arr = jnp.concatenate(
            [eps_arr, jnp.broadcast_to(eps_arr[:1], (pad,))])
        if inv_mass_diag is not None:
            imd_ = jnp.asarray(inv_mass_diag, jnp.float32)
            if imd_.ndim == 2:
                inv_mass_diag = jnp.concatenate(
                    [imd_, jnp.broadcast_to(imd_[:1], (pad, dim))], axis=0)
        n_chains = n_lanes
        block_chains = min(_round_up(block_chains, 128), n_lanes)
    assert n_chains % block_chains == 0, (n_chains, block_chains)
    grid = n_chains // block_chains
    dim_pad = _round_up(dim, 8)
    # per-lane ε travels as a (1, n_chains) VMEM input (scalar broadcast)
    eps_lanes = eps_arr.reshape(1, -1)

    columns = tuple(jnp.asarray(c, jnp.float32) for c in columns)
    n_rows = 0
    if row_tile:
        if prior_fn is None:
            raise ValueError("row_tile requires prior_fn (lp_fn computes "
                             "only the per-tile likelihood partial sum)")
        if not columns:
            raise ValueError("row_tile without columns is meaningless")
        n_rows = int(columns[0].shape[0])
        for c in columns:
            if int(c.shape[0]) != n_rows:
                raise ValueError("row_tile requires all columns to share "
                                 f"axis 0 ({n_rows} vs {c.shape})")
        # Mosaic needs statically-provable slice alignment: 1024 elements
        # for 1-D (lane-major) columns, 8 sublanes for 2-D ones
        align = 1024 if any(c.ndim == 1 for c in columns) else 8
        if row_tile % align != 0:
            raise ValueError(f"row_tile must be a multiple of {align} "
                             "for these column shapes")
        # pad rows to a multiple of row_tile by repeating row 0 (finite
        # per-row terms guaranteed); the kernel masks padding rows out
        n_pad_rows = _round_up(n_rows, row_tile)
        if n_pad_rows != n_rows:
            columns = tuple(
                jnp.concatenate(
                    [c, jnp.broadcast_to(c[0:1],
                                         (n_pad_rows - n_rows,)
                                         + c.shape[1:])], axis=0)
                for c in columns)
    col_bytes = sum(4 * c.size for c in columns)
    if stream_columns is None:
        stream_columns = bool(row_tile) and col_bytes > VMEM_COLUMN_BUDGET
    if stream_columns and not row_tile:
        raise ValueError("stream_columns requires row_tile (tiles are "
                         "the DMA unit)")
    # true (unpadded) width of each 2-D column, for the in-kernel loads
    col_widths = tuple(int(c.shape[1]) if c.ndim == 2 else None
                       for c in columns)
    if stream_columns:
        # Mosaic rejects DMA memref slices whose minor dimension is not
        # 128-lane aligned ("Slice shape along dimension 1 must be
        # aligned to tiling (128)", found compiling the streamed path on
        # real v5e — interpret-mode CI cannot see it).  Pad streamed 2-D
        # columns to a lane multiple so the HBM→VMEM tile copies are
        # full-width; the kernel loads tiles back at the true width via
        # a ref slice (which Mosaic does lower).  Costs DMA bandwidth
        # proportional to 128/width for narrow matrices — data models
        # default to the scan path anyway (docs/performance.md rule 6).
        # 1-D columns stream as width-1 2-D (Mosaic: "DMA source and
        # target tiling mismatch for 1D tiles"); the kernel collapses
        # the minor dim back on load (col_widths[j] == 0 marks these)
        col_widths = tuple(0 if c.ndim == 1 else w
                           for c, w in zip(columns, col_widths))
        columns = tuple(c[:, None] if c.ndim == 1 else c
                        for c in columns)
        columns = tuple(
            jnp.pad(c, ((0, 0), (0, _round_up(int(c.shape[1]), 128)
                                 - int(c.shape[1]))))
            if int(c.shape[1]) % 128 else c
            for c in columns)
    if col_bytes > VMEM_COLUMN_BUDGET and not stream_columns:
        raise ValueError(
            f"columns need {col_bytes / 2**20:.1f} MiB of VMEM "
            f"(budget {VMEM_COLUMN_BUDGET / 2**20:.0f} MiB); use "
            "row_tile (streams tiles from HBM) or the XLA scan path "
            "with mesh-sharded columns")

    if inv_mass_diag is not None:
        imd = jnp.asarray(inv_mass_diag, jnp.float32)
        # normalize to (dim, n_chains): per-chain Σ̂ when 2-D
        scale = jnp.broadcast_to(
            jnp.sqrt(imd.T if imd.ndim == 2 else imd[:, None]),
            (dim, n_chains))
        q0 = q0 / scale
    else:
        scale = None

    # standardization scale travels as a kernel input (ones = identity);
    # captured arrays are not allowed in pallas kernel bodies
    scale_pad = jnp.ones((dim_pad, n_chains), jnp.float32)
    if scale is not None:
        scale_pad = scale_pad.at[:dim, :].set(scale)

    qp0 = jnp.zeros((dim_pad, n_chains), jnp.float32).at[:dim].set(q0)
    n_out = (n_iterations // collect_every) if collect_every else 0
    n_cols = len(columns)

    noise_inputs = ()
    if host_rng:
        kp, ku = jax.random.split(jax.random.PRNGKey(seed))
        p_noise = jax.random.normal(
            kp, (n_iterations, dim_pad, n_chains), jnp.float32)
        # zero momentum on padded dims: they must stay exactly 0
        if dim_pad != dim:
            p_noise = p_noise.at[:, dim:, :].set(0.0)
        u_noise = jax.random.uniform(
            ku, (n_iterations, 1, n_chains), jnp.float32,
            minval=1.1920929e-7, maxval=1.0)
        noise_inputs = (p_noise, u_noise)

    def kernel(seed_ref, q_ref, scale_ref, eps_ref, *rest):
        col_refs = rest[:n_cols]
        rest = rest[n_cols:]
        if host_rng:
            p_ref, u_ref = rest[:2]
            rest = rest[2:]
        qout_ref, acc_ref, div_ref = rest[:3]
        rest = rest[3:]
        if collect_every:
            samples_hbm = rest[0]
            scratch, sem = rest[1:3]
            rest = rest[3:]
        if stream_columns:
            col_bufs = rest[:n_cols]
            stream_sem = rest[n_cols]
        block = pl.program_id(0)
        if not host_rng:
            pltpu.prng_seed(seed_ref[0] + block * 7919)
        sc = scale_ref[:, :]    # (dim_pad, C) per-lane mass scale
        # per-lane ε broadcast once to full state shape ((1, C) is fine as
        # a broadcast source, just not as a loop carry — see lp_pad note)
        eps = jnp.broadcast_to(eps_ref[0:1, :], (dim_pad, block_chains))
        # tiled mode reads column refs per row-slice instead
        cols = () if row_tile else tuple(r[...] for r in col_refs)

        def lp_pad(qp):
            # keep per-chain scalars rank-2 (1, C): Mosaic dislikes 1-D
            # full (8, C) sublane tile: Mosaic mishandles (1, C) loop
            # carries ("sublane broadcast" not implemented)
            lp1 = lp_fn((qp * sc)[:dim], *cols).reshape(1, block_chains)
            return jnp.broadcast_to(lp1, (8, block_chains))

        def grad_pad(qp):
            return jax.grad(
                lambda qq: jnp.sum(lp_pad(qq)) / 8.0)(qp)

        def lp_grad(qp):
            """(lp (8,C), grad (dim_pad,C)) — one density+gradient.

            Tiled mode accumulates per-row-tile forward+reverse passes so
            reverse-mode residuals are (row_tile, C), not (n_rows, C);
            each jax.grad sits *inside* the fori_loop body, so only one
            tile's activations are ever live."""
            if not row_tile:
                return lp_pad(qp), grad_pad(qp)
            n_tiles = columns[0].shape[0] // row_tile
            align = 1024 if any(r.ndim == 1 for r in col_refs) else 8

            def _tile_src(r, t):
                start = pl.multiple_of(t * row_tile, align)
                return r.at[(pl.ds(start, row_tile),)
                            + (slice(None),) * (r.ndim - 1)]

            def _dmas(slot, t):
                # one async copy per column: HBM row slice → buffer slot.
                # 1-D columns buffer as (2, 1, R) so `slot` is a plain
                # batch offset, never a dynamic sublane index
                return [pltpu.make_async_copy(
                            _tile_src(r, t),
                            b.at[slot, 0] if r.ndim == 1 else b.at[slot],
                            stream_sem.at[slot, j])
                        for j, (r, b) in enumerate(zip(col_refs,
                                                       col_bufs))]

            if stream_columns:
                for d in _dmas(0, 0):   # warm-up: prefetch tile 0
                    d.start()

            def tile(t, acc):
                lp_a, g_a = acc
                if stream_columns:
                    slot = jax.lax.rem(t, 2)

                    @pl.when(t + 1 < n_tiles)
                    def _():  # overlap: fetch tile t+1 during compute
                        for d in _dmas(jax.lax.rem(t + 1, 2), t + 1):
                            d.start()

                    for d in _dmas(slot, t):
                        d.wait()
                    # load each tile at its TRUE width: buffers are
                    # lane-padded for the DMA (see the stream_columns
                    # padding note above); a static ref slice narrows
                    # back before the load, and width marker 0 means
                    # the column was 1-D (collapse the width-1 lane)
                    def _load_tile(b, w):
                        if w == 0:
                            return b[slot, :, 0]
                        if w is None or w == b.shape[2]:
                            return b[slot]
                        return b.at[slot, :, :w][...]

                    cols_t = tuple(
                        _load_tile(b, w)
                        for b, w in zip(col_bufs, col_widths))
                else:
                    # slice the VMEM column *refs* (Mosaic lowers pl.ds
                    # ref reads; dynamic_slice on materialized values it
                    # does not)
                    cols_t = tuple(_tile_src(r, t)[...] for r in col_refs)
                # mask out padding rows (tile rows ≥ true n_rows)
                row_id = jax.lax.broadcasted_iota(
                    jnp.int32, (row_tile, 1), 0) + t * row_tile
                mask = (row_id < n_rows).astype(jnp.float32)

                def f(qq):
                    lp1 = lp_fn((qq * sc)[:dim], mask, *cols_t).reshape(
                        1, block_chains)
                    return jnp.sum(lp1), lp1

                g_t, lp1 = jax.grad(f, has_aux=True)(qp)
                return (lp_a + jnp.broadcast_to(lp1, (8, block_chains)),
                        g_a + g_t)

            lp8, g = jax.lax.fori_loop(
                0, n_tiles, tile,
                (jnp.zeros((8, block_chains), jnp.float32),
                 jnp.zeros((dim_pad, block_chains), jnp.float32)))

            def fp(qq):
                lp1 = prior_fn((qq * sc)[:dim]).reshape(1, block_chains)
                return jnp.sum(lp1), lp1

            gp, lpp = jax.grad(fp, has_aux=True)(qp)
            return lp8 + jnp.broadcast_to(lpp, (8, block_chains)), g + gp

        q = q_ref[:, :]
        lp, grad = lp_grad(q)

        def iteration(it, carry):
            q, lp, grad, acc, div = carry
            if host_rng:
                p0 = p_ref[it]
            else:
                p0 = _normals((dim_pad, block_chains))
            k0 = jnp.sum(p0 * p0, axis=0, keepdims=True)
            h0 = -lp + 0.5 * jnp.broadcast_to(k0, (8, block_chains))

            p = p0 + 0.5 * eps * grad
            qn = q + eps * p
            lpn, gn = lp_grad(qn)

            def leap(_, c):
                qn, p, lpn, gn = c
                p = p + eps * gn
                qn = qn + eps * p
                lpn, gn = lp_grad(qn)
                return qn, p, lpn, gn

            qn, p, lpn, gn = jax.lax.fori_loop(0, n_steps - 1, leap,
                                               (qn, p, lpn, gn))
            p = p + 0.5 * eps * gn
            k1 = jnp.sum(p * p, axis=0, keepdims=True)
            h1 = -lpn + 0.5 * jnp.broadcast_to(k1, (8, block_chains))
            la = jnp.minimum(-(h1 - h0), 0.0)
            la = jnp.where(jnp.isnan(la), -jnp.inf, la)   # (8, C)
            if host_rng:
                u = jnp.broadcast_to(u_ref[it], (8, block_chains))
            else:
                u = _rand_uniform((8, block_chains))
                u = jnp.broadcast_to(u[0:1], (8, block_chains))
            take = jnp.log(u) < la                         # (8, C)
            takeq = jnp.broadcast_to(take[0:1], (dim_pad, block_chains))
            q = jnp.where(takeq, qn, q)
            lp = jnp.where(take, lpn, lp)
            grad = jnp.where(takeq, gn, grad)
            acc = acc + jnp.exp(la)
            div = div + jnp.where(jnp.isinf(la), 1.0, 0.0)

            if collect_every:
                @pl.when(it % collect_every == collect_every - 1)
                def _():
                    scratch[:, :] = q
                    out_idx = it // collect_every
                    dma = pltpu.make_async_copy(
                        scratch,
                        samples_hbm.at[out_idx, :,
                                       pl.ds(block * block_chains,
                                             block_chains)],
                        sem)
                    dma.start()
                    dma.wait()

            return q, lp, grad, acc, div

        zeros = jnp.zeros((8, block_chains), jnp.float32)
        q, lp, grad, acc, div = jax.lax.fori_loop(
            0, n_iterations, iteration, (q, lp, grad, zeros, zeros))
        qout_ref[:, :] = q
        acc_ref[:, :] = acc[0:1] / n_iterations
        div_ref[:, :] = div[0:1]

    out_shape = [
        jax.ShapeDtypeStruct((dim_pad, n_chains), jnp.float32),
        jax.ShapeDtypeStruct((1, n_chains), jnp.float32),
        jax.ShapeDtypeStruct((1, n_chains), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((dim_pad, block_chains), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_chains), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_chains), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    scratch_shapes = []
    if collect_every:
        out_shape.append(jax.ShapeDtypeStruct(
            (n_out, dim_pad, n_chains), jnp.float32))
        # ANY-space outputs must be unblocked; each grid step DMAs into
        # its own chain-column slice
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes = [
            pltpu.VMEM((dim_pad, block_chains), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((dim_pad, block_chains), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dim_pad, block_chains), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_chains), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    for c in columns:
        if stream_columns:
            # stays in HBM; row tiles are DMAed into VMEM double buffers
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        else:
            # full array, every block sees all rows (index_map pins 0)
            in_specs.append(pl.BlockSpec(
                c.shape, (lambda *_, nd=c.ndim: (0,) * nd),
                memory_space=pltpu.VMEM))
    if stream_columns:
        for c in columns:
            buf = (2, 1, row_tile) if c.ndim == 1 \
                else (2, row_tile) + tuple(c.shape[1:])
            scratch_shapes.append(pltpu.VMEM(buf, jnp.float32))
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2, n_cols)))
    if host_rng:
        in_specs.append(pl.BlockSpec(
            (n_iterations, dim_pad, block_chains), lambda i: (0, 0, i),
            memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (n_iterations, 1, block_chains), lambda i: (0, 0, i),
            memory_space=pltpu.VMEM))

    results = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
    )(jnp.asarray([seed], jnp.int32), qp0, scale_pad, eps_lanes,
      *columns, *noise_inputs)

    qf = results[0][:dim]
    acc = results[1][0]
    div = results[2][0]
    samples = results[3][:, :dim] if collect_every else None
    if scale is not None:
        qf = qf * scale
        if samples is not None:
            samples = samples * scale[None]
    if n_true_chains != n_chains:  # trim lane padding
        qf = qf[:, :n_true_chains]
        acc = acc[:n_true_chains]
        div = div[:n_true_chains]
        if samples is not None:
            samples = samples[:, :, :n_true_chains]
    return qf, samples, acc, div
