"""Chain driver: warmup + sampling as compiled scan programs.

Counterpart of sampler/Driver.scala:6-120, redesigned for TPU execution:

* the reference's per-iteration Java loop becomes `lax.scan`s inside jit —
  zero host round-trips per iteration;
* the reference runs chains sequentially (core/Model.scala:16-22); here
  *all chains run simultaneously* as a vmapped batch axis with
  `axis_name="chains"`, scaling from 4 chains on one chip to thousands
  sharded over a mesh (see rainier_tpu.parallel);
* the expanding adaptation-window schedule is data-independent and
  precomputed as per-iteration masks (see mass.window_masks); window
  closes use `lax.cond` on an *unbatched* flag so the (possibly O(n³))
  mass rebuild only executes on close iterations;
* warmup returns an explicit `WarmupProduct` pytree — the checkpointable
  adaptation product the reference lacks (SURVEY.md §5 checkpoint/resume);
  sampling runs either as one fused scan (fast path) or in jitted chunks
  with Progress refreshes between them.

Cross-chain pooled adaptation (config.pooled_adaptation) shares acceptance
statistics and variance estimates across the chain axis via
`lax.pmean(..., "chains")` — collectives ride ICI when chains are sharded.
"""

from __future__ import annotations

import time as _time
import warnings
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as global_config
from . import config as C
from . import samplers
from .dualavg import (current_step_size, dual_avg_init, dual_avg_reset,
                      dual_avg_update, final_step_size,
                      find_reasonable_step_size)
from .leapfrog import ChainState, try_stepping
from .mass import (MassState, dense_mass, diag_mass, identity_mass, kinetic,
                   mass_from_welford, welford_init, welford_update,
                   window_masks)
from .stats import StatsState, stats_init, stats_update

CHAIN_AXIS = "chains"


def _device_sync(x):
    """Force completion of the program producing `x`.

    jax.block_until_ready is unreliable on remote-device platforms (the
    'axon' tunnel acks enqueue, not completion), which silently shifted
    sample-phase time into the transfer/diagnostics phases of committed
    benchmarks.  A one-element device→host readback is dependency-ordered
    and cannot return early.

    On multi-host runs the array is not fully addressable (shards live
    on other hosts' devices), so both the eager getitem and the host
    readback would raise — fall back to block_until_ready there."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    if getattr(leaf, "is_fully_addressable", True):
        np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])
    else:
        jax.block_until_ready(leaf)


class WarmupProduct(NamedTuple):
    """Everything sampling needs; serializable for resume."""

    key: jax.Array
    chain: ChainState
    extra: object
    mass: MassState
    step_size: jax.Array
    warmup_stats: StatsState


class SampleCarry(NamedTuple):
    key: jax.Array
    chain: ChainState
    extra: object
    stats: StatsState


class ChainResult(NamedTuple):
    samples: jax.Array        # (n_out, n_collect)
    mass: MassState
    step_size: jax.Array
    warmup_stats: StatsState
    stats: StatsState
    final_q: jax.Array


def _mass_kind(mass_cfg) -> str:
    if isinstance(mass_cfg, C.IdentityMassMatrix):
        return "identity"
    if isinstance(mass_cfg, C.DiagonalMassMatrixTuner):
        return "diag"
    if isinstance(mass_cfg, C.DenseMassMatrixTuner):
        return "dense"
    if isinstance(mass_cfg, C.StaticMassMatrix):
        return "static"
    raise TypeError(mass_cfg)


def _initial_mass(mass_cfg, n_vars: int, dtype) -> MassState:
    if isinstance(mass_cfg, C.StaticMassMatrix):
        if mass_cfg.diag is not None:
            return diag_mass(jnp.asarray(mass_cfg.diag, dtype=dtype))
        if mass_cfg.cov is not None:
            return dense_mass(jnp.asarray(mass_cfg.cov, dtype=dtype))
    if isinstance(mass_cfg, C.DiagonalMassMatrixTuner):
        # identity-valued placeholder with the diag pytree structure
        return diag_mass(jnp.ones((n_vars,), dtype=dtype))
    if isinstance(mass_cfg, C.DenseMassMatrixTuner):
        return dense_mass(jnp.eye(n_vars, dtype=dtype))
    return identity_mass()


def build_warmup_pieces(lpg, n_vars: int, cfg: C.SamplerConfig, dtype,
                        pooled: bool = False):
    """Warmup decomposed into separately-jittable pieces (all per chain —
    vmap them): ``init_fn(key) -> carry``, ``segment_fn(carry, masks) ->
    carry`` (scans any contiguous slice of the adaptation schedule),
    ``finish_fn(carry) -> WarmupProduct``, plus the full
    ``(update_mask, close_mask)`` schedule to slice.

    Segmenting exists so the driver can bound single-program device time:
    the remote TPU runtime kills workers on very long single programs
    (docs/internals.md), and chunked warmup also enables live Progress
    during adaptation."""
    adaptive_step = isinstance(cfg.step_size, C.DualAvgStepSize)
    delta = cfg.step_size.delta if adaptive_step else 0.8
    kind = _mass_kind(cfg.mass_matrix)
    tuned_mass = kind in ("diag", "dense")
    if tuned_mass:
        update_mask, close_mask = window_masks(
            cfg.warmup_iterations, cfg.mass_matrix.initial_window,
            cfg.mass_matrix.expansion, cfg.mass_matrix.skip_first,
            cfg.mass_matrix.skip_last)
    else:
        update_mask = jnp.zeros(cfg.warmup_iterations, dtype=bool)
        close_mask = update_mask

    def pool_accept(la):
        if not pooled:
            return la
        return jnp.log(jnp.maximum(
            jax.lax.pmean(jnp.exp(la), CHAIN_AXIS), 1e-30))

    def init_fn(key):
        # overdispersed per-chain starts: q0 ~ N(0, init_scale²·I),
        # matching the reference (LeapFrog.scala:102-110 fills the q slots
        # with rng.standardNormal before warmup).  A draw landing where
        # logp or its gradient is non-finite (saturated likelihood tail)
        # is redrawn, bounded at 100 attempts — Stan's init-retry policy
        def draw(c):
            key, _, _, _, i = c
            key, k_q = jax.random.split(key)
            q = cfg.init_scale * jax.random.normal(k_q, (n_vars,),
                                                   dtype=dtype)
            lp, g = lpg(q)
            return key, q, lp, g, i + 1

        def bad(c):
            _, _, lp, g, i = c
            nonfinite = ~jnp.isfinite(lp) | ~jnp.all(jnp.isfinite(g))
            return nonfinite & (i < 100)

        key, q0, lp0, g0, _ = jax.lax.while_loop(
            bad, draw, draw((key, jnp.zeros((n_vars,), dtype),
                             jnp.zeros((), dtype),
                             jnp.zeros((n_vars,), dtype),
                             jnp.zeros((), jnp.int32))))
        chain0 = ChainState(q=q0, potential=-lp0, grad=g0)
        mass0 = _initial_mass(cfg.mass_matrix, n_vars, dtype)

        key, k_p = jax.random.split(key)
        p_init = jax.random.normal(k_p, (n_vars,), dtype=dtype)
        if adaptive_step:
            eps0 = find_reasonable_step_size(
                lambda e: try_stepping(chain0, p_init, e, identity_mass(),
                                       lpg))
            da0 = dual_avg_init(eps0.astype(dtype))
        else:
            da0 = dual_avg_init(jnp.asarray(cfg.step_size.step_size, dtype))
        welford0 = welford_init(n_vars, dtype, dense=(kind == "dense"))
        extra0 = samplers.init_extra(cfg.sampler, n_vars, dtype)
        e0 = chain0.potential + kinetic(mass0, p_init)
        wstats0 = stats_init(dtype, e0)
        return (key, chain0, da0, welford0, mass0, extra0, wstats0)

    def warm_step(carry, x):
        key, chain, da, welford, mass, extra, stats = carry
        update_f, close_f = x
        key, k = jax.random.split(key)
        eps = current_step_size(da) if adaptive_step else \
            jnp.asarray(cfg.step_size.step_size, dtype)
        res, extra, n_grads = samplers.step(
            cfg.sampler, k, chain, eps, mass, extra, lpg, warmup=True)
        if adaptive_step:
            da = dual_avg_update(da, pool_accept(res.log_accept),
                                 delta)
        if tuned_mass:
            w2 = welford_update(welford, res.state.q)
            welford = jax.tree.map(
                partial(jnp.where, update_f), w2, welford)

            def do_close(ops):
                w, d, m = ops
                if pooled:
                    w = jax.tree.map(
                        lambda a: jax.lax.pmean(a, CHAIN_AXIS), w)
                new_mass = mass_from_welford(w, kind)
                new_da = dual_avg_reset(d) if adaptive_step else d
                return (welford_init(n_vars, dtype,
                                     dense=(kind == "dense")),
                        new_da, new_mass)

            welford, da, mass = jax.lax.cond(
                close_f, do_close, lambda ops: ops,
                (welford, da, mass))
        stats = stats_update(stats, res.log_accept, res.divergent,
                             res.energy, n_grads)
        return (key, res.state, da, welford, mass, extra, stats), None

    def segment_fn(carry, masks):
        carry, _ = jax.lax.scan(warm_step, carry, masks)
        return carry

    def finish_fn(carry) -> WarmupProduct:
        key, chain, da, welford, mass, extra, wstats = carry
        eps_final = final_step_size(da) if adaptive_step else \
            jnp.asarray(cfg.step_size.step_size, dtype)
        return WarmupProduct(key=key, chain=chain, extra=extra, mass=mass,
                             step_size=eps_final, warmup_stats=wstats)

    return init_fn, segment_fn, finish_fn, (update_mask, close_mask)


def build_warmup_fn(lpg, n_vars: int, cfg: C.SamplerConfig, dtype,
                    pooled: bool = False):
    """Returns warmup_fn(key) -> WarmupProduct (per chain; vmap it).
    `lpg` is a unary q -> (logp, grad) closure."""
    init_fn, segment_fn, finish_fn, masks = build_warmup_pieces(
        lpg, n_vars, cfg, dtype, pooled)

    def warmup_fn(key) -> WarmupProduct:
        return finish_fn(segment_fn(init_fn(key), masks))

    return warmup_fn


def build_sampling_fn(lpg, cfg: C.SamplerConfig, dtype, n_out: int,
                      collect_idx=None):
    """Returns sampling_fn(carry: SampleCarry, mass, eps) ->
    (SampleCarry, samples (n_out, k)) — per chain; vmap it.  Emits one
    collected draw per `cfg.thin` transitions."""
    thin = max(cfg.thin, 1)
    cidx = None if collect_idx is None else jnp.asarray(collect_idx)

    def collect(q):
        return q if cidx is None else q[cidx]

    def sampling_fn(carry: SampleCarry, mass: MassState, eps):
        def sample_step(c, _):
            def inner(i, c):
                key, chain, extra, stats = c
                key, k = jax.random.split(key)
                res, extra, n_grads = samplers.step(
                    cfg.sampler, k, chain, eps, mass, extra, lpg,
                    warmup=False)
                stats = stats_update(stats, res.log_accept, res.divergent,
                                     res.energy, n_grads)
                return SampleCarry(key, res.state, extra, stats)

            c = jax.lax.fori_loop(0, thin, inner, c)
            return c, collect(c.chain.q)

        return jax.lax.scan(sample_step, carry, None, length=n_out)

    return sampling_fn


def build_chain_fn(lpg, n_vars: int, cfg: C.SamplerConfig, dtype,
                   collect_idx: Optional[np.ndarray] = None,
                   pooled: bool = False):
    """Fused warmup+sampling program (fast path): chain_fn(key) ->
    ChainResult."""
    pooled = pooled or cfg.pooled_adaptation
    warmup_fn = build_warmup_fn(lpg, n_vars, cfg, dtype, pooled)
    n_out = cfg.iterations // max(cfg.thin, 1)
    sampling_fn = build_sampling_fn(lpg, cfg, dtype, n_out, collect_idx)

    def chain_fn(key):
        wp = warmup_fn(key)
        sstats0 = stats_init(dtype, wp.warmup_stats.prev_energy)
        carry0 = SampleCarry(wp.key, wp.chain, wp.extra, sstats0)
        carry, samples = sampling_fn(carry0, wp.mass, wp.step_size)
        return ChainResult(samples=samples, mass=wp.mass,
                           step_size=wp.step_size,
                           warmup_stats=wp.warmup_stats,
                           stats=carry.stats, final_q=carry.chain.q)

    return chain_fn


def _chain_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(CHAIN_AXIS))


def sample(model, cfg: C.SamplerConfig, n_chains: int = 4, seed: int = 0,
           collect_idx=None, dtype=None, mesh=None, progress=None,
           kernel: str = "scan", chunk_iters: Optional[int] = None,
           sync_compile: bool = False):
    """Run inference on `model`; returns a Trace.

    `mesh`: a jax.sharding.Mesh with a 'chains' axis shards the chain
    batch across devices (and Columns across a 'data' axis if present).
    `progress`: a sampler.progress.Progress — switches sampling to chunked
    execution with refreshes between chunks.
    `kernel`: 'scan' (default, XLA) or 'pallas' — scan-path warmup
    produces the adaptation product, then the whole sampling phase runs
    VMEM-resident in one fused Pallas kernel (ops/hmc_pallas.py).  When a
    run is outside the fused kernel's envelope (EHMC/NUTS sampling, dense
    mass, a mesh, or columns beyond the VMEM budget) 'pallas' logs a
    warning and runs the scan path instead; 'pallas!' raises, for callers
    who need the kernel or nothing.
    `chunk_iters`: bound the number of warmup/sampling iterations per
    device program (chunked execution with host syncs between programs).
    Use for runs whose single fused program would execute for minutes —
    the remote TPU runtime kills workers on very long single programs
    (docs/internals.md).
    `sync_compile`: run each compiled program once (discarding the
    result) before its timed execution, attributed to its own
    `compile_sync_s` timing key.  On remote-device platforms AOT
    `.compile()` can return before the backend compile actually
    finishes, silently shifting tens of seconds of compile into
    warmup_s/sample_s; the throwaway (deterministic — identical keys
    give identical work) flushes the deferred compile first.
    `compile_sync_s` conflates the compile remainder with one full
    program execution, which is why it is not folded into `compile_s`
    (round-4 advisor finding).  Benchmarks set this; interactive use
    should not (it doubles device time).
    """

    from ..core.trace import Trace

    if kernel in ("pallas", "pallas!"):
        reason = _pallas_unsupported_reason(model, cfg, n_chains, mesh)
        if reason is None and chunk_iters is not None:
            reason = ("the fused kernel runs the whole sampling phase as "
                      "one device program; chunk_iters needs the scan "
                      "path")
        if reason is None:
            return _pallas_sample(model, cfg, n_chains, seed, collect_idx,
                                  progress)
        if kernel == "pallas!":
            raise ValueError(f"kernel='pallas!': {reason}")
        warnings.warn(f"kernel='pallas' falling back to the scan path: "
                      f"{reason}", stacklevel=2)
        kernel = "scan"
    if kernel != "scan":
        raise ValueError(f"unknown kernel {kernel!r} "
                         "(expected 'scan', 'pallas' or 'pallas!')")
    dtype = dtype or global_config.dtype()
    timings: dict = {}
    t_build = _time.perf_counter()
    cd = model.density()
    cols = cd.column_values(dtype)
    if mesh is not None and "data" in mesh.axis_names:
        from ..parallel.data import shard_columns

        cols = shard_columns(cols, mesh)
    lpg_raw = cd.logp_and_grad_fn()

    def lpg(q):
        return lpg_raw(q, cols)

    keys = jax.random.split(jax.random.PRNGKey(seed), n_chains)
    sharding = None
    if mesh is not None:
        sharding = _chain_sharding(mesh)
        keys = jax.device_put(keys, sharding)
    timings["build_s"] = _time.perf_counter() - t_build

    t0 = _time.perf_counter()
    if progress is None and chunk_iters is None:
        # Fast path: TWO AOT-compiled programs — warmup and sampling —
        # with one device sync at the boundary.  The split costs one
        # sync but makes warmup_s attributable on every path (round-3
        # verdict: warmup_s was null on the fused path, so
        # samples_per_s meant different things across records).
        # Executables are cached on the CompiledDensity so repeated
        # sampling of the same model shape (e.g. SBC repetitions with
        # swapped data) skips retracing; columns are runtime arguments,
        # so same-shape data swaps hit the cache.
        try:
            cache_key = (cfg, n_chains, str(dtype),
                         None if collect_idx is None
                         else tuple(np.asarray(collect_idx).tolist()),
                         id(mesh), tuple(c.shape for c in cols))
            hash(cache_key)
        except TypeError:
            cache_key = None
        cache = getattr(cd, "_driver_cache", None)
        if cache is None:
            cache = cd._driver_cache = {}
        entry = cache.get(cache_key)
        if entry is None:
            entry = {}
            if cache_key is not None:
                cache[cache_key] = entry
        pooled = cfg.pooled_adaptation
        n_out = cfg.iterations // max(cfg.thin, 1)
        timings["compile_s"] = 0.0

        warm_exec = entry.get("warm")
        if warm_exec is None:
            t_compile = _time.perf_counter()

            def warm_fn_cols(key, cols_arg):
                def lpg_local(q):
                    return lpg_raw(q, cols_arg)

                return build_warmup_fn(lpg_local, cd.n_vars, cfg, dtype,
                                       pooled)(key)

            warm_b = jax.vmap(warm_fn_cols, in_axes=(0, None),
                              axis_name=CHAIN_AXIS)
            jit_w = global_config.jit(warm_b,
                                      in_shardings=(sharding, None)) \
                if sharding is not None else global_config.jit(warm_b)
            warm_exec = jit_w.lower(keys, cols).compile()
            entry["warm"] = warm_exec
            timings["compile_s"] += _time.perf_counter() - t_compile
            if sync_compile:
                # throwaway execution: forces the (possibly deferred)
                # backend compile to completion before the timed run;
                # attributed to its OWN key because it conflates the
                # deferred-compile remainder with one full execution of
                # the program (round-4 advisor: billing it to compile_s
                # double-charged long programs)
                t_sync = _time.perf_counter()
                _device_sync(warm_exec(keys, cols).step_size)
                timings["compile_sync_s"] = (
                    timings.get("compile_sync_s", 0.0)
                    + _time.perf_counter() - t_sync)

        t_warm = _time.perf_counter()
        wp: WarmupProduct = warm_exec(keys, cols)
        _device_sync(wp.step_size)
        timings["warmup_s"] = _time.perf_counter() - t_warm

        samp_exec = entry.get("samp")
        if samp_exec is None:
            t_compile = _time.perf_counter()

            def samp_fn_cols(wp_arg, cols_arg):
                def lpg_local(q):
                    return lpg_raw(q, cols_arg)

                sampling_fn = build_sampling_fn(lpg_local, cfg, dtype,
                                                n_out, collect_idx)
                sstats0 = stats_init(dtype,
                                     wp_arg.warmup_stats.prev_energy)
                carry0 = SampleCarry(wp_arg.key, wp_arg.chain,
                                     wp_arg.extra, sstats0)
                carry, samples = sampling_fn(carry0, wp_arg.mass,
                                             wp_arg.step_size)
                return samples, carry.stats, carry.chain.q

            samp_b = jax.vmap(samp_fn_cols, in_axes=(0, None),
                              axis_name=CHAIN_AXIS)
            # shardings flow from the (committed) warmup-product arrays
            samp_exec = global_config.jit(samp_b).lower(wp, cols).compile()
            entry["samp"] = samp_exec
            timings["compile_s"] += _time.perf_counter() - t_compile
            if sync_compile:
                t_sync = _time.perf_counter()
                _device_sync(samp_exec(wp, cols)[0])
                timings["compile_sync_s"] = (
                    timings.get("compile_sync_s", 0.0)
                    + _time.perf_counter() - t_sync)

        t_run = _time.perf_counter()
        samples, sstats, final_q = samp_exec(wp, cols)
        _device_sync(samples)
        timings["sample_s"] = _time.perf_counter() - t_run
        result = ChainResult(samples=samples, mass=wp.mass,
                             step_size=wp.step_size,
                             warmup_stats=wp.warmup_stats, stats=sstats,
                             final_q=final_q)
        if jax.process_count() > 1:
            # multi-host run: result shards live on other hosts' devices;
            # all-gather so every process holds the full trace (Trace is
            # host-side numpy)
            from jax.experimental import multihost_utils

            result = jax.tree.map(
                lambda a: multihost_utils.process_allgather(a, tiled=True),
                result)
    else:
        result = _chunked_sample(lpg, cd.n_vars, cfg, dtype, keys,
                                 collect_idx, sharding, progress,
                                 n_chains, chunk_iters, timings,
                                 sync_compile=sync_compile)
    walltime = _time.perf_counter() - t0
    # device→host transfer of the trace (over the remote-device tunnel
    # when one is in play) is a real cost; attribute it explicitly
    t_xfer = _time.perf_counter()
    trace = Trace.from_result(model, cd, result, cfg,
                              collect_idx=collect_idx, walltime=walltime)
    timings["transfer_s"] = _time.perf_counter() - t_xfer
    trace.timings = {k: round(v, 3) for k, v in timings.items()}
    return trace


def _pallas_unsupported_reason(model, cfg, n_chains, mesh):
    """None if the fused Pallas kernel can run this config, else a
    human-readable reason (the caller warns-and-falls-back or raises)."""
    from ..ops.hmc_pallas import VMEM_COLUMN_BUDGET

    if mesh is not None:
        return ("the fused kernel is single-chip; multi-chip runs use "
                "the scan path")
    if not isinstance(cfg.sampler, C.HMC):
        return ("the fused kernel samples with fixed-step HMC; "
                f"{type(cfg.sampler).__name__} runs on the scan path")
    if _mass_kind(cfg.mass_matrix) == "dense":
        return "the fused kernel supports identity/diagonal mass only"
    cd = model.density()
    cols = cd.column_values(jnp.float32)
    col_bytes = sum(4 * int(np.prod(c.shape)) for c in cols)
    # row tiling first: a tiled run double-buffer-streams its column
    # tiles from HBM (fused_hmc auto-streams when over budget), so the
    # whole-column VMEM budget only gates untiled runs — exactly the
    # large-data case tiling was built for (round-3 advisor finding)
    row_tile = _pallas_row_tile(cd, cols)
    if col_bytes > VMEM_COLUMN_BUDGET and not row_tile:
        return (f"columns need {col_bytes / 2**20:.1f} MiB of VMEM "
                f"(budget {VMEM_COLUMN_BUDGET / 2**20:.0f} MiB) and the "
                "density does not row-tile")
    try:
        _pallas_block_chains(n_chains, cd.n_vars, cols, row_tile=row_tile)
    except ValueError as e:
        return str(e)
    return None


# Row-tiled likelihood accumulation kicks in above this many observations:
# below it, whole-dataset reverse-mode residuals ((n_rows, C) per buffer)
# comfortably fit VMEM and the per-tile loop overhead isn't worth paying.
# Measured on the 100k-logistic family (benchmarks/data_scale_tpu_r3.jsonl
# steady-state, docs/performance.md rule 6): untiled at 4096 rows thrashes
# VMEM through the lanes-evaluator's (n, C) intermediates (0.18x the scan
# path); tiling recovers most of the gap at 100k rows (scan still wins
# ~1.5x steady-state there — data models default to the scan path) — so
# when the kernel IS requested, tile as soon as a full tile exists.
ROW_TILE_MIN_ROWS = 2048
ROW_TILE = 1024  # Mosaic alignment unit for 1-D VMEM column slices


def _pallas_row_tile(cd, cols) -> int:
    """0 (no tiling) or the row-tile size the kernel should accumulate
    the likelihood over (the reference's DataFunction row loop,
    ir/DataFunction.scala:48-84, as a tiled in-kernel reduction).

    Tiling needs every column to share axis 0 and the density to split
    cleanly into column-free base terms + RowSum row terms
    (CompiledDensity.logp_lanes_split_fn)."""
    if not cols:
        return 0
    n_rows = {int(c.shape[0]) for c in cols}
    if len(n_rows) != 1 or max(n_rows) < ROW_TILE_MIN_ROWS:
        return 0
    if cd.logp_lanes_split_fn() is None:
        return 0
    return ROW_TILE


def _pallas_block_chains(n_chains, n_vars, cols, row_tile=0):
    """Largest chain-block (lane) width whose VMEM footprint fits.

    The kernel holds, per chain lane: ~6 (dim_pad, C) state buffers plus —
    for data-conditioned models — per-observation activations of shape
    (act_rows, C) for the forward pass AND the reverse-mode residuals
    jax.grad keeps live (measured ~8 concurrent (n, C) buffers for the
    logistic model); with row tiling act_rows is the tile size, not the
    dataset size.  Columns themselves are lane-independent.  Pick the
    widest C ∈ {512, 384, 256, 128, n_chains} that divides n_chains and
    fits the budget; below 128 lanes the VPU underfills, so small models
    always get ≥128 (or all chains if fewer)."""
    from ..ops.hmc_pallas import VMEM_COLUMN_BUDGET, VMEM_LIMIT

    col_bytes = sum(4 * int(np.prod(c.shape)) for c in cols)
    n_max = max((int(c.shape[0]) for c in cols), default=0)
    act_rows = min(n_max, row_tile) if row_tile else n_max
    if row_tile and col_bytes > VMEM_COLUMN_BUDGET:
        # streamed run: only 2 double-buffer tile slots are VMEM-resident
        col_bytes = 2 * row_tile * col_bytes // max(n_max, 1)
    dim_pad = (n_vars + 7) // 8 * 8
    # ~6 state buffers + the per-lane mass-scale input (7 dim_pad-rows)
    per_lane = 4 * (7 * dim_pad + 8 * act_rows + 64)
    budget = int(VMEM_LIMIT * 0.75) - col_bytes
    candidates = [c for c in (512, 384, 256, 128) if n_chains % c == 0]
    candidates.append(n_chains)
    for c in candidates:
        if c * per_lane <= budget:
            return c
    raise ValueError(
        "model data too large for the fused Pallas kernel's VMEM budget "
        f"(needs {per_lane * 128 / 2**20:.1f} MiB at 128 chains); use the "
        "default scan path (kernel='scan'), which shards data instead")


def _verify_split(cd, cols, base_fn, tile_fn, row_tile) -> bool:
    """Numerically check logp(qb, cols) == base(qb) + Σ_tiles tile(...) —
    the identity row tiling relies on — before enabling tiling."""
    n = int(cols[0].shape[0])
    n_pad = -(-n // row_tile) * row_tile
    pad_cols = tuple(
        jnp.concatenate(
            [c, jnp.broadcast_to(c[0:1], (n_pad - n,) + c.shape[1:])], 0)
        if n_pad != n else c for c in cols)
    n_tiles = n_pad // row_tile
    masks = (np.arange(n_pad).reshape(n_tiles, row_tile, 1)
             < n).astype(np.float32)
    tiled = tuple(c.reshape((n_tiles, row_tile) + c.shape[1:])
                  for c in pad_cols)
    qb = jax.random.normal(jax.random.PRNGKey(0), (cd.n_vars, 8),
                           jnp.float32) * 0.5

    @global_config.jit
    def total_fn(qb, masks, *tc):
        per_tile = jax.vmap(lambda m, *c: tile_fn(qb, m, c))(masks, *tc)
        return base_fn(qb) + jnp.sum(per_tile, axis=0)

    got = np.asarray(total_fn(qb, jnp.asarray(masks), *tiled))
    ref = np.asarray(cd.logp_lanes_fn()(qb, cols))
    scale = 1.0 + float(np.max(np.abs(ref)))
    return bool(np.all(np.isfinite(got))
                and np.allclose(got, ref, rtol=1e-4, atol=1e-4 * scale))


def _pallas_sample(model, cfg: C.SamplerConfig, n_chains, seed,
                   collect_idx, progress):
    """kernel='pallas' path: scan-path warmup (full adaptation semantics),
    then the sampling phase runs as ONE fused VMEM-resident Pallas kernel
    (ops/hmc_pallas.py) — the TPU replacement for the reference's
    Driver.collectSamples loop over generated bytecode
    (Driver.scala:92-119 + DataFunction.scala:48-84).

    Adaptation semantics match the scan path: by default each chain lane
    samples with its own adapted step size and mass diagonal (per-lane ε
    and Σ̂ inputs — per-chain adapted sampling as in Driver.scala:92-119);
    with cfg.pooled_adaptation the product is pooled (geometric-mean
    step, mean variance) exactly as warmup pooled it.  Envelope (checked
    by _pallas_unsupported_reason before we get here): fixed-step HMC,
    identity/diagonal/static-diagonal mass, f32 state.  Energy/E-BFMI
    telemetry is not carried (acceptance and divergence counts are)."""
    import jax.numpy as jnp  # noqa: F811 (local alias for clarity)

    from ..core.trace import Trace
    from ..ops.hmc_pallas import fused_hmc

    dtype = jnp.float32  # kernel state is f32 (VPU/MXU native)
    timings: dict = {}
    t_build = _time.perf_counter()
    cd = model.density()
    cols = cd.column_values(dtype)
    lpg_raw = cd.logp_and_grad_fn()

    def lpg(q):
        return lpg_raw(q, cols)

    timings["build_s"] = _time.perf_counter() - t_build
    t0 = _time.perf_counter()
    if progress is not None:
        progress.start(n_chains)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_chains)
    warm = global_config.jit(jax.vmap(
        build_warmup_fn(lpg, cd.n_vars, cfg, dtype,
                        cfg.pooled_adaptation),
        axis_name=CHAIN_AXIS))
    wp: WarmupProduct = warm(keys)
    _device_sync(wp.step_size)
    timings["warmup_s"] = _time.perf_counter() - t0
    if progress is not None:
        progress.refresh("warmup complete", cfg.warmup_iterations,
                         cfg.warmup_iterations, wp.warmup_stats,
                         wp.step_size)

    # adaptation product: per-lane ε and Σ̂ diagonal by default; pooled
    # (geometric-mean step, mean variance) when the config asks for it
    if cfg.pooled_adaptation:
        eps = jnp.full((n_chains,),
                       jnp.exp(jnp.mean(jnp.log(wp.step_size))),
                       jnp.float32)
        inv_mass_diag = None
        if wp.mass.diag is not None:
            inv_mass_diag = jnp.mean(wp.mass.diag, axis=0)  # (n_vars,)
    else:
        eps = wp.step_size
        inv_mass_diag = wp.mass.diag  # (n_chains, n_vars) or None

    thin = max(cfg.thin, 1)
    n_out = cfg.iterations // thin
    q0 = wp.chain.q.T  # (n_vars, n_chains)

    # large datasets: accumulate the likelihood over row tiles so
    # reverse-mode residuals are (ROW_TILE, C) not (n_rows, C) — the
    # reference's DataFunction row loop (ir/DataFunction.scala:48-84)
    # recast as an in-kernel tiled reduction; verified numerically
    # against the untiled density before use
    row_tile = _pallas_row_tile(cd, cols)
    prior_fn = None
    if row_tile:
        base_fn, tile_fn = cd.logp_lanes_split_fn()
        if _verify_split(cd, cols, base_fn, tile_fn, row_tile):
            prior_fn = base_fn

            def lp_block(qb, mask, *cols_in):
                return tile_fn(qb, mask, cols_in)
        else:  # pragma: no cover - defensive: split identity failed
            warnings.warn("row-tiled density split failed numeric "
                          "verification; sampling untiled")
            row_tile = 0
    block = _pallas_block_chains(n_chains, cd.n_vars, cols,
                                 row_tile=row_tile)

    if not row_tile:
        lp_lanes = cd.logp_lanes_fn()

        def lp_block(qb, *cols_in):
            # (n_vars, C) block -> (C,) in the kernel's chains-on-lanes
            # layout (interp.evaluate_lanes): transpose-free Mosaic
            # lowering, MatVec as a direct (n,p)@(p,C) MXU matmul
            # (jax.vmap batching emits bool transposes / batched
            # dot_generals Mosaic rejects)
            return lp_lanes(qb, cols_in)

    # off-TPU the kernel runs interpreted with host-precomputed RNG —
    # same code path, CI-checkable; on TPU it compiles with the on-core
    # PRNG (zero HBM traffic for noise)
    t_kernel = _time.perf_counter()
    on_tpu = jax.devices()[0].platform == "tpu"
    qf, samples, acc, div = fused_hmc(
        lp_block, q0, step_size=eps, n_steps=cfg.sampler.n_steps,
        n_iterations=cfg.iterations, seed=seed + 1,
        inv_mass_diag=inv_mass_diag, collect_every=thin,
        block_chains=block, columns=cols,
        interpret=not on_tpu, host_rng=not on_tpu,
        row_tile=row_tile, prior_fn=prior_fn)
    _device_sync(samples)
    timings["sample_s"] = _time.perf_counter() - t_kernel
    walltime = _time.perf_counter() - t0

    # (n_out, n_vars, n_chains) -> per-chain (n_chains, n_out, n_collect)
    chains = jnp.transpose(samples, (2, 0, 1))
    if collect_idx is not None:
        chains = chains[:, :, jnp.asarray(collect_idx)]

    n_grads = cfg.iterations * cfg.sampler.n_steps + 1
    z = jnp.zeros((n_chains,), dtype)
    sstats = StatsState(
        iterations=jnp.full((n_chains,), cfg.iterations, jnp.int32),
        divergences=jnp.asarray(div, jnp.int32),
        accept_sum=jnp.asarray(acc) * cfg.iterations,
        grad_evals=jnp.full((n_chains,), n_grads, jnp.int32),
        prev_energy=z, energy_trans2=z, e_count=z, e_mean=z, e_raw=z)
    if progress is not None:
        progress.finish("complete", sstats, wp.step_size)
    result = ChainResult(samples=chains, mass=wp.mass,
                         step_size=wp.step_size,
                         warmup_stats=wp.warmup_stats, stats=sstats,
                         final_q=qf.T)
    t_xfer = _time.perf_counter()
    trace = Trace.from_result(model, cd, result, cfg,
                              collect_idx=collect_idx, walltime=walltime)
    timings["transfer_s"] = _time.perf_counter() - t_xfer
    trace.timings = {k: round(v, 3) for k, v in timings.items()}
    return trace


def _chunked_sample(lpg, n_vars, cfg, dtype, keys, collect_idx, sharding,
                    progress, n_chains, chunk_iters=None,
                    timings=None, sync_compile=False) -> ChainResult:
    """Chunked path: warmup AND sampling run as a sequence of
    bounded-length device programs with host syncs between them.

    Used for (a) live Progress refreshes (Driver.scala's throttled
    refresh) and (b) bounding single-program device time — the remote
    TPU runtime kills workers on very long single programs
    (docs/internals.md "Synchronization...").  `chunk_iters` bounds the
    iterations per device program; warmup segments are equal-shaped so
    at most two segment programs compile (body + remainder)."""
    if progress is not None:
        progress.start(n_chains)
    init_fn, segment_fn, finish_fn, masks = build_warmup_pieces(
        lpg, n_vars, cfg, dtype, cfg.pooled_adaptation)

    def _jit(fn, in_axes=0):
        v = jax.vmap(fn, axis_name=CHAIN_AXIS, in_axes=in_axes)
        return global_config.jit(v)

    W = cfg.warmup_iterations
    wchunk = min(chunk_iters or W, W)
    init_j = _jit(init_fn)
    seg = _jit(segment_fn, in_axes=(0, None))
    fin_j = _jit(finish_fn)
    if sync_compile and timings is not None:
        # throwaway pass over init + first segment + finish so their
        # (possibly deferred) backend compiles land outside warmup_s;
        # attributed to compile_sync_s (compile remainder + one segment
        # execution — see the fast path's note).  The remainder-shaped
        # segment (if W % wchunk != 0) still compiles inside the timed
        # loop
        t_c = _time.perf_counter()
        c0 = init_j(keys)
        c0 = seg(c0, tuple(m[:wchunk] for m in masks))
        _device_sync(c0[0])
        _device_sync(fin_j(c0).step_size)
        timings["compile_sync_s"] = (timings.get("compile_sync_s", 0.0)
                                     + _time.perf_counter() - t_c)
    t_warm = _time.perf_counter()
    carry = init_j(keys)
    done = 0
    while done < W:
        mslice = tuple(m[done:done + wchunk] for m in masks)
        carry = seg(carry, mslice)
        _device_sync(carry[0])
        done += wchunk
        if progress is not None:
            progress.refresh("warmup", min(done, W), W, carry[6],
                             np.asarray(jax.vmap(current_step_size)(
                                 carry[2])))
    wp: WarmupProduct = fin_j(carry)
    _device_sync(wp.step_size)
    if timings is not None:
        timings["warmup_s"] = _time.perf_counter() - t_warm
    if progress is not None:
        progress.refresh("warmup complete", W, W, wp.warmup_stats,
                         wp.step_size)

    thin = max(cfg.thin, 1)
    n_out = cfg.iterations // thin
    if chunk_iters:
        chunk = max(chunk_iters // thin, 1)
    else:
        chunk = max(n_out // min(20, max(n_out, 1)), 1)
    sampling_fn = build_sampling_fn(lpg, cfg, dtype, chunk, collect_idx)
    sfn = global_config.jit(jax.vmap(sampling_fn, axis_name=CHAIN_AXIS,
                           in_axes=(0, 0, 0)))
    sstats0 = jax.vmap(lambda e: stats_init(dtype, e))(
        wp.warmup_stats.prev_energy)
    carry = SampleCarry(wp.key, wp.chain, wp.extra, sstats0)
    if sync_compile and timings is not None:
        t_c = _time.perf_counter()
        _device_sync(sfn(carry, wp.mass, wp.step_size)[1])
        timings["compile_sync_s"] = (timings.get("compile_sync_s", 0.0)
                                     + _time.perf_counter() - t_c)
    t_sample = _time.perf_counter()
    pieces = []
    done = 0
    while done < n_out:
        carry, samples = sfn(carry, wp.mass, wp.step_size)
        _device_sync(samples)
        pieces.append(np.asarray(samples))
        done += chunk
        if progress is not None:
            progress.refresh("sampling", min(done, n_out) * thin,
                             cfg.iterations, carry.stats, wp.step_size)
    samples = np.concatenate(pieces, axis=1)[:, :n_out]
    if timings is not None:
        timings["sample_s"] = _time.perf_counter() - t_sample
    if progress is not None:
        progress.finish("complete", carry.stats, wp.step_size)
    return ChainResult(samples=samples, mass=wp.mass,
                       step_size=wp.step_size,
                       warmup_stats=wp.warmup_stats, stats=carry.stats,
                       final_q=carry.chain.q)
